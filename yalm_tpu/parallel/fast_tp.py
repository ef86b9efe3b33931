"""Tensor-parallel fast decode: shard_map over the Pallas kernels.

The oracle TP path lets NamedSharding + jit insert collectives around plain
XLA ops; this module is the performance twin for the Pallas decode path.
Each device runs the SAME fused kernels (ops/pallas) on its local Megatron
shard — its heads' q/k/v, its slice of the FFN hidden dim, its kv-heads'
cache — and the only cross-chip traffic is:

  - one psum after the wo-projection        (row-parallel matmul)
  - one psum after the w2-projection        (row-parallel matmul)
  - one psum to assemble the embedding row  (vocab-sharded table)
  - one all_gather of the vocab-sharded logits

which is exactly the Megatron-LM communication pattern (2 collectives per
block) riding ICI. The reference is single-device (src/model.cpp:385-386
"TODO: support multiple CUDA devices"); this is its scale-out replacement.

Weight layout: the same `FastWeights` concatenation the single-chip path
uses, but **shard-major** — wqkv rows are ordered [wq_0;wk_0;wv_0; wq_1;…]
so a plain P(None, 'tp', None) hands every shard its own contiguous
[q_s; k_s; v_s] stack (likewise [w1_s; w3_s] for w13). That keeps the
per-shard kernel count identical to the single-chip fast path: ONE fused
attention-block kernel (or one wqkv GEMV + fused attention + wo GEMV) and
ONE fused FFN kernel per layer, with `add_residual=False` so the row-
parallel partial products psum before the residual add.

Three entry points:
  make_decode_step_fast_tp — single-stream decode step (tp, + ep for MoE)
  make_prefill_fast_tp     — chunked prefill on the same layout
  make_tick_fast_tp        — continuous-batching tick over dp x ep x tp
                             (lanes shard on dp, heads/hidden on tp,
                             experts on ep)
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import KV_SINKS, ModelConfig
from ..models.cache import KVCache
from ..models.fast import (FastScales, FastWeights, _cap_logits, _layer_alt,
                           _layer_win, _post_norm, _proj1_l, _proj1_le,
                           _proj_l, _proj_le, _sliding_mask_fn,
                           _softcap_scores, _qk_norm, is_int4)
from ..models.weights import Weights
from ..ops.core import apply_rope, gelu, moe_gate, silu, rmsnorm
from ..ops.pallas.attention import (attend_step_batched_l, attend_step_l,
                                    attention_supported)
from ..ops.pallas.block import attn_block_dims_supported, attn_block_l
from ..ops.pallas.ffn import ffn_l
from ..ops.pallas.gemv import (gemm, gemm_l, gemv, gemv_l,
                               gemv_supported, pick_blocks)
from .sharding import cache_pspecs


# ---------------------------------------------------------------------------
# Weight layout + placement
# ---------------------------------------------------------------------------

from ..models.fast import shard_major as _shard_major


def fast_tp_weights(w: Weights, cfg: ModelConfig, tp: int) -> FastWeights:
    """Build the shard-major FastWeights layout from oracle Weights.

    With tp=1 this is exactly FastWeights.from_weights. The interleave only
    reorders rows of wqkv / w13 / bqkv; everything else is the single-chip
    decode layout.
    """
    lw = w.layers
    ffn_axis = 2 if cfg.is_moe else 1
    return FastWeights(
        embed=w.embed,
        rms_att=lw.rms_att,
        rms_ffn=lw.rms_ffn,
        wqkv=_shard_major([lw.wq, lw.wk, lw.wv], tp, 1),
        wo=lw.wo,
        w13=_shard_major([lw.w1, lw.w3], tp, ffn_axis),
        w2=lw.w2,
        final_norm=w.final_norm,
        lm_head=w.lm_head,
        moegate=lw.moegate,
        bqkv=(_shard_major([lw.bq, lw.bk, lw.bv], tp, 1)
              if lw.bq is not None else None),
        qnorm=lw.qn,
        knorm=lw.kn,
        pa=lw.pa,
        pf=lw.pf,
    )


def fast_weight_pspecs(cfg: ModelConfig,
                       with_scales: bool = False) -> FastWeights:
    """PartitionSpecs for the shard-major FastWeights layout."""
    e = ("ep",) if cfg.is_moe else ()
    scales = None
    if with_scales and cfg.weight_dtype == "int4":
        # int4 GROUP scales are (L, [E,] G, N). Column-parallel weights
        # (wqkv, w13) shard the N axis with their output rows; row-parallel
        # weights (wo, w2) shard their INPUT dim, i.e. the GROUP axis —
        # the packed column slices stay group-aligned because the local
        # input dims are multiples of the 512-col group (enforced by
        # fast_tp_supported's int4 pair checks). embed/head stay
        # per-channel int8; MoE experts shard on 'ep' ahead of (G, N) and
        # the int8 router scale (L, E) replicates with its weights.
        scales = FastScales(
            embed=P("tp"),
            wqkv=P(None, None, "tp"),
            wo=P(None, "tp", None),
            w13=P(None, *e, None, "tp"),
            w2=P(None, *e, "tp", None),
            lm_head=P("tp"),
            moegate=P(None, None) if cfg.is_moe else None,
        )
    elif with_scales:
        # int8 dequant scales shard like their weights' OUTPUT rows
        scales = FastScales(
            embed=P("tp"),
            wqkv=P(None, "tp"),
            wo=P(None, None),
            w13=P(None, *e, "tp"),
            w2=P(None, *e, None),
            lm_head=P("tp"),
            moegate=P(None, None) if cfg.is_moe else None,
        )
    return FastWeights(
        scales=scales,
        embed=P("tp", None),
        rms_att=P(None, None),
        rms_ffn=P(None, None),
        wqkv=P(None, "tp", None),
        wo=P(None, None, "tp"),
        w13=P(None, *e, "tp", None),
        w2=P(None, *e, None, "tp"),
        final_norm=P(None),
        lm_head=P("tp", None),
        moegate=P(None, None, None) if cfg.is_moe else None,
        bqkv=P(None, "tp") if cfg.has_qkv_bias else None,
        # per-head-dim q/k norm weights replicate (shared by all heads)
        qnorm=P(None, None) if cfg.has_qk_norm else None,
        knorm=P(None, None) if cfg.has_qk_norm else None,
        # sandwich norms act on the psum'd full-width delta -> replicate
        pa=P(None, None) if cfg.has_post_norms else None,
        pf=P(None, None) if cfg.has_post_norms else None,
    )


def shard_fast_tp_weights(weights: Weights | FastWeights, cfg: ModelConfig,
                          mesh: Mesh) -> FastWeights:
    """Place (already shard-major) FastWeights on the mesh; a Weights input
    is rearranged first."""
    if isinstance(weights, Weights):
        weights = fast_tp_weights(weights, cfg, mesh.shape["tp"])
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        fast_weight_pspecs(cfg, with_scales=weights.scales is not None),
        is_leaf=lambda x: isinstance(x, P))
    return jax.tree.map(jax.device_put, weights, shardings)


def fast_tp_supported(cfg: ModelConfig, tp: int, ep: int = 1) -> bool:
    """Models whose LOCAL shard shapes still fit the kernel tiling.

    Dense: experts absent, ep must be 1. MoE: experts shard over `ep`,
    expert-internal dims over `tp`."""
    if tp < 1 or ep < 1:
        return False
    if cfg.is_moe:
        if cfg.n_experts % ep:
            return False
    elif ep != 1:
        return False
    if cfg.n_kv_heads % tp or cfg.n_heads % tp or cfg.hidden_dim % tp \
            or cfg.vocab_size % tp:
        return False
    pairs = [
        ((cfg.q_dim + 2 * cfg.kv_dim) // tp, cfg.dim),
        (cfg.dim, cfg.q_dim // tp),
        (2 * cfg.hidden_dim // tp, cfg.dim),
        (cfg.dim, cfg.hidden_dim // tp),
        (cfg.vocab_size // tp, cfg.dim),
    ]
    if cfg.is_moe:
        pairs.append((cfg.n_experts, cfg.dim))
    if cfg.weight_dtype == "int4":
        from ..ops.pallas.gemv import int4_group, int4_supported
        # packed kernels on LOCAL shards: wqkv/w13 keep full K and shard
        # rows (per-expert for MoE — pairs[2:4] are already the expert-
        # internal dims); wo/w2 shard their packed INPUT columns, so the
        # local input dim must keep the GLOBAL group size (512-col groups
        # must not straddle shard boundaries or shrink locally). The MoE
        # router stays per-channel int8 and is covered by gemv_supported.
        if not all(int4_supported(n, k) for n, k in pairs[:4]):
            return False
        for k_global in (cfg.q_dim, cfg.hidden_dim):
            k_local = k_global // tp
            if k_local % int4_group(k_global) != 0:
                return False
    return all(gemv_supported(n, k) for n, k in pairs) and attention_supported(cfg)


# ---------------------------------------------------------------------------
# Shared per-shard building blocks
# ---------------------------------------------------------------------------

def _embed_psum(embed_local, tokens, V_l: int, scale_local=None):
    """Vocab-sharded embedding gather: local rows masked + psum over tp.
    tokens may be scalar () or batched (B,)."""
    shard0 = jax.lax.axis_index("tp") * V_l
    loc = jnp.clip(tokens - shard0, 0, V_l - 1)
    rows = embed_local[loc].astype(jnp.float32)
    if scale_local is not None:
        rows = rows * scale_local[loc][..., None]
    in_range = (tokens >= shard0) & (tokens < shard0 + V_l)
    rows = jnp.where(in_range[..., None] if rows.ndim > 1 else in_range,
                     rows, 0.0)
    return jax.lax.psum(rows, "tp")


def _clipper(cfg):
    def clip(a):
        if math.isinf(cfg.qkv_clip):
            return a
        return jnp.clip(a, -cfg.qkv_clip, cfg.qkv_clip)
    return clip


def _use_block(cfg, tp: int, itemsize: int) -> bool:
    """Whether the fused attention-block kernel fits the LOCAL shard dims."""
    if cfg.has_post_norms or cfg.attn_softcap or any(cfg.layer_sliding):
        return False  # Gemma2 features take the unfused sequence
    if cfg.has_qk_norm:
        return False  # no norm hook between wqkv and in-kernel rope
    return attn_block_dims_supported(
        cfg.dim, cfg.q_dim // tp, cfg.kv_dim // tp, cfg.head_dim,
        cfg.max_seq_len, itemsize)


def _use_fused_ffn(cfg, tp: int, itemsize: int) -> bool:
    if cfg.has_post_norms:
        return False  # sandwich norm needs the unfused w13/w2 sequence
    h_l = cfg.hidden_dim // tp
    return (pick_blocks(2 * h_l, cfg.dim, itemsize)[1] == cfg.dim
            and pick_blocks(cfg.dim, h_l, itemsize)[1] == h_l)


# ---------------------------------------------------------------------------
# Single-stream decode step
# ---------------------------------------------------------------------------

def make_decode_step_fast_tp(cfg: ModelConfig, mesh: Mesh,
                             output_logits: bool = True,
                             with_scales: bool = False):
    """Build a jittable (fast_weights, token, pos, cache) -> (logits, cache)
    step that runs the Pallas fast path on every `tp` shard via shard_map.

    Per-shard kernel count matches the single-chip fast path: one fused
    attention-block kernel + one fused FFN kernel per dense layer (with
    add_residual=False so each row-parallel partial psums before the
    residual add). MoE models additionally use the mesh's `ep` axis: the
    router is computed replicated, each device evaluates only its LOCAL
    experts that the router selected (jax.lax.cond skips the weight stream
    for unselected local experts entirely — the data-dependent-skip property
    the reference gets from host control flow, src/infer.cpp:355-384), and
    one psum over ('ep','tp') assembles the FFN delta.
    """
    tp = mesh.shape["tp"]
    ep = mesh.shape.get("ep", 1)
    assert fast_tp_supported(cfg, tp, ep), (cfg, tp, ep)
    L = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    Hq_l, Hk_l = Hq // tp, Hk // tp
    q_l, kv_l, h_l = cfg.q_dim // tp, cfg.kv_dim // tp, cfg.hidden_dim // tp
    V_l = cfg.vocab_size // tp
    E_l = cfg.n_experts // ep if cfg.is_moe else 0
    act = silu if cfg.act_type == "silu" else gelu
    clip = _clipper(cfg)
    w_specs = fast_weight_pspecs(cfg, with_scales)
    c_specs = cache_pspecs(cfg)

    def step(fw: FastWeights, token, pos, cache: KVCache):
        itemsize = fw.wqkv.dtype.itemsize
        sc = fw.scales
        int4w = is_int4(fw.wqkv)
        use_block = not int4w and _use_block(cfg, tp, itemsize)
        fused_ffn = (not cfg.is_moe and not int4w
                     and _use_fused_ffn(cfg, tp, itemsize))
        x = _embed_psum(fw.embed, token, V_l,
                        sc.embed if sc is not None else None)
        if cfg.embed_scale != 1.0:
            x = x * cfg.embed_scale

        kv_sink = jnp.where(pos >= L, KV_SINKS, 0)
        kv_pos = kv_sink + (pos - kv_sink) % (L - kv_sink)
        kv_len = jnp.minimum(pos + 1, L)

        def layer_body(i, carry):
            x, k_all, v_all = carry
            if use_block:
                delta, k_all, v_all = attn_block_l(
                    x, fw.rms_att, fw.wqkv, fw.wo, k_all, v_all, i,
                    kv_pos, kv_len, kv_sink, pos,
                    n_heads=Hq_l, kv_sinks=KV_SINKS, theta=cfg.rope_param,
                    rotary_dim=cfg.rotary_dim, norm_eps=cfg.norm_eps,
                    qkv_clip=cfg.qkv_clip, bqkv_all=fw.bqkv,
                    add_residual=False,
                    scale_qkv=sc.wqkv if sc is not None else None,
                    scale_o=sc.wo if sc is not None else None)
            else:
                xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                    fw.rms_att, i, keepdims=False), cfg.norm_eps)
                qkv = _proj1_l(xb, fw.wqkv, i,
                             sc.wqkv if sc is not None else None)
                if fw.bqkv is not None:
                    qkv = qkv + jax.lax.dynamic_index_in_dim(
                        fw.bqkv, i, keepdims=False)
                qkv = clip(qkv)
                q = qkv[:q_l]
                k = qkv[q_l:q_l + kv_l]
                v = qkv[q_l + kv_l:]
                q, k = _qk_norm(q, k, fw, i, cfg)
                mixed, k_all, v_all = attend_step_l(
                    q.reshape(Hk_l, Hq_l // Hk_l, D), k.reshape(Hk_l, D),
                    v.reshape(Hk_l, D), k_all, v_all,
                    i, kv_pos, kv_len, kv_sink, pos,
                    _layer_win(cfg, i), _layer_alt(cfg, i),
                    kv_sinks=KV_SINKS, theta=cfg.rope_param,
                    rotary_dim=cfg.rotary_dim, softcap=cfg.attn_softcap)
                delta = _proj1_l(mixed.reshape(q_l), fw.wo, i,
                               sc.wo if sc is not None else None)
            # row-parallel wo: partial sums -> ONE psum per block; sandwich
            # norm acts on the FULL (post-psum) delta
            x = x + _post_norm(jax.lax.psum(delta, "tp"), fw.pa, i,
                               cfg.norm_eps)

            if cfg.is_moe:
                xb2 = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                    fw.rms_ffn, i, keepdims=False), cfg.norm_eps)
                # replicated router; only routed LOCAL experts stream bytes
                router = gemv_l(xb2, fw.moegate, i,
                                scale=sc.moegate if sc is not None else None)
                gates, idx = moe_gate(router, cfg.n_experts_active)
                e0 = jax.lax.axis_index("ep") * E_l
                delta = jnp.zeros((cfg.dim,), jnp.float32)
                for le in range(E_l):
                    ge = e0 + le
                    gate = jnp.sum(jnp.where(idx == ge, gates, 0.0))
                    routed = jnp.any(idx == ge)

                    def run(xb2=xb2, le=le):
                        h13 = _proj1_le(xb2, fw.w13, i, jnp.int32(le),
                                        sc.w13 if sc is not None else None)
                        h = act(h13[:h_l]) * h13[h_l:]
                        return _proj1_le(h, fw.w2, i, jnp.int32(le),
                                         sc.w2 if sc is not None else None)

                    delta = delta + gate * jax.lax.cond(
                        routed, run, lambda: jnp.zeros((cfg.dim,), jnp.float32))
                # FFN delta assembles across experts (ep) AND hidden (tp)
                x = x + jax.lax.psum(delta, ("ep", "tp"))
            elif fused_ffn:
                d = ffn_l(x, fw.rms_ffn, fw.w13, fw.w2, i,
                          sc.w13 if sc is not None else None,
                          sc.w2 if sc is not None else None,
                          norm_eps=cfg.norm_eps, act=cfg.act_type,
                          add_residual=False)
                x = x + jax.lax.psum(d, "tp")
            else:
                xb2 = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                    fw.rms_ffn, i, keepdims=False), cfg.norm_eps)
                h13 = _proj1_l(xb2, fw.w13, i,
                             sc.w13 if sc is not None else None)
                h = act(h13[:h_l]) * h13[h_l:]
                x = x + _post_norm(
                    jax.lax.psum(_proj1_l(h, fw.w2, i,
                                          sc.w2 if sc is not None else None),
                                 "tp"), fw.pf, i, cfg.norm_eps)
            return (x, k_all, v_all)

        x, k_new, v_new = jax.lax.fori_loop(
            0, cfg.n_layers, layer_body, (x, cache.k, cache.v))
        if not output_logits:
            # hydrate-only steps skip the lm_head stream + logits gather
            return jnp.zeros((1,), jnp.float32), KVCache(k=k_new, v=v_new)
        x = rmsnorm(x, fw.final_norm, cfg.norm_eps)
        # vocab-sharded logits -> gathered so the sampler sees the full row
        # (the softcap is elementwise: capping local shards is exact)
        logits = jax.lax.all_gather(
            _cap_logits(cfg, gemv(x, fw.lm_head,
                                  sc.lm_head if sc is not None else None)),
            "tp").reshape(-1)
        return logits, KVCache(k=k_new, v=v_new)

    return shard_map(
        step, mesh=mesh,
        in_specs=(w_specs, P(), P(), c_specs),
        out_specs=(P(), c_specs),
        check_vma=False,
    )


# ---------------------------------------------------------------------------
# Chunked prefill on the shard-major layout
# ---------------------------------------------------------------------------

def make_prefill_fast_tp(cfg: ModelConfig, mesh: Mesh,
                         with_scales: bool = False):
    """Build prefill(fast_weights, tokens, pos0, valid_len, cache,
    logits_mode) over the mesh: same chunk semantics as prefill_fast
    (models/fast.py) with the Megatron collectives of the decode step.
    """
    tp = mesh.shape["tp"]
    ep = mesh.shape.get("ep", 1)
    assert fast_tp_supported(cfg, tp, ep)
    S = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    Hq_l, Hk_l = Hq // tp, Hk // tp
    q_l, kv_l, h_l = cfg.q_dim // tp, cfg.kv_dim // tp, cfg.hidden_dim // tp
    V_l = cfg.vocab_size // tp
    E_l = cfg.n_experts // ep if cfg.is_moe else 0
    qpk = Hq // Hk
    act = silu if cfg.act_type == "silu" else gelu
    clip = _clipper(cfg)
    w_specs = fast_weight_pspecs(cfg, with_scales)
    c_specs = cache_pspecs(cfg)

    def body(fw: FastWeights, tokens, pos0, valid_len, cache: KVCache,
             logits_mode: str):
        T = tokens.shape[0]
        sc = fw.scales
        x = _embed_psum(fw.embed, tokens, V_l,
                        sc.embed if sc is not None else None)  # (T, dim)
        if cfg.embed_scale != 1.0:
            x = x * cfg.embed_scale
        positions = pos0 + jnp.arange(T)
        valid = jnp.arange(T) < valid_len
        att_mask = jnp.arange(S)[None, :] <= positions[:, None]
        mask_of = _sliding_mask_fn(cfg, positions, att_mask, S)

        def attend_chunk_bf16(q4, kc, vc, mask):
            scores = jnp.einsum("tgqd,lgd->gqtl", q4.astype(jnp.bfloat16),
                                kc.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32) / math.sqrt(D)
            scores = _softcap_scores(cfg, scores)
            att = jax.nn.softmax(
                jnp.where(mask[None, None], scores, -1e30), axis=-1)
            return jnp.einsum("gqtl,lgd->tgqd", att.astype(jnp.bfloat16),
                              vc.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)

        def layer_body(i, carry):
            x, k_all, v_all = carry
            xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                fw.rms_att, i, keepdims=False), cfg.norm_eps)
            qkv = _proj_l(xb, fw.wqkv, i,
                         sc.wqkv if sc is not None else None)  # (T, local)
            if fw.bqkv is not None:
                qkv = qkv + jax.lax.dynamic_index_in_dim(
                    fw.bqkv, i, keepdims=False)
            qkv = clip(qkv)
            qf, kf = _qk_norm(qkv[:, :q_l], qkv[:, q_l:q_l + kv_l],
                              fw, i, cfg)
            q = apply_rope(qf.reshape(T, Hq_l, D), positions,
                           cfg.rope_param, cfg.rotary_dim,
                           _layer_alt(cfg, i))
            k = apply_rope(kf.reshape(T, Hk_l, D), positions,
                           cfg.rope_param, cfg.rotary_dim,
                           _layer_alt(cfg, i))
            v = qkv[:, q_l + kv_l:].reshape(T, Hk_l, D)

            old_k = jax.lax.dynamic_slice(k_all, (i, pos0, 0, 0), (1, T, Hk_l, D))
            old_v = jax.lax.dynamic_slice(v_all, (i, pos0, 0, 0), (1, T, Hk_l, D))
            vmask = valid[:, None, None]
            k_all = jax.lax.dynamic_update_slice(
                k_all, jnp.where(vmask, k.astype(k_all.dtype), old_k[0])[None],
                (i, pos0, 0, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, jnp.where(vmask, v.astype(v_all.dtype), old_v[0])[None],
                (i, pos0, 0, 0))
            kc = jax.lax.dynamic_index_in_dim(k_all, i, keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(v_all, i, keepdims=False)
            mixed = attend_chunk_bf16(q.reshape(T, Hk_l, qpk, D), kc, vc,
                                      mask_of(i))
            x = x + _post_norm(jax.lax.psum(
                _proj_l(mixed.reshape(T, q_l), fw.wo, i,
                       sc.wo if sc is not None else None), "tp"),
                fw.pa, i, cfg.norm_eps)

            xb2 = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                fw.rms_ffn, i, keepdims=False), cfg.norm_eps)
            if cfg.is_moe:
                # every LOCAL expert streams once per chunk; per-token gates
                # masked (amortized over T this matches routed traffic)
                router = gemm_l(xb2, fw.moegate, i,
                                sc.moegate if sc is not None else None)
                gates, idx = jax.vmap(moe_gate, in_axes=(0, None))(
                    router, cfg.n_experts_active)
                e0 = jax.lax.axis_index("ep") * E_l
                delta = jnp.zeros_like(x)
                for le in range(E_l):
                    ge = e0 + le
                    gate_e = jnp.sum(jnp.where(idx == ge, gates, 0.0), axis=-1)
                    h13 = _proj_le(xb2, fw.w13, i, jnp.int32(le),
                                   sc.w13 if sc is not None else None)
                    h = act(h13[:, :h_l]) * h13[:, h_l:]
                    delta = delta + gate_e[:, None] * _proj_le(
                        h, fw.w2, i, jnp.int32(le),
                        sc.w2 if sc is not None else None)
                x = x + jax.lax.psum(delta, ("ep", "tp"))
            else:
                h13 = _proj_l(xb2, fw.w13, i,
                             sc.w13 if sc is not None else None)
                h = act(h13[:, :h_l]) * h13[:, h_l:]
                x = x + _post_norm(
                    jax.lax.psum(_proj_l(h, fw.w2, i,
                                         sc.w2 if sc is not None else None),
                                 "tp"), fw.pf, i, cfg.norm_eps)
            return (x, k_all, v_all)

        x, k_new, v_new = jax.lax.fori_loop(
            0, cfg.n_layers, layer_body, (x, cache.k, cache.v))
        new_cache = KVCache(k=k_new, v=v_new)

        if logits_mode == "none":
            return jnp.zeros((1,), jnp.float32), new_cache
        if logits_mode == "last":
            x_last = jnp.take(x, valid_len - 1, axis=0)
            x_last = rmsnorm(x_last, fw.final_norm, cfg.norm_eps)
            logits = jax.lax.all_gather(
                _cap_logits(cfg, gemv(x_last, fw.lm_head,
                                      sc.lm_head if sc is not None else None)),
                "tp").reshape(-1)
            return logits, new_cache
        # "all"
        xn = rmsnorm(x, fw.final_norm, cfg.norm_eps)
        local = jax.lax.dot_general(
            xn.astype(jnp.bfloat16), fw.lm_head.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if sc is not None:
            local = local * sc.lm_head[None].astype(jnp.float32)
        logits = jax.lax.all_gather(_cap_logits(cfg, local), "tp",
                                    axis=1, tiled=True)
        return logits, new_cache

    fns = {
        mode: shard_map(
            (lambda m: lambda fw, t, p, vl, c: body(fw, t, p, vl, c, m))(mode),
            mesh=mesh,
            in_specs=(w_specs, P(), P(), P(), c_specs),
            out_specs=(P(), c_specs),
            check_vma=False)
        for mode in ("none", "last", "all")
    }

    def prefill(fw, tokens, pos0, valid_len, cache, logits_mode="last"):
        out, cache = fns[logits_mode](fw, tokens, pos0, valid_len, cache)
        if logits_mode == "none":
            return None, cache
        return out, cache

    return prefill


# ---------------------------------------------------------------------------
# Continuous-batching tick over dp x ep x tp
# ---------------------------------------------------------------------------

def make_tick_fast_tp(cfg: ModelConfig, mesh: Mesh,
                      with_scales: bool = False):
    """Build the batched decode tick (fast_weights, tokens, positions,
    cache) -> (logits, cache) with lanes sharded on `dp`, heads/hidden on
    `tp`, and experts on `ep` — the SURVEY §2.6 north-star composition of
    continuous batching with the mesh (nothing comparable in the reference,
    src/main.cpp:102-112).

    Each dp group decodes its own B/dp lanes against the replicated-on-dp
    weights; inside a group the math is the batched single-chip tick on the
    tp-local shard. MoE streams every LOCAL expert once per tick (masked
    per-lane gates) and psums over ('ep','tp') — expert parallelism in the
    batched regime.
    """
    tp = mesh.shape["tp"]
    ep = mesh.shape.get("ep", 1)
    dp = mesh.shape.get("dp", 1)
    assert fast_tp_supported(cfg, tp, ep), (cfg, tp, ep)
    L = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    Hq_l, Hk_l = Hq // tp, Hk // tp
    q_l, kv_l, h_l = cfg.q_dim // tp, cfg.kv_dim // tp, cfg.hidden_dim // tp
    V_l = cfg.vocab_size // tp
    E_l = cfg.n_experts // ep if cfg.is_moe else 0
    qpk = Hq // Hk
    act = silu if cfg.act_type == "silu" else gelu
    clip = _clipper(cfg)
    w_specs = fast_weight_pspecs(cfg, with_scales)
    c_specs = cache_pspecs(cfg, batched=True)

    def tick(fw: FastWeights, tokens, positions, cache: KVCache,
             write_mask=None):
        B_l = tokens.shape[0]                      # local lanes (B / dp)
        itemsize = fw.wqkv.dtype.itemsize
        sc = fw.scales
        fused_ffn = (not cfg.is_moe and not is_int4(fw.wqkv)
                     and _use_fused_ffn(cfg, tp, itemsize))
        x = _embed_psum(fw.embed, tokens, V_l,
                        sc.embed if sc is not None else None)  # (B_l, dim)
        if cfg.embed_scale != 1.0:
            x = x * cfg.embed_scale

        kv_sink = jnp.where(positions >= L, KV_SINKS, 0)
        kv_pos = kv_sink + (positions - kv_sink) % (L - kv_sink)
        kv_len = jnp.minimum(positions + 1, L)

        def layer_body(i, carry):
            x, k_all, v_all = carry
            xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                fw.rms_att, i, keepdims=False), cfg.norm_eps)
            qkv = _proj_l(xb, fw.wqkv, i,
                         sc.wqkv if sc is not None else None)  # (B_l, local)
            if fw.bqkv is not None:
                qkv = qkv + jax.lax.dynamic_index_in_dim(
                    fw.bqkv, i, keepdims=False)
            qkv = clip(qkv)
            q = qkv[:, :q_l]
            k = qkv[:, q_l:q_l + kv_l]
            v = qkv[:, q_l + kv_l:]
            q, k = _qk_norm(q, k, fw, i, cfg)
            mixed, k_all, v_all = attend_step_batched_l(
                q.reshape(B_l, Hk_l, qpk, D), k.reshape(B_l, Hk_l, D),
                v.reshape(B_l, Hk_l, D), k_all, v_all, i,
                kv_pos, kv_len, kv_sink, positions, write_mask,
                _layer_win(cfg, i), _layer_alt(cfg, i),
                kv_sinks=KV_SINKS, theta=cfg.rope_param,
                rotary_dim=cfg.rotary_dim, softcap=cfg.attn_softcap)
            x = x + _post_norm(jax.lax.psum(
                _proj_l(mixed.reshape(B_l, q_l), fw.wo, i,
                       sc.wo if sc is not None else None), "tp"),
                fw.pa, i, cfg.norm_eps)

            if cfg.is_moe:
                xb2 = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                    fw.rms_ffn, i, keepdims=False), cfg.norm_eps)
                router = gemm_l(xb2, fw.moegate, i,
                                sc.moegate if sc is not None else None)
                gates, idx = jax.vmap(moe_gate, in_axes=(0, None))(
                    router, cfg.n_experts_active)
                e0 = jax.lax.axis_index("ep") * E_l
                delta = jnp.zeros_like(x)
                for le in range(E_l):
                    ge = e0 + le
                    gate_e = jnp.sum(jnp.where(idx == ge, gates, 0.0), axis=-1)
                    h13 = _proj_le(xb2, fw.w13, i, jnp.int32(le),
                                   sc.w13 if sc is not None else None)
                    h = act(h13[:, :h_l]) * h13[:, h_l:]
                    delta = delta + gate_e[:, None] * _proj_le(
                        h, fw.w2, i, jnp.int32(le),
                        sc.w2 if sc is not None else None)
                x = x + jax.lax.psum(delta, ("ep", "tp"))
            elif fused_ffn:
                d = ffn_l(x, fw.rms_ffn, fw.w13, fw.w2, i,
                          sc.w13 if sc is not None else None,
                          sc.w2 if sc is not None else None,
                          norm_eps=cfg.norm_eps, act=cfg.act_type,
                          add_residual=False)
                x = x + jax.lax.psum(d, "tp")
            else:
                xb2 = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                    fw.rms_ffn, i, keepdims=False), cfg.norm_eps)
                h13 = _proj_l(xb2, fw.w13, i,
                             sc.w13 if sc is not None else None)
                h = act(h13[:, :h_l]) * h13[:, h_l:]
                x = x + _post_norm(
                    jax.lax.psum(_proj_l(h, fw.w2, i,
                                         sc.w2 if sc is not None else None),
                                 "tp"), fw.pf, i, cfg.norm_eps)
            return (x, k_all, v_all)

        x, k_new, v_new = jax.lax.fori_loop(
            0, cfg.n_layers, layer_body, (x, cache.k, cache.v))
        x = rmsnorm(x, fw.final_norm, cfg.norm_eps)
        local = gemm(x, fw.lm_head,
                     sc.lm_head if sc is not None else None)   # (B_l, V_l)
        logits = jax.lax.all_gather(_cap_logits(cfg, local), "tp",
                                    axis=1, tiled=True)
        return logits, KVCache(k=k_new, v=v_new)

    return shard_map(
        tick, mesh=mesh,
        in_specs=(w_specs, P("dp"), P("dp"), c_specs, P("dp")),
        out_specs=(P("dp", None), c_specs),
        check_vma=False,
    )


# ---------------------------------------------------------------------------
# Batched verify chunk over dp x tp (scheduler speculation x mesh)
# ---------------------------------------------------------------------------

def make_verify_chunk_fast_tp(cfg: ModelConfig, mesh: Mesh,
                              with_scales: bool = False,
                              with_hidden: bool = False):
    """Build verify(fast_weights, tokens (B,T), pos0 (B,), enable (B,),
    cache) -> (logits (B,T,V), cache): the scheduler-level speculative
    verify sweep (models/fast.verify_chunk_fast_batched) with lanes sharded
    on `dp` and heads/hidden on `tp`. One target weight-sweep scores every
    lane's proposed chunk across the whole mesh — speculation COMPOSED with
    tensor parallelism (nothing comparable in the reference,
    src/main.cpp:102-112). Dense models only (spec-mode envelope); `ep`
    must be 1.

    with_hidden=True returns ((logits, hidden (B, T, dim)), cache): the
    post-final-norm rows Medusa heads read. The rows are replicated across
    tp already (x lives replicated after each wo/w2 psum), so exposing
    them is pure output plumbing — the round-4 blocker for medusa x mesh."""
    tp = mesh.shape["tp"]
    ep = mesh.shape.get("ep", 1)
    assert not cfg.is_moe and ep == 1, "spec verify x mesh: dense, ep=1"
    assert fast_tp_supported(cfg, tp, ep)
    S = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    Hq_l, Hk_l = Hq // tp, Hk // tp
    q_l, kv_l, h_l = cfg.q_dim // tp, cfg.kv_dim // tp, cfg.hidden_dim // tp
    V_l = cfg.vocab_size // tp
    qpk = Hq // Hk
    act = silu if cfg.act_type == "silu" else gelu
    clip = _clipper(cfg)
    w_specs = fast_weight_pspecs(cfg, with_scales)
    c_specs = cache_pspecs(cfg, batched=True)

    def body(fw: FastWeights, tokens, pos0, enable, cache: KVCache):
        B_l, T = tokens.shape
        sc = fw.scales
        p0 = jnp.where(enable != 0, pos0, 0)
        positions = p0[:, None] + jnp.arange(T)[None, :]        # (B_l, T)
        att_mask = jnp.arange(S)[None, None, :] <= positions[:, :, None]
        mask_of = _sliding_mask_fn(cfg, positions, att_mask, S)

        x = _embed_psum(fw.embed, tokens.reshape(-1), V_l,
                        sc.embed if sc is not None else None)   # (B_l*T, dim)
        if cfg.embed_scale != 1.0:
            x = x * cfg.embed_scale

        def attend(q4, kc, vc, mask):
            scores = jnp.einsum("btgqd,bsgd->bgqts", q4.astype(jnp.bfloat16),
                                kc.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32) / math.sqrt(D)
            scores = _softcap_scores(cfg, scores)
            att = jax.nn.softmax(
                jnp.where(mask[:, None, None], scores, -1e30), axis=-1)
            return jnp.einsum("bgqts,bsgd->btgqd", att.astype(jnp.bfloat16),
                              vc.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)

        def layer_body(i, carry):
            x, k_all, v_all = carry
            xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                fw.rms_att, i, keepdims=False), cfg.norm_eps)
            qkv = _proj_l(xb, fw.wqkv, i,
                         sc.wqkv if sc is not None else None)  # (B_l*T, local)
            if fw.bqkv is not None:
                qkv = qkv + jax.lax.dynamic_index_in_dim(
                    fw.bqkv, i, keepdims=False)
            qkv = clip(qkv).reshape(B_l, T, -1)
            alt_i = _layer_alt(cfg, i)
            rope_b = jax.vmap(lambda a, p: apply_rope(a, p, cfg.rope_param,
                                                      cfg.rotary_dim,
                                                      alt_i))
            qf, kf = _qk_norm(qkv[..., :q_l], qkv[..., q_l:q_l + kv_l],
                              fw, i, cfg)
            q = rope_b(qf.reshape(B_l, T, Hq_l, D), positions)
            k = rope_b(kf.reshape(B_l, T, Hk_l, D),
                       positions)
            v = qkv[..., q_l + kv_l:].reshape(B_l, T, Hk_l, D)

            def dus_lane(cl, rows, s0, en):
                old = jax.lax.dynamic_slice(cl, (s0, 0, 0), (T, Hk_l, D))
                new = jnp.where(en, rows.astype(cl.dtype), old)
                return jax.lax.dynamic_update_slice(cl, new, (s0, 0, 0))

            en = (enable != 0)[:, None, None, None]
            kc_i = jax.lax.dynamic_index_in_dim(k_all, i, axis=1,
                                                keepdims=False)
            vc_i = jax.lax.dynamic_index_in_dim(v_all, i, axis=1,
                                                keepdims=False)
            kc_i = jax.vmap(dus_lane)(kc_i, k, p0, en)
            vc_i = jax.vmap(dus_lane)(vc_i, v, p0, en)
            k_all = jax.lax.dynamic_update_slice(
                k_all, kc_i[:, None].astype(k_all.dtype), (0, i, 0, 0, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, vc_i[:, None].astype(v_all.dtype), (0, i, 0, 0, 0))

            mixed = attend(q.reshape(B_l, T, Hk_l, qpk, D), kc_i, vc_i,
                           mask_of(i))
            x = x + _post_norm(jax.lax.psum(
                _proj_l(mixed.reshape(B_l * T, q_l), fw.wo, i,
                       sc.wo if sc is not None else None), "tp"),
                fw.pa, i, cfg.norm_eps)
            xb2 = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                fw.rms_ffn, i, keepdims=False), cfg.norm_eps)
            h13 = _proj_l(xb2, fw.w13, i,
                         sc.w13 if sc is not None else None)
            h = act(h13[:, :h_l]) * h13[:, h_l:]
            x = x + _post_norm(
                jax.lax.psum(_proj_l(h, fw.w2, i,
                                     sc.w2 if sc is not None else None),
                             "tp"), fw.pf, i, cfg.norm_eps)
            return (x, k_all, v_all)

        x, k_new, v_new = jax.lax.fori_loop(
            0, cfg.n_layers, layer_body, (x, cache.k, cache.v))
        xn = rmsnorm(x, fw.final_norm, cfg.norm_eps)
        local = jax.lax.dot_general(
            xn.astype(jnp.bfloat16), fw.lm_head.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if sc is not None:
            local = local * sc.lm_head[None].astype(jnp.float32)
        logits = jax.lax.all_gather(_cap_logits(cfg, local), "tp",
                                    axis=1, tiled=True)
        new_cache = KVCache(k=k_new, v=v_new)
        if with_hidden:
            return (logits.reshape(B_l, T, -1),
                    xn.reshape(B_l, T, -1)), new_cache
        return logits.reshape(B_l, T, -1), new_cache

    return shard_map(
        body, mesh=mesh,
        in_specs=(w_specs, P("dp"), P("dp"), P("dp"), c_specs),
        out_specs=(((P("dp"), P("dp")) if with_hidden else P("dp")), c_specs),
        check_vma=False,
    )


def make_verify_chunk_paged_fast_tp(cfg: ModelConfig, mesh: Mesh,
                                    page_size: int,
                                    with_scales: bool = False,
                                    with_hidden: bool = False):
    """Speculative verify sweep over a PAGED pool on the dp x tp mesh —
    the last composition corner (spec x paged x mesh): lanes + page-pool
    shards on `dp` (GROUP-LOCAL page ids), heads/hidden on `tp`. Chunk KV
    rows scatter through each group's tables exactly like the single-
    device paged verify (models/fast.verify_chunk_fast_batched_paged);
    disabled lanes collide harmlessly on their group's reserved page 0.
    Dense models, ep=1 (spec-mode envelope). with_hidden=True additionally
    returns the post-final-norm rows (medusa x paged x mesh)."""
    from ..models.paged import PagedKVPool

    tp = mesh.shape["tp"]
    assert mesh.shape.get("ep", 1) == 1 and not cfg.is_moe, \
        "spec verify x paged x mesh: dense, ep=1"
    assert fast_tp_supported(cfg, tp, 1)
    S = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    Hq_l, Hk_l = Hq // tp, Hk // tp
    q_l, kv_l, h_l = cfg.q_dim // tp, cfg.kv_dim // tp, cfg.hidden_dim // tp
    V_l = cfg.vocab_size // tp
    qpk = Hq // Hk
    act = silu if cfg.act_type == "silu" else gelu
    clip = _clipper(cfg)
    w_specs = fast_weight_pspecs(cfg, with_scales)
    p_specs = paged_pool_pspecs()

    def body(fw: FastWeights, tokens, pos0, enable, pool: "PagedKVPool",
             tables):
        B_l, T = tokens.shape
        sc = fw.scales
        p0 = jnp.where(enable != 0, pos0, 0)
        positions = p0[:, None] + jnp.arange(T)[None, :]        # (B_l, T)
        att_mask = jnp.arange(S)[None, None, :] <= positions[:, :, None]
        mask_of = _sliding_mask_fn(cfg, positions, att_mask, S)
        blk = positions // page_size
        row = positions % page_size
        pages = jnp.take_along_axis(tables, blk, axis=1)        # (B_l, T)
        pages = jnp.where(enable[:, None] != 0, pages, 0)       # sink page
        pf, rf = pages.reshape(-1), row.reshape(-1)

        x = _embed_psum(fw.embed, tokens.reshape(-1), V_l,
                        sc.embed if sc is not None else None)   # (B_l*T, dim)
        if cfg.embed_scale != 1.0:
            x = x * cfg.embed_scale

        def attend(q4, kc, vc, mask):
            scores = jnp.einsum("btgqd,bsgd->bgqts", q4.astype(jnp.bfloat16),
                                kc.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32) \
                / math.sqrt(D)
            scores = _softcap_scores(cfg, scores)
            att = jax.nn.softmax(
                jnp.where(mask[:, None, None], scores, -1e30), axis=-1)
            return jnp.einsum("bgqts,bsgd->btgqd", att.astype(jnp.bfloat16),
                              vc.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)

        def layer_body(i, carry):
            x, kp, vp = carry
            xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                fw.rms_att, i, keepdims=False), cfg.norm_eps)
            qkv = _proj_l(xb, fw.wqkv, i,
                         sc.wqkv if sc is not None else None)
            if fw.bqkv is not None:
                qkv = qkv + jax.lax.dynamic_index_in_dim(
                    fw.bqkv, i, keepdims=False)
            qkv = clip(qkv).reshape(B_l, T, -1)
            alt_i = _layer_alt(cfg, i)
            rope_b = jax.vmap(lambda a, p: apply_rope(a, p, cfg.rope_param,
                                                      cfg.rotary_dim,
                                                      alt_i))
            qf, kf = _qk_norm(qkv[..., :q_l], qkv[..., q_l:q_l + kv_l],
                              fw, i, cfg)
            q = rope_b(qf.reshape(B_l, T, Hq_l, D), positions)
            k = rope_b(kf.reshape(B_l, T, Hk_l, D), positions)
            v = qkv[..., q_l + kv_l:].reshape(B_l, T, Hk_l, D)

            # scatter BEFORE the gather so the chunk attends to itself
            kp = kp.at[pf, i, rf].set(
                k.reshape(B_l * T, Hk_l, D).astype(kp.dtype))
            vp = vp.at[pf, i, rf].set(
                v.reshape(B_l * T, Hk_l, D).astype(vp.dtype))
            kc = kp[tables, i].reshape(B_l, S, Hk_l, D)
            vc = vp[tables, i].reshape(B_l, S, Hk_l, D)
            mixed = attend(q.reshape(B_l, T, Hk_l, qpk, D), kc, vc,
                           mask_of(i))
            x = x + _post_norm(jax.lax.psum(
                _proj_l(mixed.reshape(B_l * T, q_l), fw.wo, i,
                       sc.wo if sc is not None else None), "tp"),
                fw.pa, i, cfg.norm_eps)
            xb2 = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                fw.rms_ffn, i, keepdims=False), cfg.norm_eps)
            h13 = _proj_l(xb2, fw.w13, i,
                         sc.w13 if sc is not None else None)
            h = act(h13[:, :h_l]) * h13[:, h_l:]
            x = x + _post_norm(
                jax.lax.psum(_proj_l(h, fw.w2, i,
                                     sc.w2 if sc is not None else None),
                             "tp"), fw.pf, i, cfg.norm_eps)
            return (x, kp, vp)

        x, kp, vp = jax.lax.fori_loop(
            0, cfg.n_layers, layer_body, (x, pool.k, pool.v))
        xn = rmsnorm(x, fw.final_norm, cfg.norm_eps)
        local = jax.lax.dot_general(
            xn.astype(jnp.bfloat16), fw.lm_head.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if sc is not None:
            local = local * sc.lm_head[None].astype(jnp.float32)
        logits = jax.lax.all_gather(_cap_logits(cfg, local), "tp",
                                    axis=1, tiled=True)
        new_pool = PagedKVPool(k=kp, v=vp)
        if with_hidden:
            return (logits.reshape(B_l, T, -1),
                    xn.reshape(B_l, T, -1)), new_pool
        return logits.reshape(B_l, T, -1), new_pool

    return shard_map(
        body, mesh=mesh,
        in_specs=(w_specs, P("dp"), P("dp"), P("dp"), p_specs, P("dp")),
        out_specs=(((P("dp"), P("dp")) if with_hidden else P("dp")), p_specs),
        check_vma=False,
    )


# ---------------------------------------------------------------------------
# Paged KV cache over the mesh (dp groups own pool shards; heads on tp)
# ---------------------------------------------------------------------------
#
# The page POOL shards its page axis on `dp` and its kv-head axis on `tp`:
# each dp group runs an independent allocator over its own pool shard, so
# page TABLES carry GROUP-LOCAL page ids and ride P('dp') with the lanes.
# Inside shard_map the math is exactly the single-device paged tick
# (models/fast.py decode_step_fast_batched_paged) on the tp-local heads.
# Dense models only, like the single-device paged path.


def paged_pool_pspecs() -> "PagedKVPool":
    from ..models.paged import PagedKVPool
    spec = P("dp", None, None, "tp", None)
    return PagedKVPool(k=spec, v=spec)


def shard_paged_pool(pool, mesh: Mesh):
    from ..models.paged import PagedKVPool
    sh = jax.tree.map(lambda s: NamedSharding(mesh, s), paged_pool_pspecs(),
                      is_leaf=lambda x: isinstance(x, P))
    return jax.tree.map(jax.device_put, pool, sh)


def make_tick_paged_fast_tp(cfg: ModelConfig, mesh: Mesh, page_size: int,
                            with_scales: bool = False):
    """Batched decode tick over a PAGED pool on the dp x tp mesh:
    (fw, tokens, positions, pool, tables, write_mask) -> (logits, pool).
    tables hold group-LOCAL page ids (each dp group owns its pool shard)."""
    from ..models.paged import PagedKVPool
    from ..ops.pallas.attention import attend_step_paged_l

    tp = mesh.shape["tp"]
    dp = mesh.shape.get("dp", 1)
    assert mesh.shape.get("ep", 1) == 1 and not cfg.is_moe, \
        "paged mesh tick: dense models (ep=1)"
    assert fast_tp_supported(cfg, tp, 1)
    L = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    Hk_l = Hk // tp
    q_l, kv_l, h_l = cfg.q_dim // tp, cfg.kv_dim // tp, cfg.hidden_dim // tp
    V_l = cfg.vocab_size // tp
    qpk = Hq // Hk
    act = silu if cfg.act_type == "silu" else gelu
    clip = _clipper(cfg)
    w_specs = fast_weight_pspecs(cfg, with_scales)
    p_specs = paged_pool_pspecs()

    def tick(fw: FastWeights, tokens, positions, pool: "PagedKVPool",
             tables, write_mask):
        B_l = tokens.shape[0]
        sc = fw.scales
        x = _embed_psum(fw.embed, tokens, V_l,
                        sc.embed if sc is not None else None)
        if cfg.embed_scale != 1.0:
            x = x * cfg.embed_scale

        kv_sink = jnp.where(positions >= L, KV_SINKS, 0)
        kv_pos = kv_sink + (positions - kv_sink) % (L - kv_sink)
        kv_len = jnp.minimum(positions + 1, L)

        def layer_body(i, carry):
            x, kp, vp = carry
            xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                fw.rms_att, i, keepdims=False), cfg.norm_eps)
            qkv = _proj_l(xb, fw.wqkv, i,
                         sc.wqkv if sc is not None else None)
            if fw.bqkv is not None:
                qkv = qkv + jax.lax.dynamic_index_in_dim(
                    fw.bqkv, i, keepdims=False)
            qkv = clip(qkv)
            q = qkv[:, :q_l]
            k = qkv[:, q_l:q_l + kv_l]
            v = qkv[:, q_l + kv_l:]
            q, k = _qk_norm(q, k, fw, i, cfg)
            mixed, kp, vp = attend_step_paged_l(
                q.reshape(B_l, Hk_l, qpk, D), k.reshape(B_l, Hk_l, D),
                v.reshape(B_l, Hk_l, D), kp, vp, tables, i,
                kv_pos, kv_len, kv_sink, positions, write_mask,
                _layer_win(cfg, i), _layer_alt(cfg, i),
                kv_sinks=KV_SINKS, theta=cfg.rope_param,
                rotary_dim=cfg.rotary_dim, window=L,
                softcap=cfg.attn_softcap)
            x = x + _post_norm(jax.lax.psum(
                _proj_l(mixed.reshape(B_l, q_l), fw.wo, i,
                       sc.wo if sc is not None else None), "tp"),
                fw.pa, i, cfg.norm_eps)
            d = ffn_l(x, fw.rms_ffn, fw.w13, fw.w2, i,
                      sc.w13 if sc is not None else None,
                      sc.w2 if sc is not None else None,
                      norm_eps=cfg.norm_eps, act=cfg.act_type,
                      add_residual=False) \
                if (not is_int4(fw.wqkv)
                    and _use_fused_ffn(cfg, tp, fw.wqkv.dtype.itemsize)) \
                else None
            if d is None:
                xb2 = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                    fw.rms_ffn, i, keepdims=False), cfg.norm_eps)
                h13 = _proj_l(xb2, fw.w13, i,
                             sc.w13 if sc is not None else None)
                h = act(h13[:, :h_l]) * h13[:, h_l:]
                d = _proj_l(h, fw.w2, i, sc.w2 if sc is not None else None)
            x = x + _post_norm(jax.lax.psum(d, "tp"), fw.pf, i, cfg.norm_eps)
            return (x, kp, vp)

        x, kp, vp = jax.lax.fori_loop(
            0, cfg.n_layers, layer_body, (x, pool.k, pool.v))
        x = rmsnorm(x, fw.final_norm, cfg.norm_eps)
        local = gemm(x, fw.lm_head, sc.lm_head if sc is not None else None)
        logits = jax.lax.all_gather(_cap_logits(cfg, local), "tp",
                                    axis=1, tiled=True)
        return logits, PagedKVPool(k=kp, v=vp)

    return shard_map(
        tick, mesh=mesh,
        in_specs=(w_specs, P("dp"), P("dp"), p_specs, P("dp"), P("dp")),
        out_specs=(P("dp", None), p_specs),
        check_vma=False,
    )


def make_prefill_paged_fast_tp(cfg: ModelConfig, mesh: Mesh, page_size: int,
                               with_scales: bool = False):
    """Chunked paged prefill of ONE lane over the mesh:
    (fw, tokens, pos0, valid_len, pool, table_b, page, row0, group,
    logits_mode) -> (logits|None, pool). `group` selects which dp shard's
    pool owns the lane; the other shards execute the same program with
    writes masked out (SPMD — every device runs every prefill)."""
    from ..models.paged import PagedKVPool

    tp = mesh.shape["tp"]
    dp = mesh.shape.get("dp", 1)
    assert mesh.shape.get("ep", 1) == 1 and not cfg.is_moe
    S = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    Hq_l, Hk_l = Hq // tp, Hk // tp
    q_l, kv_l, h_l = cfg.q_dim // tp, cfg.kv_dim // tp, cfg.hidden_dim // tp
    V_l = cfg.vocab_size // tp
    qpk = Hq // Hk
    act = silu if cfg.act_type == "silu" else gelu
    clip = _clipper(cfg)
    w_specs = fast_weight_pspecs(cfg, with_scales)
    p_specs = paged_pool_pspecs()

    def body(fw, tokens, pos0, valid_len, kp, vp, table_b, page, row0,
             group, logits_mode):
        T = tokens.shape[0]
        sc = fw.scales
        own = jax.lax.axis_index("dp") == group   # this shard owns the lane
        x = _embed_psum(fw.embed, tokens, V_l,
                        sc.embed if sc is not None else None)
        if cfg.embed_scale != 1.0:
            x = x * cfg.embed_scale
        positions = pos0 + jnp.arange(T)
        valid = jnp.arange(T) < valid_len
        att_mask = jnp.arange(S)[None, :] <= positions[:, None]
        mask_of = _sliding_mask_fn(cfg, positions, att_mask, S)

        def attend_chunk_bf16(q4, kc, vc, mask):
            scores = jnp.einsum("tgqd,lgd->gqtl", q4.astype(jnp.bfloat16),
                                kc.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32) / math.sqrt(D)
            scores = _softcap_scores(cfg, scores)
            att = jax.nn.softmax(
                jnp.where(mask[None, None], scores, -1e30), axis=-1)
            return jnp.einsum("gqtl,lgd->tgqd", att.astype(jnp.bfloat16),
                              vc.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)

        def layer_body(i, carry):
            x, kp, vp = carry
            xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                fw.rms_att, i, keepdims=False), cfg.norm_eps)
            qkv = _proj_l(xb, fw.wqkv, i,
                         sc.wqkv if sc is not None else None)
            if fw.bqkv is not None:
                qkv = qkv + jax.lax.dynamic_index_in_dim(
                    fw.bqkv, i, keepdims=False)
            qkv = clip(qkv)
            qf, kf = _qk_norm(qkv[:, :q_l], qkv[:, q_l:q_l + kv_l],
                              fw, i, cfg)
            q = apply_rope(qf.reshape(T, Hq_l, D), positions,
                           cfg.rope_param, cfg.rotary_dim,
                           _layer_alt(cfg, i))
            k = apply_rope(kf.reshape(T, Hk_l, D), positions,
                           cfg.rope_param, cfg.rotary_dim,
                           _layer_alt(cfg, i))
            v = qkv[:, q_l + kv_l:].reshape(T, Hk_l, D)

            old_k = jax.lax.dynamic_slice(kp, (page, i, row0, 0, 0),
                                          (1, 1, T, Hk_l, D))
            old_v = jax.lax.dynamic_slice(vp, (page, i, row0, 0, 0),
                                          (1, 1, T, Hk_l, D))
            wmask = (valid & own)[:, None, None]
            kp = jax.lax.dynamic_update_slice(
                kp, jnp.where(wmask, k.astype(kp.dtype),
                              old_k[0, 0])[None, None],
                (page, i, row0, 0, 0))
            vp = jax.lax.dynamic_update_slice(
                vp, jnp.where(wmask, v.astype(vp.dtype),
                              old_v[0, 0])[None, None],
                (page, i, row0, 0, 0))

            kc = kp[table_b, i].reshape(S, Hk_l, D)
            vc = vp[table_b, i].reshape(S, Hk_l, D)
            mixed = attend_chunk_bf16(q.reshape(T, Hk_l, qpk, D), kc, vc,
                                      mask_of(i))
            x = x + _post_norm(jax.lax.psum(
                _proj_l(mixed.reshape(T, q_l), fw.wo, i,
                       sc.wo if sc is not None else None), "tp"),
                fw.pa, i, cfg.norm_eps)
            xb2 = rmsnorm(x, jax.lax.dynamic_index_in_dim(
                fw.rms_ffn, i, keepdims=False), cfg.norm_eps)
            h13 = _proj_l(xb2, fw.w13, i,
                         sc.w13 if sc is not None else None)
            h = act(h13[:, :h_l]) * h13[:, h_l:]
            x = x + _post_norm(jax.lax.psum(
                _proj_l(h, fw.w2, i, sc.w2 if sc is not None else None),
                "tp"), fw.pf, i, cfg.norm_eps)
            return (x, kp, vp)

        x, kp, vp = jax.lax.fori_loop(
            0, cfg.n_layers, layer_body, (x, kp, vp))
        if logits_mode == "none":
            return jnp.zeros((1,), jnp.float32), kp, vp
        x_last = jnp.take(x, valid_len - 1, axis=0)
        x_last = rmsnorm(x_last, fw.final_norm, cfg.norm_eps)
        logits = jax.lax.all_gather(
            _cap_logits(cfg, gemv(x_last, fw.lm_head,
                                  sc.lm_head if sc is not None else None)),
            "tp").reshape(-1)
        return logits[None], kp, vp  # (1, V): dp shards stack to (dp, V)

    def wrap(mode):
        def f(fw, tokens, pos0, valid_len, pool_k, pool_v, table_b, page,
              row0, group):
            out, kp, vp = body(fw, tokens, pos0, valid_len, pool_k, pool_v,
                               table_b, page, row0, group, mode)
            from ..models.paged import PagedKVPool
            return out, PagedKVPool(k=kp, v=vp)
        return f

    fns = {
        mode: shard_map(
            wrap(mode), mesh=mesh,
            in_specs=(w_specs, P(), P(), P(), p_specs.k, p_specs.v,
                      P(), P(), P(), P()),
            out_specs=(P("dp") if mode == "none" else P("dp", None),
                       paged_pool_pspecs()),
            check_vma=False)
        for mode in ("none", "last")
    }

    def prefill(fw, tokens, pos0, valid_len, pool, table_b, page, row0,
                group, logits_mode="last"):
        out, pool = fns[logits_mode](fw, tokens, pos0, valid_len,
                                     pool.k, pool.v, table_b, page, row0,
                                     jnp.int32(group))
        if logits_mode == "none":
            return None, pool
        return out[group], pool

    return prefill
