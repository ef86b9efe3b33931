"""TPU fast decode path: Pallas kernels, fori_loop layers, in-place KV cache.

Semantically identical to the oracle `decode_step` (transformer.py) — same
ring buffer, sinks, clipping, GQA — but engineered so one decode step moves
exactly one copy of the weight bytes through HBM:

- Projections run through `gemv_l` (ops/pallas/gemv.py): tiles DMA straight
  from the stacked weights with the layer chosen by scalar prefetch, dequant
  fused. The naive XLA lowering (dynamic-slice + astype + dot under scan)
  measured 3-4x the traffic and OOM'd HBM at bf16 on a 7B model.
- Q,K,V ride ONE stacked [wq;wk;wv] GEMV and w1,w3 ride one [w1;w3] GEMV
  (the reference fuses the same pairs: fused_qkv_matmul_clip,
  fused_ffn_w1_w3_glu_act — src/infer.cu:290-336, 598-620).
- Attention is one flash kernel over the ring buffer (ops/pallas/attention.py)
  replacing the reference's attn_dot/attn_softmax/att_mix trio.
- The layer loop is `lax.fori_loop` (compiled once) and the cache is updated
  via dynamic_update_slice on the full stacked buffer — donated by the
  engine, so updates are in-place.

MoE routing stays data-dependent but HBM-exact: single-stream decode
streams only the routed experts' bytes via `gemv_le` (layer AND expert ride
the scalar-prefetch channel); the batched tick streams every expert once
per step (with B lanes routing independently that is the routed-traffic
optimum) and masks per-lane gates.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import KV_SINKS, ModelConfig
from ..ops.attention import attend_chunk
from ..ops.core import apply_rope, gelu, silu, rmsnorm
from ..ops.pallas.attention import (attend_step_batched_l, attend_step_l,
                                    attention_supported)
from ..ops.core import moe_gate
from ..ops.pallas.block import (attn_block4_l, attn_block4_supported,
                                attn_block_l, attn_block_supported)
from ..ops.pallas.ffn import ffn4_l, ffn4_supported, ffn_l
from ..ops.pallas.gemv import (gemm, gemm4_l, gemm4_le, gemm_l, gemm_le,
                               gemv, gemv4_l, gemv4_le, gemv_l, gemv_le,
                               gemv_supported, int4_supported)
from .cache import KVCache
from .weights import Weights


def shard_major(parts, tp: int, axis: int):
    """Concat `parts` along `axis` in SHARD-MAJOR order: the result's tp
    contiguous chunks each hold every part's shard —
    [a, b, ...] -> [a_0; b_0; a_1; b_1; ...]. tp=1 degenerates to a plain
    concat. Works on numpy or jnp arrays; the single canonical
    implementation for both the checkpoint loader and parallel/fast_tp
    (a divergence would silently mismatch the P(None,'tp',None) placement).
    """
    import numpy as np
    xp = np if isinstance(parts[0], np.ndarray) else jnp
    if tp == 1:
        return xp.concatenate(parts, axis=axis)
    split = []
    for p in parts:
        n = p.shape[axis]
        assert n % tp == 0, (p.shape, axis, tp)
        split.append(p.reshape(p.shape[:axis] + (tp, n // tp) + p.shape[axis + 1:]))
    cat = xp.concatenate(split, axis=axis + 1)
    return cat.reshape(cat.shape[:axis]
                       + (cat.shape[axis] * cat.shape[axis + 1],)
                       + cat.shape[axis + 2:])


class FastScales(NamedTuple):
    """Per-output-channel dequant scales for int8 checkpoints, laid out to
    mirror FastWeights' concatenated row order (y = (W_q @ x) * scale)."""

    embed: jax.Array       # (vocab,) f32
    wqkv: jax.Array        # (n_layers, q_dim + 2*kv_dim) f32
    wo: jax.Array          # (n_layers, dim) f32
    w13: jax.Array         # (n_layers, [n_experts,] 2*hidden_dim) f32
    w2: jax.Array          # (n_layers, [n_experts,] dim) f32
    lm_head: jax.Array     # (vocab,) f32
    moegate: Optional[jax.Array] = None  # (n_layers, n_experts) f32


class FastWeights(NamedTuple):
    """Decode-optimized weight layout (projection pairs pre-concatenated).

    For MoE models w13/w2 carry an expert axis and moegate holds the router
    (dense models: moegate is None and the expert axis is absent).
    int8 checkpoints carry `scales` (FastScales); the kernels widen the int8
    tiles to bf16 on the VPU and multiply the per-channel scale into the f32
    accumulator at flush — HBM traffic stays at 1 byte/weight with ~3x the
    effective mantissa of fp8-e5m2."""

    embed: jax.Array       # (vocab, dim)
    rms_att: jax.Array     # (n_layers, dim) f32
    rms_ffn: jax.Array     # (n_layers, dim) f32
    wqkv: jax.Array        # (n_layers, q_dim + 2*kv_dim, dim)
    wo: jax.Array          # (n_layers, dim, q_dim)
    w13: jax.Array         # (n_layers, [n_experts,] 2*hidden_dim, dim)
    w2: jax.Array          # (n_layers, [n_experts,] dim, hidden_dim)
    final_norm: jax.Array  # (dim,) f32
    lm_head: jax.Array     # (vocab, dim)
    moegate: Optional[jax.Array] = None  # (n_layers, n_experts, dim)
    bqkv: Optional[jax.Array] = None     # (n_layers, q_dim + 2*kv_dim) f32
    scales: Optional[FastScales] = None  # int8 checkpoints only
    # Qwen3-style per-head-dim RMSNorm weights for q/k (pre-RoPE)
    qnorm: Optional[jax.Array] = None    # (n_layers, head_dim) f32
    knorm: Optional[jax.Array] = None    # (n_layers, head_dim) f32
    # Gemma2-style sandwich norms on the attention/FFN delta
    pa: Optional[jax.Array] = None       # (n_layers, dim) f32
    pf: Optional[jax.Array] = None       # (n_layers, dim) f32

    @classmethod
    def from_weights(cls, w: Weights, cfg: ModelConfig) -> "FastWeights":
        lw = w.layers
        ffn_axis = 2 if cfg.is_moe else 1
        return cls(
            embed=w.embed,
            rms_att=lw.rms_att,
            rms_ffn=lw.rms_ffn,
            wqkv=jnp.concatenate([lw.wq, lw.wk, lw.wv], axis=1),
            wo=lw.wo,
            w13=jnp.concatenate([lw.w1, lw.w3], axis=ffn_axis),
            w2=lw.w2,
            final_norm=w.final_norm,
            lm_head=w.lm_head,
            moegate=lw.moegate,
            bqkv=(jnp.concatenate([lw.bq, lw.bk, lw.bv], axis=1)
                  if lw.bq is not None else None),
            qnorm=lw.qn,
            knorm=lw.kn,
            pa=lw.pa,
            pf=lw.pf,
        )


def load_fast_weights(yf, cfg: ModelConfig, device_put=jnp.asarray,
                      tp: int = 1) -> FastWeights:
    """Load a checkpoint straight into the decode layout.

    Concatenation happens on the host (numpy views into the mmap), so device
    HBM only ever holds ONE copy of the weights — FastWeights.from_weights
    on a loaded Weights would transiently double it.

    tp > 1 produces the SHARD-MAJOR row order (wqkv rows grouped
    [wq_s; wk_s; wv_s] per tensor-parallel shard, likewise w13/bqkv) that
    `parallel.fast_tp`'s P(None, 'tp', None) placement expects.
    """
    import numpy as np
    t = yf.tensors
    d, h, q, kd = cfg.dim, cfg.hidden_dim, cfg.q_dim, cfg.kv_dim

    def get(name, shape):
        arr = t[name]
        if tuple(arr.shape) != shape:
            raise ValueError(f"tensor {name}: expected {shape}, got {arr.shape}")
        # copy out of the mmap — jnp.asarray may alias it on CPU and the
        # mapping dies with the YalmFile (see weights.load_weights)
        return arr.copy()

    def stack(fmt, shape):
        return np.stack([get(fmt.format(l), shape) for l in range(cfg.n_layers)])

    def stack_cat(fmts_shapes, axis=0):
        return np.stack([
            shard_major([get(f.format(l), s) for f, s in fmts_shapes], tp, axis)
            for l in range(cfg.n_layers)])

    if "model.layers.0.attn.wq.weight.gscale" in t:
        # int4 checkpoint: layer weights are planar-packed nibbles with
        # per-group scales (ops/pallas/gemv.pack_int4); embed/lm_head stay
        # int8 per-channel. The fast path dispatches these to the
        # group-scale kernels (gemm4_l) — half the weight HBM of int8/fp8.
        # int4 x TP works (dense AND MoE): packing is per-row along K, so
        # the shard-major row interleave applies to packed rows and the
        # ([E,] G, N) group scales' N axis identically; the int8 router
        # replicates
        from ..ops.pallas.gemv import int4_group
        Gd, Gh = d // int4_group(d), h // int4_group(h)
        E = cfg.n_experts
        embed = device_put(get("model.embed.weight", (cfg.vocab_size, d)))
        lm = (device_put(get("model.output.weight", (cfg.vocab_size, d)))
              if "model.output.weight" in t else embed)
        semb = device_put(get("model.embed.weight.scale", (cfg.vocab_size,)))
        slm = (device_put(get("model.output.weight.scale", (cfg.vocab_size,)))
               if "model.output.weight.scale" in t else semb)
        bqkv = None
        if cfg.has_qkv_bias:
            bqkv = device_put(stack_cat(
                [("model.layers.{}.attn.wq.bias", (q,)),
                 ("model.layers.{}.attn.wk.bias", (kd,)),
                 ("model.layers.{}.attn.wv.bias", (kd,))]))
        return FastWeights(
            embed=embed,
            bqkv=bqkv,
            rms_att=device_put(stack("model.layers.{}.attn.norm.weight", (d,))),
            rms_ffn=device_put(stack("model.layers.{}.mlp.norm.weight", (d,))),
            wqkv=device_put(stack_cat(
                [("model.layers.{}.attn.wq.weight", (q, d // 2)),
                 ("model.layers.{}.attn.wk.weight", (kd, d // 2)),
                 ("model.layers.{}.attn.wv.weight", (kd, d // 2))])),
            wo=device_put(stack("model.layers.{}.attn.wo.weight", (d, q // 2))),
            w13=device_put(stack_cat(
                [("model.layers.{}.mlp.w1.weight",
                  (E, h, d // 2) if E else (h, d // 2)),
                 ("model.layers.{}.mlp.w3.weight",
                  (E, h, d // 2) if E else (h, d // 2))],
                axis=1 if E else 0)),
            w2=device_put(stack("model.layers.{}.mlp.w2.weight",
                                (E, d, h // 2) if E else (d, h // 2))),
            final_norm=device_put(get("model.norm.weight", (d,))),
            lm_head=lm,
            moegate=(device_put(stack("model.layers.{}.moegate.weight",
                                      (E, d))) if E else None),
            qnorm=(device_put(stack("model.layers.{}.attn.q_norm.weight",
                                    (cfg.head_dim,)))
                   if cfg.has_qk_norm else None),
            knorm=(device_put(stack("model.layers.{}.attn.k_norm.weight",
                                    (cfg.head_dim,)))
                   if cfg.has_qk_norm else None),
            pa=(device_put(stack("model.layers.{}.attn.post_norm.weight",
                                 (d,))) if cfg.has_post_norms else None),
            pf=(device_put(stack("model.layers.{}.mlp.post_norm.weight",
                                 (d,))) if cfg.has_post_norms else None),
            scales=FastScales(
                embed=semb,
                # group scales are (G, N): concat along the N axis mirrors
                # the packed weights' row concat
                wqkv=device_put(stack_cat(
                    [("model.layers.{}.attn.wq.weight.gscale", (Gd, q)),
                     ("model.layers.{}.attn.wk.weight.gscale", (Gd, kd)),
                     ("model.layers.{}.attn.wv.weight.gscale", (Gd, kd))],
                    axis=1)),
                wo=device_put(stack(
                    "model.layers.{}.attn.wo.weight.gscale",
                    (q // int4_group(q), d))),
                w13=device_put(stack_cat(
                    [("model.layers.{}.mlp.w1.weight.gscale",
                      (E, Gd, h) if E else (Gd, h)),
                     ("model.layers.{}.mlp.w3.weight.gscale",
                      (E, Gd, h) if E else (Gd, h))],
                    axis=2 if E else 1)),
                w2=device_put(stack(
                    "model.layers.{}.mlp.w2.weight.gscale",
                    (E, Gh, d) if E else (Gh, d))),
                lm_head=slm,
                moegate=(device_put(stack(
                    "model.layers.{}.moegate.weight.scale", (E,)))
                    if E else None),
            ),
        )

    embed = device_put(get("model.embed.weight", (cfg.vocab_size, d)))
    lm = (device_put(get("model.output.weight", (cfg.vocab_size, d)))
          if "model.output.weight" in t else embed)
    if cfg.is_moe:
        E = cfg.n_experts
        w13 = stack_cat([("model.layers.{}.mlp.w1.weight", (E, h, d)),
                         ("model.layers.{}.mlp.w3.weight", (E, h, d))], axis=1)
        w2 = stack("model.layers.{}.mlp.w2.weight", (E, d, h))
        moegate = device_put(stack("model.layers.{}.moegate.weight", (E, d)))
    else:
        w13 = stack_cat([("model.layers.{}.mlp.w1.weight", (h, d)),
                         ("model.layers.{}.mlp.w3.weight", (h, d))])
        w2 = stack("model.layers.{}.mlp.w2.weight", (d, h))
        moegate = None
    bqkv = None
    if cfg.has_qkv_bias:
        bqkv = device_put(stack_cat([("model.layers.{}.attn.wq.bias", (q,)),
                                     ("model.layers.{}.attn.wk.bias", (kd,)),
                                     ("model.layers.{}.attn.wv.bias", (kd,))]))

    scales = None
    if "model.embed.weight.scale" in t:   # int8 checkpoint (scales present)
        # dequant scales mirror the weight concatenation row-for-row
        # (including the tp shard-major interleave)
        if cfg.is_moe:
            E = cfg.n_experts
            s13 = stack_cat([("model.layers.{}.mlp.w1.weight.scale", (E, h)),
                             ("model.layers.{}.mlp.w3.weight.scale", (E, h))],
                            axis=1)
            s2 = stack("model.layers.{}.mlp.w2.weight.scale", (E, d))
            smoe = device_put(stack("model.layers.{}.moegate.weight.scale", (E,)))
        else:
            s13 = stack_cat([("model.layers.{}.mlp.w1.weight.scale", (h,)),
                             ("model.layers.{}.mlp.w3.weight.scale", (h,))])
            s2 = stack("model.layers.{}.mlp.w2.weight.scale", (d,))
            smoe = None
        semb = device_put(get("model.embed.weight.scale", (cfg.vocab_size,)))
        slm = (device_put(get("model.output.weight.scale", (cfg.vocab_size,)))
               if "model.output.weight.scale" in t else semb)
        scales = FastScales(
            embed=semb,
            wqkv=device_put(stack_cat(
                [("model.layers.{}.attn.wq.weight.scale", (q,)),
                 ("model.layers.{}.attn.wk.weight.scale", (kd,)),
                 ("model.layers.{}.attn.wv.weight.scale", (kd,))])),
            wo=device_put(stack("model.layers.{}.attn.wo.weight.scale", (d,))),
            w13=device_put(s13),
            w2=device_put(s2),
            lm_head=slm,
            moegate=smoe,
        )

    return FastWeights(
        embed=embed,
        bqkv=bqkv,
        rms_att=device_put(stack("model.layers.{}.attn.norm.weight", (d,))),
        rms_ffn=device_put(stack("model.layers.{}.mlp.norm.weight", (d,))),
        wqkv=device_put(stack_cat([("model.layers.{}.attn.wq.weight", (q, d)),
                                   ("model.layers.{}.attn.wk.weight", (kd, d)),
                                   ("model.layers.{}.attn.wv.weight", (kd, d))])),
        wo=device_put(stack("model.layers.{}.attn.wo.weight", (d, q))),
        w13=device_put(w13),
        w2=device_put(w2),
        final_norm=device_put(get("model.norm.weight", (d,))),
        lm_head=lm,
        moegate=moegate,
        scales=scales,
        qnorm=(device_put(stack("model.layers.{}.attn.q_norm.weight",
                                (cfg.head_dim,)))
               if cfg.has_qk_norm else None),
        knorm=(device_put(stack("model.layers.{}.attn.k_norm.weight",
                                (cfg.head_dim,)))
               if cfg.has_qk_norm else None),
        pa=(device_put(stack("model.layers.{}.attn.post_norm.weight", (d,)))
            if cfg.has_post_norms else None),
        pf=(device_put(stack("model.layers.{}.mlp.post_norm.weight", (d,)))
            if cfg.has_post_norms else None),
    )


def is_int4(w: jax.Array) -> bool:
    """Packed int4 weights ride uint8 arrays with HALVED trailing dim; the
    matching FastScales fields hold per-GROUP scales (L, G, N) instead of
    per-channel (L, N) — see ops/pallas/gemv.pack_int4."""
    return w.dtype == jnp.uint8


def _proj_l(x2d, w_all, layer, scale):
    """Layer-indexed projection dispatch: packed-int4 weights take the
    group-scale kernel, everything else the standard fused-dequant GEMM."""
    if is_int4(w_all):
        return gemm4_l(x2d, w_all, layer, scale)
    return gemm_l(x2d, w_all, layer, scale)


def _proj1_l(x1d, w_all, layer, scale):
    if is_int4(w_all):
        return gemv4_l(x1d, w_all, layer, scale)
    return gemv_l(x1d, w_all, layer, scale=scale)


def _proj_le(x2d, w_all, layer, expert, scale):
    """Routed-expert projection dispatch (MoE int4 / standard)."""
    if is_int4(w_all):
        return gemm4_le(x2d, w_all, layer, expert, scale)
    return gemm_le(x2d, w_all, layer, expert, scale)


def _proj1_le(x1d, w_all, layer, expert, scale):
    if is_int4(w_all):
        return gemv4_le(x1d, w_all, layer, expert, scale)
    return gemv_le(x1d, w_all, layer, expert, scale)


def _layer_win(cfg: ModelConfig, i):
    """Per-layer sliding-window bound for the fused attention kernels
    (Gemma2/3): a traced () int32 — cfg.sliding_window on sliding layers,
    the full window on global ones — or None when no layer slides (the
    kernels then compile the mask-free program)."""
    if not any(cfg.layer_sliding):
        return None
    flags = jnp.asarray(cfg.layer_sliding, jnp.int32)
    return jnp.where(flags[i] != 0, cfg.sliding_window, cfg.max_seq_len)


def _layer_alt(cfg: ModelConfig, i):
    """Gemma3 dual-rope selector: the sliding flag doubles as the local-
    theta flag (HF Gemma3: sliding layers use rope_local_base_freq). None
    unless the packed rope kind is "gemma3" (ops/core.rope_pair_freqs)."""
    if not (cfg.rope_scale and cfg.rope_scale[0] == "gemma3") \
            or not any(cfg.layer_sliding):
        # no sliding layers -> no layer ever uses the local theta
        return None
    return jnp.asarray(cfg.layer_sliding, jnp.int32)[i]


def _sliding_mask_fn(cfg: ModelConfig, positions, att_mask, S: int):
    """Per-layer attention-mask selector for the jnp chunk paths: returns
    mask_of(i) -> the layer's mask — att_mask on global layers, att_mask
    further bounded by the sliding window on sliding layers. positions may
    be (T,) or (B, T); att_mask broadcasts accordingly."""
    if not any(cfg.layer_sliding):
        return lambda i: att_mask
    sl_flags = jnp.asarray(cfg.layer_sliding, jnp.int32)
    slide = att_mask & (positions[..., None] - jnp.arange(S)
                        < cfg.sliding_window)
    return lambda i: jnp.where(sl_flags[i] != 0, slide, att_mask)


def _post_norm(delta, w_all, i, eps):
    """Gemma2 sandwich norm on a residual delta (w_all None -> identity)."""
    if w_all is None:
        return delta
    return rmsnorm(delta, jax.lax.dynamic_index_in_dim(w_all, i,
                                                       keepdims=False), eps)


def _cap_logits(cfg: ModelConfig, logits):
    if cfg.final_softcap:
        return cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    return logits


def _softcap_scores(cfg: ModelConfig, scores):
    """Gemma2 attention score cap (applied after the 1/sqrt(D) scale,
    before masking); cfg.attn_softcap == 0 -> identity."""
    if cfg.attn_softcap:
        return cfg.attn_softcap * jnp.tanh(scores / cfg.attn_softcap)
    return scores


def _use_ffn4(cfg: ModelConfig) -> bool:
    return ffn4_supported(cfg.dim, cfg.hidden_dim, cfg.dim)


def _ffn_rows_ok(cfg: ModelConfig, rows: int, itemsize: int) -> bool:
    """Whether the fused FFN kernel's scoped VMEM fits `rows` activation
    rows: h13 (rows, 2H) f32 + x/res/out (rows, dim) f32 + two
    double-buffered weight-tile pairs must stay under the 16 MB scope
    (a 56-row tree-verify chunk at 7B measured 16.68 MB and was rejected
    by Mosaic; 40-row chain chunks fit at 14.85 MB)."""
    from ..ops.pallas.gemv import pick_blocks
    H2, K, Hh = 2 * cfg.hidden_dim, cfg.dim, cfg.hidden_dim
    bn1, _ = pick_blocks(H2, K, itemsize)
    bn2, _ = pick_blocks(cfg.dim, Hh, itemsize)
    est = (rows * H2 * 4 + 3 * rows * K * 4
           + 2 * bn1 * K * itemsize + 2 * bn2 * Hh * itemsize)
    return est <= 15 << 20


def _ffn2_l(x2d, fw, layer, sc, cfg):
    """Dense FFN dispatch for the chunk/batched paths: the fused ffn_l /
    ffn4_l kernel normally; explicit norm + two projections when sandwich
    norms break the residual fusion (Gemma2/3) or the row count overflows
    the fused kernel's VMEM scope (wide verify trees / big batches)."""
    rows = x2d.shape[0] if x2d.ndim > 1 else 1
    if not _ffn_rows_ok(cfg, rows, fw.w13.dtype.itemsize):
        act = silu if cfg.act_type == "silu" else gelu
        xb2 = rmsnorm(x2d, jax.lax.dynamic_index_in_dim(
            fw.rms_ffn, layer, keepdims=False), cfg.norm_eps)
        h13 = _proj_l(xb2, fw.w13, layer, sc.w13 if sc else None)
        h = act(h13[:, : cfg.hidden_dim]) * h13[:, cfg.hidden_dim:]
        delta = _proj_l(h, fw.w2, layer, sc.w2 if sc else None)
        return x2d + _post_norm(delta, fw.pf, layer, cfg.norm_eps)
    if fw.pf is not None or (is_int4(fw.w13) and not _use_ffn4(cfg)):
        act = silu if cfg.act_type == "silu" else gelu
        xb2 = rmsnorm(x2d, jax.lax.dynamic_index_in_dim(
            fw.rms_ffn, layer, keepdims=False), cfg.norm_eps)
        h13 = _proj_l(xb2, fw.w13, layer, sc.w13 if sc else None)
        h = act(h13[:, : cfg.hidden_dim]) * h13[:, cfg.hidden_dim:]
        delta = _proj_l(h, fw.w2, layer, sc.w2 if sc else None)
        return x2d + _post_norm(delta, fw.pf, layer, cfg.norm_eps)
    if is_int4(fw.w13):
        return ffn4_l(x2d, fw.rms_ffn, fw.w13, fw.w2, layer,
                      sc.w13, sc.w2, norm_eps=cfg.norm_eps, act=cfg.act_type)
    return ffn_l(x2d, fw.rms_ffn, fw.w13, fw.w2, layer,
                 sc.w13 if sc else None, sc.w2 if sc else None,
                 norm_eps=cfg.norm_eps, act=cfg.act_type)


def _moe_ffn_batched(x2d, fw, layer, sc, cfg):
    """Batched MoE FFN on a (rows, dim) activation block: router -> top-k,
    then stream EVERY expert's bytes once and mask per-row gates. With many
    rows routing independently essentially every expert is active for
    someone, so one all-expert sweep IS the routed-traffic optimum (the
    single-stream path keeps the routed-only gemv_le/gemm4_le). Shared by
    the batched tick, the PAGED tick, the spec verify sweeps, and paged
    prefill (paged x MoE / spec x MoE, round-5 closures)."""
    act = silu if cfg.act_type == "silu" else gelu
    xb2 = rmsnorm(x2d, jax.lax.dynamic_index_in_dim(fw.rms_ffn, layer,
                                                    keepdims=False),
                  cfg.norm_eps)
    router = gemm_l(xb2, fw.moegate, layer, sc.moegate if sc else None)
    gates, idx = jax.vmap(moe_gate, in_axes=(0, None))(
        router, cfg.n_experts_active)                  # (rows, k) each
    delta = jnp.zeros_like(x2d)
    for e in range(cfg.n_experts):
        gate_e = jnp.sum(jnp.where(idx == e, gates, 0.0), axis=-1)
        h13 = _proj_le(xb2, fw.w13, layer, e, sc.w13 if sc else None)
        h = act(h13[:, : cfg.hidden_dim]) * h13[:, cfg.hidden_dim:]
        delta = delta + gate_e[:, None] * _proj_le(
            h, fw.w2, layer, e, sc.w2 if sc else None)
    return x2d + delta


def _qk_norm(q, k, fw, layer, cfg):
    """Qwen3-style per-head RMSNorm on FLAT q/k (..., q_dim)/(..., kv_dim)
    between the projection and the rope-applying attention kernel; no-op
    when the model has no qk-norm weights."""
    if fw.qnorm is None:
        return q, k
    qn = jax.lax.dynamic_index_in_dim(fw.qnorm, layer, keepdims=False)
    kn = jax.lax.dynamic_index_in_dim(fw.knorm, layer, keepdims=False)
    D = cfg.head_dim
    q = rmsnorm(q.reshape(*q.shape[:-1], q.shape[-1] // D, D), qn,
                cfg.norm_eps).reshape(q.shape).astype(q.dtype)
    k = rmsnorm(k.reshape(*k.shape[:-1], k.shape[-1] // D, D), kn,
                cfg.norm_eps).reshape(k.shape).astype(k.dtype)
    return q, k


def quant_kv_supported(cfg: ModelConfig) -> bool:
    """Whether the fp8 (1-byte) KV cache works on REAL TPU kernels: packed
    sub-byte tiling is (4, 128) over the cache's (Hk, D) minor dims, and
    Mosaic rejects any DMA slice whose Hk extent is not a multiple of 4 —
    including the full extent. Mistral/Llama (Hk=8) and Qwen2-7B (Hk=4)
    qualify; the jnp emulation and interpreter accept any Hk."""
    return cfg.n_kv_heads % 4 == 0


def fast_supported(cfg: ModelConfig) -> bool:
    """Whether this model's shapes fit the Pallas kernels' tiling rules."""
    pairs = [
        (cfg.q_dim + 2 * cfg.kv_dim, cfg.dim),
        (cfg.dim, cfg.q_dim),
        (2 * cfg.hidden_dim, cfg.dim),
        (cfg.dim, cfg.hidden_dim),
        (cfg.vocab_size, cfg.dim),
    ]
    if cfg.is_moe:
        pairs.append((cfg.n_experts, cfg.dim))
    if cfg.weight_dtype == "int4":
        # layer projections take the packed group-scale kernels (K % 256);
        # MoE expert FFNs pack per expert (moegate stays int8 per-channel)
        if not all(int4_supported(n, k) for n, k in pairs[:4]):
            return False
    return all(gemv_supported(n, k) for n, k in pairs) and attention_supported(cfg)


def fast_batched_supported(cfg: ModelConfig) -> bool:
    """Batched tick support (dense and MoE)."""
    return fast_supported(cfg)


@partial(jax.jit, static_argnames=("cfg", "output_logits", "capture"))
def decode_step_fast(
    cfg: ModelConfig,
    fw: FastWeights,
    token: jax.Array,   # () int32
    pos: jax.Array,     # () int32
    cache: KVCache,
    *,
    output_logits: bool = True,
    capture: bool = False,
) -> tuple[Optional[jax.Array], KVCache]:
    """One decode step; numerics match decode_step(compute_dtype=bf16).

    capture=True mirrors the oracle's DEBUG_MODEL-style activation capture
    (transformer.decode_step, reference src/model.h:329-348) ON THE FAST
    PATH: returns (logits, cache, cap) where cap maps the same keys
    (att_in/q/k/v/att_mix/ffn_in/block_out/final_norm/logits) to per-layer
    stacks pulled from the REAL Pallas kernel boundaries — so
    utils.debug.diff_captures can localize an oracle-vs-kernel divergence
    layer by layer at full model scale. Capture uses the unfused kernel
    sequence (separate gemv_l / attend_step_l calls) so the boundaries
    exist; it is a debugging mode, not the hot path.
    """
    L = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    qpk = Hq // Hk
    act = silu if cfg.act_type == "silu" else gelu
    sc = fw.scales

    x = fw.embed[token].astype(jnp.float32)
    if cfg.embed_scale != 1.0:
        x = x * cfg.embed_scale
    if sc is not None:
        x = x * sc.embed[token]

    kv_sink = jnp.where(pos >= L, KV_SINKS, 0)
    kv_pos = kv_sink + (pos - kv_sink) % (L - kv_sink)
    kv_len = jnp.minimum(pos + 1, L)

    def clip(a):
        if math.isinf(cfg.qkv_clip):
            return a
        return jnp.clip(a, -cfg.qkv_clip, cfg.qkv_clip)

    if capture:
        if is_int4(fw.wqkv):
            raise ValueError(
                "capture mode does not support packed int4 weights (the "
                "unfused capture sequence dispatches per-channel kernels); "
                "debug kernel boundaries with int8/fp8 checkpoints")
        cap_layers: list[dict] = []
        k_all, v_all = cache.k, cache.v
        for i in range(cfg.n_layers):
            rec: dict = {}
            xb = rmsnorm(x, fw.rms_att[i], cfg.norm_eps)
            rec["att_in"] = xb
            qkv = gemv_l(xb, fw.wqkv, jnp.int32(i),
                         scale=sc.wqkv if sc else None)
            if fw.bqkv is not None:
                qkv = qkv + fw.bqkv[i]
            qkv = clip(qkv)
            q = qkv[: cfg.q_dim]
            k = qkv[cfg.q_dim: cfg.q_dim + cfg.kv_dim]
            v = qkv[cfg.q_dim + cfg.kv_dim:]
            q, k = _qk_norm(q, k, fw, i, cfg)
            # kernels rope internally; capture post-rope like the oracle
            rec["q"] = apply_rope(q.reshape(Hq, D), pos,
                                  cfg.rope_param, cfg.rotary_dim,
                                  _layer_alt(cfg, i))
            rec["k"] = apply_rope(k.reshape(Hk, D), pos,
                                  cfg.rope_param, cfg.rotary_dim,
                                  _layer_alt(cfg, i))
            rec["v"] = v.reshape(Hk, D)
            mixed, k_all, v_all = attend_step_l(
                q.reshape(Hk, qpk, D), k.reshape(Hk, D), v.reshape(Hk, D),
                k_all, v_all, jnp.int32(i), kv_pos, kv_len, kv_sink, pos,
                _layer_win(cfg, i), _layer_alt(cfg, i),
                kv_sinks=KV_SINKS, theta=cfg.rope_param,
                rotary_dim=cfg.rotary_dim, softcap=cfg.attn_softcap)
            rec["att_mix"] = mixed.reshape(cfg.q_dim)
            if fw.pa is None:
                x = gemv_l(rec["att_mix"], fw.wo, jnp.int32(i), residual=x,
                           scale=sc.wo if sc else None)
            else:
                x = x + _post_norm(
                    gemv_l(rec["att_mix"], fw.wo, jnp.int32(i),
                           scale=sc.wo if sc else None),
                    fw.pa, jnp.int32(i), cfg.norm_eps)
            xb2 = rmsnorm(x, fw.rms_ffn[i], cfg.norm_eps)
            rec["ffn_in"] = xb2
            if cfg.is_moe:
                router = gemv_l(xb2, fw.moegate, jnp.int32(i),
                                scale=sc.moegate if sc else None)
                gates, idx = moe_gate(router, cfg.n_experts_active)
                for j in range(cfg.n_experts_active):
                    h13 = _proj1_le(xb2, fw.w13, jnp.int32(i), idx[j],
                                    sc.w13 if sc else None)
                    h = act(h13[: cfg.hidden_dim]) * h13[cfg.hidden_dim:]
                    x = x + gates[j] * _proj1_le(h, fw.w2, jnp.int32(i),
                                                 idx[j],
                                                 sc.w2 if sc else None)
            else:
                h13 = gemv_l(xb2, fw.w13, jnp.int32(i),
                             scale=sc.w13 if sc else None)
                h = act(h13[: cfg.hidden_dim]) * h13[cfg.hidden_dim:]
                x = x + _post_norm(
                    gemv_l(h, fw.w2, jnp.int32(i),
                           scale=sc.w2 if sc else None),
                    fw.pf, jnp.int32(i), cfg.norm_eps)
            rec["block_out"] = x
            cap_layers.append(rec)
        cap = {k_: jnp.stack([r[k_] for r in cap_layers])
               for k_ in cap_layers[0]}
        new_cache = KVCache(k=k_all, v=v_all)
        if not output_logits:
            return None, new_cache, cap
        xn = rmsnorm(x, fw.final_norm, cfg.norm_eps)
        logits = _cap_logits(cfg, gemv(xn, fw.lm_head,
                                       sc.lm_head if sc else None))
        cap["final_norm"] = xn
        cap["logits"] = logits
        return logits, new_cache, cap

    # the fused-rmsnorm variant needs full-K weight blocks (pick_blocks gives
    # them for every realistic dim; fall back to the separate op otherwise)
    from ..ops.pallas.gemv import pick_blocks
    int4 = is_int4(fw.wqkv)
    fuse_norm = not int4 and pick_blocks(fw.wqkv.shape[1], cfg.dim,
                                         fw.wqkv.dtype.itemsize)[1] == cfg.dim
    # the fully-fused attention block (norm + wqkv + attention + wo +
    # residual in ONE kernel) brings a dense layer to 2 launches — the
    # packed-int4 variant (attn_block4_l) keeps the same fusion level at
    # HALF the weight bytes (round 4 shipped int4 unfused and paid ~2.9 ms
    # of its 7.59 ms/token in non-streaming overhead — 65% of SoL).
    block_ok = (fw.qnorm is None and fw.pa is None
                and not cfg.attn_softcap and not any(cfg.layer_sliding))
    use_block = (fuse_norm and block_ok
                 and attn_block_supported(cfg, fw.wqkv.dtype.itemsize))
    use_block4 = int4 and block_ok and attn_block4_supported(cfg)
    ffn4_ok = int4 and _use_ffn4(cfg)

    def layer_body(i, carry):
        x, k_all, v_all = carry

        # -- attention ------------------------------------------------------
        if use_block:
            x, k_all, v_all = attn_block_l(
                x, fw.rms_att, fw.wqkv, fw.wo, k_all, v_all, i,
                kv_pos, kv_len, kv_sink, pos,
                n_heads=Hq, kv_sinks=KV_SINKS, theta=cfg.rope_param,
                rotary_dim=cfg.rotary_dim, norm_eps=cfg.norm_eps,
                qkv_clip=cfg.qkv_clip, bqkv_all=fw.bqkv,
                scale_qkv=sc.wqkv if sc else None,
                scale_o=sc.wo if sc else None)
        elif use_block4:
            x, k_all, v_all = attn_block4_l(
                x, fw.rms_att, fw.wqkv, fw.wo, k_all, v_all, i,
                kv_pos, kv_len, kv_sink, pos,
                scale_qkv=sc.wqkv, scale_o=sc.wo,
                n_heads=Hq, kv_sinks=KV_SINKS, theta=cfg.rope_param,
                rotary_dim=cfg.rotary_dim, norm_eps=cfg.norm_eps,
                qkv_clip=cfg.qkv_clip, bqkv_all=fw.bqkv)
        else:
            # rmsnorm fused into the projection kernel (saves the XLA op and
            # an activation round-trip); residual add fused into wo likewise
            if fuse_norm:
                qkv = gemv_l(x, fw.wqkv, i, norm_w=fw.rms_att,
                             norm_eps=cfg.norm_eps,
                             scale=sc.wqkv if sc else None)
            else:
                xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(fw.rms_att, i, keepdims=False),
                             cfg.norm_eps)
                qkv = _proj1_l(xb, fw.wqkv, i, sc.wqkv if sc else None)
            if fw.bqkv is not None:
                qkv = qkv + jax.lax.dynamic_index_in_dim(fw.bqkv, i, keepdims=False)
            qkv = clip(qkv)
            q = qkv[: cfg.q_dim]
            k = qkv[cfg.q_dim: cfg.q_dim + cfg.kv_dim]
            v = qkv[cfg.q_dim + cfg.kv_dim:]
            q, k = _qk_norm(q, k, fw, i, cfg)

            # One fused kernel: RoPE on q/k at `pos`, k/v write into ring
            # slot kv_pos, sink-key re-rotation (StreamingLLM, reference
            # src/infer.cpp:303-317), and flash attention — with the cache
            # aliased in place (XLA never holds the buffer, so no relayouts
            # or update copies).
            mixed, k_all, v_all = attend_step_l(
                q.reshape(Hk, qpk, D), k.reshape(Hk, D), v.reshape(Hk, D),
                k_all, v_all, i, kv_pos, kv_len, kv_sink, pos,
                _layer_win(cfg, i), _layer_alt(cfg, i),
                kv_sinks=KV_SINKS, theta=cfg.rope_param,
                rotary_dim=cfg.rotary_dim, softcap=cfg.attn_softcap)
            if int4 or fw.pa is not None:
                x = x + _post_norm(
                    _proj1_l(mixed.reshape(cfg.q_dim), fw.wo, i,
                             sc.wo if sc else None),
                    fw.pa, i, cfg.norm_eps)
            else:
                x = gemv_l(mixed.reshape(cfg.q_dim), fw.wo, i, residual=x,
                           scale=sc.wo if sc else None)

        # -- FFN --------------------------------------------------------------
        if (fuse_norm or ffn4_ok) and not cfg.is_moe and fw.pf is None:
            # whole FFN (norm + w13 stream + GLU + w2 stream + residual) in
            # one kernel: no pipeline drain between the two weight sweeps
            if ffn4_ok:
                x = ffn4_l(x, fw.rms_ffn, fw.w13, fw.w2, i, sc.w13, sc.w2,
                           norm_eps=cfg.norm_eps, act=cfg.act_type)
            else:
                x = ffn_l(x, fw.rms_ffn, fw.w13, fw.w2, i,
                          sc.w13 if sc else None, sc.w2 if sc else None,
                          norm_eps=cfg.norm_eps, act=cfg.act_type)
            return (x, k_all, v_all)
        xb2 = rmsnorm(x, jax.lax.dynamic_index_in_dim(fw.rms_ffn, i, keepdims=False),
                      cfg.norm_eps)
        if cfg.is_moe:
            # router -> top-k -> per-active-expert fused GEMVs; only the
            # routed experts' bytes leave HBM (reference src/infer.cpp:347-384)
            router = gemv_l(xb2, fw.moegate, i,
                            scale=sc.moegate if sc else None)
            gates, idx = moe_gate(router, cfg.n_experts_active)
            for j in range(cfg.n_experts_active):
                h13 = _proj1_le(xb2, fw.w13, i, idx[j],
                                sc.w13 if sc else None)
                h = act(h13[: cfg.hidden_dim]) * h13[cfg.hidden_dim:]
                x = x + gates[j] * _proj1_le(h, fw.w2, i, idx[j],
                                             sc.w2 if sc else None)
        else:
            h13 = _proj1_l(xb2, fw.w13, i, sc.w13 if sc else None)
            h = act(h13[: cfg.hidden_dim]) * h13[cfg.hidden_dim:]
            x = x + _post_norm(_proj1_l(h, fw.w2, i, sc.w2 if sc else None),
                               fw.pf, i, cfg.norm_eps)
        return (x, k_all, v_all)

    x, k_new, v_new = jax.lax.fori_loop(
        0, cfg.n_layers, layer_body, (x, cache.k, cache.v))
    new_cache = KVCache(k=k_new, v=v_new)

    if not output_logits:
        return None, new_cache
    x = rmsnorm(x, fw.final_norm, cfg.norm_eps)
    logits = _cap_logits(cfg, gemv(x, fw.lm_head, sc.lm_head if sc else None))
    return logits, new_cache


# ---------------------------------------------------------------------------
# Batched decode step (continuous-batching tick)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def decode_step_fast_batched(
    cfg: ModelConfig,
    fw: FastWeights,
    tokens: jax.Array,     # (B,) int32
    positions: jax.Array,  # (B,) int32 — per-lane absolute positions
    cache: KVCache,        # batched: (B, n_layers, S, Hk, D)
    write_mask: Optional[jax.Array] = None,  # (B,) int32; 0 = read-only lane
) -> tuple[jax.Array, KVCache]:
    """One decode tick for B independent sequences sharing the weights.

    Weight tiles stream through HBM once per tick and multiply the whole
    (B, k) activation block — aggregate throughput scales ~B× at the same
    roofline as batch 1 (the scheduler's reason to exist; the reference has
    no batching at all, src/main.cpp:102-112). B must be a sublane multiple
    (8); the scheduler pads its slot count. Returns (logits (B, vocab), cache).
    """
    B = tokens.shape[0]
    L = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    qpk = Hq // Hk
    act = silu if cfg.act_type == "silu" else gelu
    sc = fw.scales

    x = fw.embed[tokens].astype(jnp.float32)           # (B, dim)
    if cfg.embed_scale != 1.0:
        x = x * cfg.embed_scale
    if sc is not None:
        x = x * sc.embed[tokens][:, None]

    kv_sink = jnp.where(positions >= L, KV_SINKS, 0)   # (B,)
    kv_pos = kv_sink + (positions - kv_sink) % (L - kv_sink)
    kv_len = jnp.minimum(positions + 1, L)

    def clip(a):
        if math.isinf(cfg.qkv_clip):
            return a
        return jnp.clip(a, -cfg.qkv_clip, cfg.qkv_clip)

    def layer_body(i, carry):
        x, k_all, v_all = carry
        xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(fw.rms_att, i, keepdims=False),
                     cfg.norm_eps)
        qkv = _proj_l(xb, fw.wqkv, i, sc.wqkv if sc else None)  # (B, q+2kv)
        if fw.bqkv is not None:
            qkv = qkv + jax.lax.dynamic_index_in_dim(fw.bqkv, i, keepdims=False)
        qkv = clip(qkv)
        q = qkv[:, : cfg.q_dim]
        k = qkv[:, cfg.q_dim: cfg.q_dim + cfg.kv_dim]
        v = qkv[:, cfg.q_dim + cfg.kv_dim:]
        q, k = _qk_norm(q, k, fw, i, cfg)

        mixed, k_all, v_all = attend_step_batched_l(
            q.reshape(B, Hk, qpk, D), k.reshape(B, Hk, D), v.reshape(B, Hk, D),
            k_all, v_all, i, kv_pos, kv_len, kv_sink, positions, write_mask,
            _layer_win(cfg, i), _layer_alt(cfg, i),
            kv_sinks=KV_SINKS, theta=cfg.rope_param,
            rotary_dim=cfg.rotary_dim, softcap=cfg.attn_softcap)
        x = x + _post_norm(_proj_l(mixed.reshape(B, cfg.q_dim), fw.wo, i,
                                   sc.wo if sc else None),
                           fw.pa, i, cfg.norm_eps)

        if cfg.is_moe:
            x = _moe_ffn_batched(x, fw, i, sc, cfg)
        else:
            # one fused kernel for the whole batched FFN (norm + w13 + GLU
            # + w2 + residual), weight stream shared by all lanes; sandwich
            # norms fall back to the unfused sequence inside _ffn2_l
            x = _ffn2_l(x, fw, i, sc, cfg)
        return (x, k_all, v_all)

    x, k_new, v_new = jax.lax.fori_loop(
        0, cfg.n_layers, layer_body, (x, cache.k, cache.v))
    x = rmsnorm(x, fw.final_norm, cfg.norm_eps)
    logits = _cap_logits(cfg, gemm(x, fw.lm_head, sc.lm_head if sc else None))
    return logits, KVCache(k=k_new, v=v_new)


# ---------------------------------------------------------------------------
# Chunked prefill on the fast layout
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "logits_mode", "attend_len"))
def prefill_fast(
    cfg: ModelConfig,
    fw: FastWeights,
    tokens: jax.Array,     # (T,) int32, padded chunk
    pos0: jax.Array,       # () int32
    valid_len: jax.Array,  # () int32
    cache: KVCache,
    *,
    logits_mode: str = "last",
    attend_len: int = 0,
) -> tuple[Optional[jax.Array], KVCache]:
    """Chunked prefill over FastWeights (bf16 compute; same semantics and
    preconditions as the oracle `prefill`, models/transformer.py).

    Dense models run the same layer-indexed Pallas GEMMs as decode (one
    weight-byte stream per chunk, amortized over T tokens — lax.scan's
    per-layer weight slices plus XLA's fp8 dequant materialization measured
    ~3x the traffic); attention stays a batched XLA einsum, which is
    MXU-shaped at chunk width. MoE prefill keeps the scan/gather path.

    attend_len (STATIC, 0 = full window): attention score width. Early
    chunks of a long prompt only have pos0+T rows of live history, so the
    caller passes a bucketed bound >= pos0+T (engine/scheduler use the next
    power of two) and the (T, window) score tensor shrinks to (T,
    attend_len) — the reference hydrates token-at-a-time and has no
    equivalent cost (src/main.cpp:91-97).
    """
    T = tokens.shape[0]
    L = cfg.max_seq_len
    S = attend_len or L
    assert S % 8 == 0 and S <= L, (attend_len, L)
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    qpk = Hq // Hk
    act = silu if cfg.act_type == "silu" else gelu
    cd = jnp.bfloat16
    sc = fw.scales

    positions = pos0 + jnp.arange(T)
    valid = jnp.arange(T) < valid_len
    att_mask = jnp.arange(S)[None, :] <= positions[:, None]
    # sliding layers: no ring during prefill, slot index IS the position
    mask_of = _sliding_mask_fn(cfg, positions, att_mask, S)

    def proj(x, w):
        return jax.lax.dot_general(
            x.astype(cd), w.astype(cd),
            (((x.ndim - 1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    def clip(a):
        if math.isinf(cfg.qkv_clip):
            return a
        return jnp.clip(a, -cfg.qkv_clip, cfg.qkv_clip)

    x = fw.embed[tokens].astype(jnp.float32)  # (T, dim)
    if cfg.embed_scale != 1.0:
        x = x * cfg.embed_scale
    if sc is not None:
        x = x * sc.embed[tokens][:, None]

    def attend_chunk_bf16(q4, kc, vc, mask):
        """Chunk attention with bf16 dots + f32 softmax — the decode kernels'
        numerics. The oracle's f32 formulation costs ~2.3x the chunk time at
        7B (f32 MXU rate + materialized f32 score tensors)."""
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
        xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(fw.rms_att, i, keepdims=False),
                     cfg.norm_eps)
        qkv = _proj_l(xb, fw.wqkv, i, sc.wqkv if sc else None)  # (T, q+2kv)
        if fw.bqkv is not None:
            qkv = qkv + jax.lax.dynamic_index_in_dim(fw.bqkv, i, keepdims=False)
        qkv = clip(qkv)
        qf, kf = _qk_norm(qkv[:, : cfg.q_dim],
                          qkv[:, cfg.q_dim: cfg.q_dim + cfg.kv_dim],
                          fw, i, cfg)
        q = apply_rope(qf.reshape(T, Hq, D), positions,
                       cfg.rope_param, cfg.rotary_dim, _layer_alt(cfg, i))
        k = apply_rope(kf.reshape(T, Hk, D), positions,
                       cfg.rope_param, cfg.rotary_dim, _layer_alt(cfg, i))
        v = qkv[:, cfg.q_dim + cfg.kv_dim:].reshape(T, Hk, D)

        old_k = jax.lax.dynamic_slice(k_all, (i, pos0, 0, 0), (1, T, Hk, D))
        old_v = jax.lax.dynamic_slice(v_all, (i, pos0, 0, 0), (1, T, Hk, D))
        vmask = valid[:, None, None]
        k_all = jax.lax.dynamic_update_slice(
            k_all, jnp.where(vmask, k.astype(k_all.dtype), old_k[0])[None],
            (i, pos0, 0, 0))
        v_all = jax.lax.dynamic_update_slice(
            v_all, jnp.where(vmask, v.astype(v_all.dtype), old_v[0])[None],
            (i, pos0, 0, 0))

        # static prefix-bounded slice: only the first S slots can hold
        # visible history for this chunk (attend_len contract)
        kc = jax.lax.dynamic_slice(k_all, (i, 0, 0, 0), (1, S, Hk, D))[0]
        vc = jax.lax.dynamic_slice(v_all, (i, 0, 0, 0), (1, S, Hk, D))[0]
        mixed = attend_chunk_bf16(q.reshape(T, Hk, qpk, D), kc, vc,
                                  mask_of(i))
        x = x + _post_norm(
            _proj_l(mixed.reshape(T, cfg.q_dim), fw.wo, i,
                    sc.wo if sc else None), fw.pa, i, cfg.norm_eps)

        if cfg.is_moe:
            # MoE prefill through the SAME layer-indexed kernels + masked
            # all-expert sweep as every other chunk path (round-5: the old
            # lax.scan/gather formulation's bf16 rounding differed from
            # the paged/verify chunks, breaking dense == paged streams;
            # the masked sweep also streams each expert's bytes once per
            # CHUNK instead of gathering per token)
            x = _moe_ffn_batched(x, fw, i, sc, cfg)
        else:
            xb2 = rmsnorm(x, jax.lax.dynamic_index_in_dim(fw.rms_ffn, i, keepdims=False),
                          cfg.norm_eps)
            h13 = _proj_l(xb2, fw.w13, i, sc.w13 if sc else None)
            h = act(h13[:, : cfg.hidden_dim]) * h13[:, cfg.hidden_dim:]
            x = x + _post_norm(_proj_l(h, fw.w2, i, sc.w2 if sc else None),
                               fw.pf, i, cfg.norm_eps)
        return (x, k_all, v_all)

    x, k_new, v_new = jax.lax.fori_loop(
        0, cfg.n_layers, layer_body, (x, cache.k, cache.v))
    new_cache = KVCache(k=k_new, v=v_new)

    if logits_mode == "none":
        return None, new_cache
    if logits_mode == "last":
        x_last = jnp.take(x, valid_len - 1, axis=0)
        x_last = rmsnorm(x_last, fw.final_norm, cfg.norm_eps)
        return _cap_logits(cfg, gemv(x_last, fw.lm_head,
                                     sc.lm_head if sc else None)), new_cache
    if logits_mode in ("all", "all_h"):
        xn = rmsnorm(x, fw.final_norm, cfg.norm_eps)
        out = proj(xn, fw.lm_head)
        if sc is not None:
            out = out * sc.lm_head[None].astype(jnp.float32)
        out = _cap_logits(cfg, out)
        if logits_mode == "all_h":
            # ... plus the post-final-norm hidden rows (Medusa heads read
            # the hidden state that produced each position's logits)
            return (out, xn), new_cache
        return out, new_cache
    raise ValueError(f"bad logits_mode {logits_mode!r}")


# ---------------------------------------------------------------------------
# Batched verify chunk (scheduler-level speculative decoding)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "with_hidden"))
def verify_chunk_fast_batched(
    cfg: ModelConfig,
    fw: FastWeights,
    tokens: jax.Array,     # (B, T) int32 — per-lane [cur, d0..d_{T-2}]
    pos0: jax.Array,       # (B,) int32 — per-lane chunk start positions
    enable: jax.Array,     # (B,) int32 — 0 lanes compute garbage, write nothing
    cache: KVCache,        # (B, L, S, Hk, D)
    *,
    with_hidden: bool = False,
) -> tuple[jax.Array, KVCache]:
    """ONE target weight-sweep scores T tokens for EVERY lane — the batched
    half of scheduler-level speculative decoding. Returns logits (B, T,
    vocab): row (b, i) answers "what follows tokens[b, :i+1]".

    The projections flatten (B, T) into one (B*T, dim) activation block, so
    the weight stream is shared by all lanes AND all chunk positions (the
    reference streams weights once per TOKEN, src/main.cpp:102-112).
    Attention is per-lane causal over cache history + the chunk itself.
    PRECONDITION: enabled lanes have pos0 + T <= window (no ring wrap
    inside a chunk — the scheduler's speculation edge rule).

    with_hidden=True returns ((logits, hidden (B, T, dim)), cache): the
    post-final-norm rows Medusa heads read (scheduler spec_medusa)."""
    return _chunk_forward_fast_batched(
        cfg, fw, tokens, pos0, None, enable, cache,
        logits_mode="all_h" if with_hidden else "all")


def tree_depths(parents: tuple[int, ...]) -> tuple[int, ...]:
    """Node depths for a static candidate tree (parents[0] == -1, nodes in
    topological order: parents[i] < i)."""
    d = []
    for i, p in enumerate(parents):
        d.append(0 if p < 0 else d[p] + 1)
    return tuple(d)


def cartesian_tree(branching: tuple[int, ...]) -> tuple[int, ...]:
    """Parent array of the full cartesian candidate tree for per-depth
    branching factors, e.g. (4, 2) -> root + 4 children + 8 grandchildren
    (13 nodes). Node order: BFS (all depth-d nodes precede depth-d+1)."""
    parents = [-1]
    prev = [0]
    for k in branching:
        nxt = []
        for p in prev:
            for _ in range(k):
                parents.append(p)
                nxt.append(len(parents) - 1)
        prev = nxt
    return tuple(parents)


@partial(jax.jit, static_argnames=("cfg", "parents", "with_hidden"))
def verify_tree_fast_batched(
    cfg: ModelConfig,
    fw: FastWeights,
    tokens: jax.Array,     # (B, Tn) int32 — node tokens, row 0 = root
    pos0: jax.Array,       # (B,) int32 — the root's absolute position
    enable: jax.Array,     # (B,) int32 — 0 lanes compute garbage
    cache: KVCache,        # (B, L, S, Hk, D) — READ-ONLY here
    *,
    parents: tuple[int, ...],
    with_hidden: bool = False,
):
    """TREE-attention speculative verify (Medusa-style multi-candidate
    chains, SpecInfer/Cai et al. arXiv:2401.10774 §tree attention): ONE
    target weight-sweep scores a whole candidate TREE per lane — node i
    attends the lane's cache history plus its own ancestor chain (a static
    (Tn, Tn) mask), at position pos0 + depth(i). Row i's logits answer
    "what follows the root..ancestor..i chain".

    Unlike the linear verify, candidate rows are NOT written to the cache
    (siblings would collide on the same ring slot): the sweep attends the
    chunk KV in-VMEM (cast to the cache dtype first, so accepted rows see
    exactly what a cache round-trip would produce) and RETURNS it as
    (B, n_layers, Tn, Hk, D) tree-KV tensors; the caller scatters the
    accepted path's rows with `scatter_tree_rows` after the host walk.

    Returns ((logits (B, Tn, V) [, hidden]), (ktree, vtree)).
    PRECONDITION: enabled lanes have pos0 + max_depth + 1 <= window.
    """
    B, Tn = tokens.shape
    assert Tn == len(parents)
    S = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    qpk = Hq // Hk
    sc = fw.scales
    depths = tree_depths(parents)

    # static ancestor matrix: anc[i, j] == True iff j == i or j is an
    # ancestor of i (nodes attend their own chain only)
    anc = np.zeros((Tn, Tn), bool)
    for i, p in enumerate(parents):
        anc[i, i] = True
        while p >= 0:
            anc[i, p] = True
            p = parents[p]
    anc = jnp.asarray(anc)
    depth_arr = jnp.asarray(depths, jnp.int32)

    p0 = jnp.where(enable != 0, pos0, 0)
    positions = p0[:, None] + depth_arr[None, :]                # (B, Tn)
    # history mask: strictly the slots BEFORE the root (the chunk itself is
    # attended through the in-chunk ancestor mask)
    hist_mask = jnp.arange(S)[None, None, :] < p0[:, None, None]
    if any(cfg.layer_sliding):
        slide = hist_mask & (positions[..., None] - jnp.arange(S)
                             < cfg.sliding_window)
        sl_flags = jnp.asarray(cfg.layer_sliding, jnp.int32)

        def hist_of(i):
            return jnp.where(sl_flags[i] != 0, slide, hist_mask)
    else:
        def hist_of(i):
            return hist_mask

    x = fw.embed[tokens].astype(jnp.float32)                    # (B, Tn, dim)
    if cfg.embed_scale != 1.0:
        x = x * cfg.embed_scale
    if sc is not None:
        x = x * sc.embed[tokens][..., None]
    x = x.reshape(B * Tn, cfg.dim)

    def clip(a):
        if math.isinf(cfg.qkv_clip):
            return a
        return jnp.clip(a, -cfg.qkv_clip, cfg.qkv_clip)

    def attend(q4, kc, vc, kt, vt, hmask):
        # history scores over the (read-only) cache ...
        sh = jnp.einsum("btgqd,bsgd->bgqts", q4.astype(jnp.bfloat16),
                        kc.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) / math.sqrt(D)
        # ... plus in-chunk scores over the candidate tree's own KV
        st = jnp.einsum("btgqd,bngd->bgqtn", q4.astype(jnp.bfloat16),
                        kt.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) / math.sqrt(D)
        sh = _softcap_scores(cfg, sh)
        st = _softcap_scores(cfg, st)
        sh = jnp.where(hmask[:, None, None], sh, -1e30)
        st = jnp.where(anc[None, None, None], st, -1e30)
        scores = jnp.concatenate([sh, st], axis=-1)             # (B,g,q,Tn,S+Tn)
        att = jax.nn.softmax(scores, axis=-1)
        ah, at = att[..., :S], att[..., S:]
        mix = jnp.einsum("bgqts,bsgd->btgqd", ah.astype(jnp.bfloat16),
                         vc.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        mix += jnp.einsum("bgqtn,bngd->btgqd", at.astype(jnp.bfloat16),
                          vt.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        return mix

    ktree0 = jnp.zeros((B, cfg.n_layers, Tn, Hk, D), cache.k.dtype)
    vtree0 = jnp.zeros((B, cfg.n_layers, Tn, Hk, D), cache.v.dtype)

    def layer_body(i, carry):
        x, ktree, vtree = carry
        xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(fw.rms_att, i,
                                                     keepdims=False),
                     cfg.norm_eps)
        qkv = _proj_l(xb, fw.wqkv, i, sc.wqkv if sc else None)
        if fw.bqkv is not None:
            qkv = qkv + jax.lax.dynamic_index_in_dim(fw.bqkv, i,
                                                     keepdims=False)
        qkv = clip(qkv).reshape(B, Tn, -1)
        alt_i = _layer_alt(cfg, i)
        rope_b = jax.vmap(lambda a, p: apply_rope(a, p, cfg.rope_param,
                                                  cfg.rotary_dim, alt_i))
        qf, kf = _qk_norm(qkv[..., : cfg.q_dim],
                          qkv[..., cfg.q_dim: cfg.q_dim + cfg.kv_dim],
                          fw, i, cfg)
        q = rope_b(qf.reshape(B, Tn, Hq, D), positions)
        k = rope_b(kf.reshape(B, Tn, Hk, D), positions)
        v = qkv[..., cfg.q_dim + cfg.kv_dim:].reshape(B, Tn, Hk, D)
        # cast through the cache dtype BEFORE attending: accepted rows must
        # see exactly what a cache round-trip produces (fp8 KV parity)
        kq = k.astype(cache.k.dtype)
        vq = v.astype(cache.v.dtype)
        ktree = jax.lax.dynamic_update_slice(
            ktree, kq[:, None], (0, i, 0, 0, 0))
        vtree = jax.lax.dynamic_update_slice(
            vtree, vq[:, None], (0, i, 0, 0, 0))

        kc_i = jax.lax.dynamic_index_in_dim(cache.k, i, axis=1,
                                            keepdims=False)     # (B, S, Hk, D)
        vc_i = jax.lax.dynamic_index_in_dim(cache.v, i, axis=1,
                                            keepdims=False)
        mixed = attend(q.reshape(B, Tn, Hk, qpk, D), kc_i, vc_i, kq, vq,
                       hist_of(i))
        x = x + _post_norm(
            _proj_l(mixed.reshape(B * Tn, cfg.q_dim), fw.wo, i,
                    sc.wo if sc else None), fw.pa, i, cfg.norm_eps)
        if cfg.is_moe:
            x = _moe_ffn_batched(x, fw, i, sc, cfg)
        else:
            x = _ffn2_l(x, fw, i, sc, cfg)
        return (x, ktree, vtree)

    x, ktree, vtree = jax.lax.fori_loop(
        0, cfg.n_layers, layer_body, (x, ktree0, vtree0))
    xn = rmsnorm(x, fw.final_norm, cfg.norm_eps)
    logits = _cap_logits(cfg, gemm(xn, fw.lm_head,
                                   sc.lm_head if sc else None))
    logits = logits.reshape(B, Tn, -1)
    if with_hidden:
        return (logits, xn.reshape(B, Tn, -1)), (ktree, vtree)
    return logits, (ktree, vtree)


@partial(jax.jit, static_argnames=("n_rows",))
def scatter_tree_rows(cache: KVCache, ktree, vtree, pos0, rows, n,
                      *, n_rows: int) -> KVCache:
    """Write the ACCEPTED tree path's KV rows into the ring cache: for
    d < n[b], cache[b, :, pos0[b] + d] = tree[b, :, rows[b, d]]. rows is
    (B, n_rows) node indices (the walked path, root first); n (B,) is the
    per-lane accepted length (0 disables the lane)."""
    B = rows.shape[0]

    def lane(ck, cv, kt, vt, s0, r, nn):
        def put(d, carry):
            ck, cv = carry
            node = r[d]
            en = d < nn
            oldk = jax.lax.dynamic_slice(
                ck, (0, s0 + d, 0, 0), (ck.shape[0], 1) + ck.shape[2:])
            oldv = jax.lax.dynamic_slice(
                cv, (0, s0 + d, 0, 0), (cv.shape[0], 1) + cv.shape[2:])
            newk = jnp.where(en, kt[:, node][:, None], oldk)
            newv = jnp.where(en, vt[:, node][:, None], oldv)
            ck = jax.lax.dynamic_update_slice(ck, newk, (0, s0 + d, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, newv, (0, s0 + d, 0, 0))
            return ck, cv

        return jax.lax.fori_loop(0, n_rows, put, (ck, cv))

    k_new, v_new = jax.vmap(lane)(cache.k, cache.v, ktree, vtree,
                                  pos0, rows, n)
    return KVCache(k=k_new, v=v_new)


@partial(jax.jit, static_argnames=("cfg", "attend_len", "logits_mode"))
def prefill_chunk_fast_batched(
    cfg: ModelConfig,
    fw: FastWeights,
    tokens: jax.Array,     # (B, T) int32 padded chunks
    pos0: jax.Array,       # (B,) int32 per-lane chunk start
    valid_len: jax.Array,  # (B,) int32 real rows per lane (rest padding)
    enable: jax.Array,     # (B,) int32
    cache: KVCache,
    *,
    attend_len: int = 0,
    logits_mode: str = "lastv",
) -> tuple[Optional[jax.Array], KVCache]:
    """BATCHED chunked admission: every admitting lane's next prompt chunk
    hydrates in ONE weight sweep (previously one sweep per lane per tick
    — with A concurrent admissions this cuts time-to-first-token ~A x at
    the same roofline). logits_mode "lastv" returns each lane's logits at
    its LAST VALID row, (B, vocab) — what a finishing admission samples
    from. attend_len (static, 0 = full window) bounds the attention score
    width like prefill_fast's prefix-bounded bucket."""
    return _chunk_forward_fast_batched(cfg, fw, tokens, pos0, valid_len,
                                       enable, cache, attend_len=attend_len,
                                       logits_mode=logits_mode)


def _chunk_forward_fast_batched(cfg, fw, tokens, pos0, valid_len, enable,
                                cache, attend_len: int = 0,
                                logits_mode: str = "all"):
    B, T = tokens.shape
    L = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    qpk = Hq // Hk
    act = silu if cfg.act_type == "silu" else gelu
    sc = fw.scales

    S_att = attend_len or L
    assert S_att % 8 == 0 and S_att <= L, (attend_len, L)
    # disabled lanes must not clamp their dus start past the window
    p0 = jnp.where(enable != 0, pos0, 0)
    positions = p0[:, None] + jnp.arange(T)[None, :]            # (B, T)
    att_mask = jnp.arange(S_att)[None, None, :] <= positions[:, :, None]
    mask_of = _sliding_mask_fn(cfg, positions, att_mask, S_att)

    x = fw.embed[tokens].astype(jnp.float32)                    # (B, T, dim)
    if cfg.embed_scale != 1.0:
        x = x * cfg.embed_scale
    if sc is not None:
        x = x * sc.embed[tokens][..., None]
    x = x.reshape(B * T, cfg.dim)

    def attend(q4, kc, vc, mask):
        # (B, T, Hk, qpk, D) x (B, S, Hk, D) -> (B, T, Hk, qpk, D)
        scores = jnp.einsum("btgqd,bsgd->bgqts", q4.astype(jnp.bfloat16),
                            kc.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) / math.sqrt(D)
        scores = _softcap_scores(cfg, scores)
        att = jax.nn.softmax(
            jnp.where(mask[:, None, None], scores, -1e30), axis=-1)
        return jnp.einsum("bgqts,bsgd->btgqd", att.astype(jnp.bfloat16),
                          vc.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def clip(a):
        if math.isinf(cfg.qkv_clip):
            return a
        return jnp.clip(a, -cfg.qkv_clip, cfg.qkv_clip)

    def layer_body(i, carry):
        x, k_all, v_all = carry
        xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(fw.rms_att, i,
                                                     keepdims=False),
                     cfg.norm_eps)
        qkv = _proj_l(xb, fw.wqkv, i, sc.wqkv if sc else None)   # (B*T, ...)
        if fw.bqkv is not None:
            qkv = qkv + jax.lax.dynamic_index_in_dim(fw.bqkv, i,
                                                     keepdims=False)
        qkv = clip(qkv).reshape(B, T, -1)
        alt_i = _layer_alt(cfg, i)
        rope_b = jax.vmap(lambda a, p: apply_rope(a, p, cfg.rope_param,
                                                  cfg.rotary_dim, alt_i))
        qf, kf = _qk_norm(qkv[..., : cfg.q_dim],
                          qkv[..., cfg.q_dim: cfg.q_dim + cfg.kv_dim],
                          fw, i, cfg)
        q = rope_b(qf.reshape(B, T, Hq, D), positions)
        k = rope_b(kf.reshape(B, T, Hk, D), positions)
        v = qkv[..., cfg.q_dim + cfg.kv_dim:].reshape(B, T, Hk, D)

        # per-lane masked region writes (XLA dus under vmap; enable=0 lanes
        # and padded rows rewrite their old values — a no-op)
        def dus_lane(cl, rows, s0, en):
            old = jax.lax.dynamic_slice(cl, (s0, 0, 0), (T, Hk, D))
            new = jnp.where(en, rows.astype(cl.dtype), old)
            return jax.lax.dynamic_update_slice(cl, new, (s0, 0, 0))

        en = (enable != 0)[:, None, None, None]                 # (B,1,1,1)
        if valid_len is not None:
            en = en & (jnp.arange(T)[None, :] < valid_len[:, None]
                       )[:, :, None, None]
        kc_i = jax.lax.dynamic_index_in_dim(k_all, i, axis=1,
                                            keepdims=False)     # (B, S, Hk, D)
        vc_i = jax.lax.dynamic_index_in_dim(v_all, i, axis=1,
                                            keepdims=False)
        kc_i = jax.vmap(dus_lane)(kc_i, k, p0, en)
        vc_i = jax.vmap(dus_lane)(vc_i, v, p0, en)
        k_all = jax.lax.dynamic_update_slice(
            k_all, kc_i[:, None].astype(k_all.dtype), (0, i, 0, 0, 0))
        v_all = jax.lax.dynamic_update_slice(
            v_all, vc_i[:, None].astype(v_all.dtype), (0, i, 0, 0, 0))

        mixed = attend(q.reshape(B, T, Hk, qpk, D), kc_i[:, :S_att],
                       vc_i[:, :S_att], mask_of(i))
        x = x + _post_norm(
            _proj_l(mixed.reshape(B * T, cfg.q_dim), fw.wo, i,
                    sc.wo if sc else None), fw.pa, i, cfg.norm_eps)
        if cfg.is_moe:
            # spec x MoE (round-5): the (B*T)-row chunk routes per token
            # through the same all-expert batched sweep
            x = _moe_ffn_batched(x, fw, i, sc, cfg)
        else:
            x = _ffn2_l(x, fw, i, sc, cfg)
        return (x, k_all, v_all)

    x, k_new, v_new = jax.lax.fori_loop(
        0, cfg.n_layers, layer_body, (x, cache.k, cache.v))
    new_cache = KVCache(k=k_new, v=v_new)
    if logits_mode == "none":
        return None, new_cache
    if logits_mode == "lastv":
        # one row per lane: its LAST VALID chunk position
        xg = x.reshape(B, T, cfg.dim)
        idx = (jnp.maximum(valid_len, 1) - 1 if valid_len is not None
               else jnp.full((B,), T - 1, jnp.int32))
        x_last = jnp.take_along_axis(
            xg, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        xn = rmsnorm(x_last, fw.final_norm, cfg.norm_eps)
        return _cap_logits(cfg, gemm(xn, fw.lm_head,
                                     sc.lm_head if sc else None)), new_cache
    xn = rmsnorm(x, fw.final_norm, cfg.norm_eps)
    logits = _cap_logits(cfg, gemm(xn, fw.lm_head,
                                   sc.lm_head if sc else None))
    if logits_mode == "all_h":
        # plus the post-final-norm hidden rows (Medusa heads read the
        # hidden state that produced each position's logits)
        return (logits.reshape(B, T, -1), xn.reshape(B, T, -1)), new_cache
    return logits.reshape(B, T, -1), new_cache


# ---------------------------------------------------------------------------
# Paged continuous-batching tick + paged prefill (vLLM-style block tables)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "page_size"))
def decode_step_fast_batched_paged(
    cfg: ModelConfig,
    fw: FastWeights,
    tokens: jax.Array,       # (B,) int32
    positions: jax.Array,    # (B,) int32
    pool: "PagedKVPool",     # models/paged.py — (P, L, page_size, Hk, D) x2
    tables: jax.Array,       # (B, window // page_size) int32 page ids
    write_mask: Optional[jax.Array] = None,
    *,
    page_size: int = 256,
) -> tuple[jax.Array, "PagedKVPool"]:
    """decode_step_fast_batched over a PAGED cache: per-lane logical slots
    resolve through `tables` into the shared page pool, so cache HBM scales
    with tokens in flight instead of lanes x window (models/paged.py)."""
    from .paged import PagedKVPool
    from ..ops.pallas.attention import attend_step_paged_l

    B = tokens.shape[0]
    L = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    qpk = Hq // Hk
    act = silu if cfg.act_type == "silu" else gelu
    sc = fw.scales

    x = fw.embed[tokens].astype(jnp.float32)
    if cfg.embed_scale != 1.0:
        x = x * cfg.embed_scale
    if sc is not None:
        x = x * sc.embed[tokens][:, None]

    kv_sink = jnp.where(positions >= L, KV_SINKS, 0)
    kv_pos = kv_sink + (positions - kv_sink) % (L - kv_sink)
    kv_len = jnp.minimum(positions + 1, L)

    def clip(a):
        if math.isinf(cfg.qkv_clip):
            return a
        return jnp.clip(a, -cfg.qkv_clip, cfg.qkv_clip)

    def layer_body(i, carry):
        x, kp, vp = carry
        xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(fw.rms_att, i, keepdims=False),
                     cfg.norm_eps)
        qkv = _proj_l(xb, fw.wqkv, i, sc.wqkv if sc else None)
        if fw.bqkv is not None:
            qkv = qkv + jax.lax.dynamic_index_in_dim(fw.bqkv, i, keepdims=False)
        qkv = clip(qkv)
        q = qkv[:, : cfg.q_dim]
        k = qkv[:, cfg.q_dim: cfg.q_dim + cfg.kv_dim]
        v = qkv[:, cfg.q_dim + cfg.kv_dim:]
        q, k = _qk_norm(q, k, fw, i, cfg)

        mixed, kp, vp = attend_step_paged_l(
            q.reshape(B, Hk, qpk, D), k.reshape(B, Hk, D), v.reshape(B, Hk, D),
            kp, vp, tables, i, kv_pos, kv_len, kv_sink, positions, write_mask,
            _layer_win(cfg, i), _layer_alt(cfg, i),
            kv_sinks=KV_SINKS, theta=cfg.rope_param,
            rotary_dim=cfg.rotary_dim, window=L, softcap=cfg.attn_softcap)
        x = x + _post_norm(_proj_l(mixed.reshape(B, cfg.q_dim), fw.wo, i,
                                   sc.wo if sc else None),
                           fw.pa, i, cfg.norm_eps)
        if cfg.is_moe:
            # paged x MoE (round-5): page tables are per-lane KV structures,
            # expert routing is orthogonal — the batched all-expert sweep
            x = _moe_ffn_batched(x, fw, i, sc, cfg)
        else:
            x = _ffn2_l(x, fw, i, sc, cfg)
        return (x, kp, vp)

    x, kp, vp = jax.lax.fori_loop(
        0, cfg.n_layers, layer_body, (x, pool.k, pool.v))
    x = rmsnorm(x, fw.final_norm, cfg.norm_eps)
    logits = _cap_logits(cfg, gemm(x, fw.lm_head, sc.lm_head if sc else None))
    return logits, PagedKVPool(k=kp, v=vp)


@partial(jax.jit, static_argnames=("cfg", "logits_mode", "page_size"))
def prefill_fast_paged(
    cfg: ModelConfig,
    fw: FastWeights,
    tokens: jax.Array,     # (T,) int32 padded chunk — single page
    pos0: jax.Array,       # () int32
    valid_len: jax.Array,  # () int32
    pool: "PagedKVPool",
    table_b: jax.Array,    # (window // page_size,) this lane's page ids
    page: jax.Array,       # () int32 — page holding [pos0, pos0+T)
    row0: jax.Array,       # () int32 — pos0 % page_size
    *,
    logits_mode: str = "last",
    page_size: int = 256,
) -> tuple[Optional[jax.Array], "PagedKVPool"]:
    """Chunked prefill of ONE lane through the page tables. The admission
    loop caps every chunk at a page boundary, so each chunk's KV rows land
    in exactly one (page, layer) range — a single dynamic_update_slice.
    Attention gathers the lane's mapped pages per layer (garbage in
    unmapped tail pages is masked by causal visibility)."""
    from .paged import PagedKVPool

    T = tokens.shape[0]
    S = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    qpk = Hq // Hk
    act = silu if cfg.act_type == "silu" else gelu
    sc = fw.scales

    positions = pos0 + jnp.arange(T)
    valid = jnp.arange(T) < valid_len
    att_mask = jnp.arange(S)[None, :] <= positions[:, None]
    mask_of = _sliding_mask_fn(cfg, positions, att_mask, S)

    def clip(a):
        if math.isinf(cfg.qkv_clip):
            return a
        return jnp.clip(a, -cfg.qkv_clip, cfg.qkv_clip)

    x = fw.embed[tokens].astype(jnp.float32)
    if cfg.embed_scale != 1.0:
        x = x * cfg.embed_scale
    if sc is not None:
        x = x * sc.embed[tokens][:, None]

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
        xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(fw.rms_att, i, keepdims=False),
                     cfg.norm_eps)
        qkv = _proj_l(xb, fw.wqkv, i, sc.wqkv if sc else None)
        if fw.bqkv is not None:
            qkv = qkv + jax.lax.dynamic_index_in_dim(fw.bqkv, i, keepdims=False)
        qkv = clip(qkv)
        qf, kf = _qk_norm(qkv[:, : cfg.q_dim],
                          qkv[:, cfg.q_dim: cfg.q_dim + cfg.kv_dim],
                          fw, i, cfg)
        q = apply_rope(qf.reshape(T, Hq, D), positions,
                       cfg.rope_param, cfg.rotary_dim, _layer_alt(cfg, i))
        k = apply_rope(kf.reshape(T, Hk, D), positions,
                       cfg.rope_param, cfg.rotary_dim, _layer_alt(cfg, i))
        v = qkv[:, cfg.q_dim + cfg.kv_dim:].reshape(T, Hk, D)

        old_k = jax.lax.dynamic_slice(kp, (page, i, row0, 0, 0),
                                      (1, 1, T, Hk, D))
        old_v = jax.lax.dynamic_slice(vp, (page, i, row0, 0, 0),
                                      (1, 1, T, Hk, D))
        vmask = valid[:, None, None]
        kp = jax.lax.dynamic_update_slice(
            kp, jnp.where(vmask, k.astype(kp.dtype), old_k[0, 0])[None, None],
            (page, i, row0, 0, 0))
        vp = jax.lax.dynamic_update_slice(
            vp, jnp.where(vmask, v.astype(vp.dtype), old_v[0, 0])[None, None],
            (page, i, row0, 0, 0))

        # lane view for this layer: gather mapped pages -> (S, Hk, D)
        kc = kp[table_b, i].reshape(S, Hk, D)
        vc = vp[table_b, i].reshape(S, Hk, D)
        mixed = attend_chunk_bf16(q.reshape(T, Hk, qpk, D), kc, vc,
                                  mask_of(i))
        x = x + _post_norm(
            _proj_l(mixed.reshape(T, cfg.q_dim), fw.wo, i,
                    sc.wo if sc else None), fw.pa, i, cfg.norm_eps)
        if cfg.is_moe:
            # paged x MoE prefill: per-token routing over the chunk rows
            x = _moe_ffn_batched(x, fw, i, sc, cfg)
        else:
            x = _ffn2_l(x, fw, i, sc, cfg)
        return (x, kp, vp)

    x, kp, vp = jax.lax.fori_loop(
        0, cfg.n_layers, layer_body, (x, pool.k, pool.v))
    new_pool = PagedKVPool(k=kp, v=vp)

    if logits_mode == "none":
        return None, new_pool
    if logits_mode == "last":
        x_last = jnp.take(x, valid_len - 1, axis=0)
        x_last = rmsnorm(x_last, fw.final_norm, cfg.norm_eps)
        return _cap_logits(cfg, gemv(x_last, fw.lm_head,
                                     sc.lm_head if sc else None)), new_pool
    raise ValueError(f"paged prefill: bad logits_mode {logits_mode!r}")


@partial(jax.jit, static_argnames=("cfg", "page_size", "with_hidden"))
def verify_chunk_fast_batched_paged(
    cfg: ModelConfig,
    fw: FastWeights,
    tokens: jax.Array,     # (B, T) int32 — per-lane [cur, d0..d_{T-2}]
    pos0: jax.Array,       # (B,) int32 — per-lane chunk start positions
    enable: jax.Array,     # (B,) int32 — 0 lanes compute garbage, write nothing
    pool: "PagedKVPool",
    tables: jax.Array,     # (B, window // page_size) int32 page ids
    *,
    page_size: int = 256,
    with_hidden: bool = False,
) -> tuple[jax.Array, "PagedKVPool"]:
    """verify_chunk_fast_batched over a PAGED cache: speculative decoding
    COMPOSED with vLLM-style paged occupancy. Chunk KV rows scatter through
    the per-lane page tables (a chunk may straddle a page boundary, so the
    write is a row scatter, not a dus); disabled lanes scatter into the
    reserved sink page 0 (the same convention as masked paged ticks).
    Attention gathers each lane's mapped pages into its (window, Hk, D)
    view — garbage beyond a lane's history is masked causally.
    PRECONDITIONS: enabled lanes have pos0 + T <= window (scheduler edge
    rule) AND pages mapped through pos0 + T (scheduler._ensure_pages)."""
    return _chunk_forward_fast_batched_paged(
        cfg, fw, tokens, pos0, None, enable, pool, tables,
        page_size=page_size,
        logits_mode="all_h" if with_hidden else "all")


@partial(jax.jit, static_argnames=("cfg", "page_size", "logits_mode"))
def prefill_chunk_fast_batched_paged(
    cfg: ModelConfig,
    fw: FastWeights,
    tokens: jax.Array,     # (B, T) int32 padded chunks
    pos0: jax.Array,       # (B,) int32 per-lane chunk start
    valid_len: jax.Array,  # (B,) int32 real rows per lane (rest padding)
    enable: jax.Array,     # (B,) int32
    pool: "PagedKVPool",
    tables: jax.Array,     # (B, window // page_size) int32 page ids
    *,
    page_size: int = 256,
    logits_mode: str = "lastv",
) -> tuple[Optional[jax.Array], "PagedKVPool"]:
    """BATCHED chunked admission over the PAGED pool: every admitting
    lane's next prompt chunk hydrates in ONE weight sweep, its rows
    scattering through the lane's page table (so a chunk may straddle
    page boundaries — the per-slot paged path had to clamp each chunk
    inside one page). Same ~A x TTFT win as the dense
    prefill_chunk_fast_batched. Padding rows (>= valid_len) and disabled
    lanes scatter into the reserved sink page 0.
    PRECONDITIONS: enabled lanes have pos0 + valid_len <= window and pages
    mapped through pos0 + valid_len (scheduler._ensure_pages)."""
    return _chunk_forward_fast_batched_paged(
        cfg, fw, tokens, pos0, valid_len, enable, pool, tables,
        page_size=page_size, logits_mode=logits_mode)


def _chunk_forward_fast_batched_paged(cfg, fw, tokens, pos0, valid_len,
                                      enable, pool, tables, page_size: int,
                                      logits_mode: str):
    from .paged import PagedKVPool

    B, T = tokens.shape
    S = cfg.max_seq_len
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    qpk = Hq // Hk
    sc = fw.scales

    p0 = jnp.where(enable != 0, pos0, 0)
    positions = p0[:, None] + jnp.arange(T)[None, :]            # (B, T)
    att_mask = jnp.arange(S)[None, None, :] <= positions[:, :, None]
    mask_of = _sliding_mask_fn(cfg, positions, att_mask, S)
    blk = jnp.minimum(positions // page_size, tables.shape[1] - 1)
    row = positions % page_size
    pages = jnp.take_along_axis(tables, blk, axis=1)            # (B, T)
    wmask = (enable[:, None] != 0)
    if valid_len is not None:
        wmask = wmask & (jnp.arange(T)[None, :] < valid_len[:, None])
    pages = jnp.where(wmask, pages, 0)                          # sink page
    pf, rf = pages.reshape(-1), row.reshape(-1)

    x = fw.embed[tokens].astype(jnp.float32)
    if cfg.embed_scale != 1.0:
        x = x * cfg.embed_scale
    if sc is not None:
        x = x * sc.embed[tokens][..., None]
    x = x.reshape(B * T, cfg.dim)

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

    def clip(a):
        if math.isinf(cfg.qkv_clip):
            return a
        return jnp.clip(a, -cfg.qkv_clip, cfg.qkv_clip)

    def layer_body(i, carry):
        x, kp, vp = carry
        xb = rmsnorm(x, jax.lax.dynamic_index_in_dim(fw.rms_att, i,
                                                     keepdims=False),
                     cfg.norm_eps)
        qkv = _proj_l(xb, fw.wqkv, i, sc.wqkv if sc else None)
        if fw.bqkv is not None:
            qkv = qkv + jax.lax.dynamic_index_in_dim(fw.bqkv, i,
                                                     keepdims=False)
        qkv = clip(qkv).reshape(B, T, -1)
        alt_i = _layer_alt(cfg, i)
        rope_b = jax.vmap(lambda a, p: apply_rope(a, p, cfg.rope_param,
                                                  cfg.rotary_dim, alt_i))
        qf, kf = _qk_norm(qkv[..., : cfg.q_dim],
                          qkv[..., cfg.q_dim: cfg.q_dim + cfg.kv_dim],
                          fw, i, cfg)
        q = rope_b(qf.reshape(B, T, Hq, D), positions)
        k = rope_b(kf.reshape(B, T, Hk, D), positions)
        v = qkv[..., cfg.q_dim + cfg.kv_dim:].reshape(B, T, Hk, D)

        # scatter the chunk's rows through the page tables (write BEFORE
        # the gather so the chunk attends to itself); enabled lanes' (page,
        # row) pairs are unique, disabled lanes collide harmlessly on the
        # sink page
        kp = kp.at[pf, i, rf].set(k.reshape(B * T, Hk, D).astype(kp.dtype))
        vp = vp.at[pf, i, rf].set(v.reshape(B * T, Hk, D).astype(vp.dtype))

        kc = kp[tables, i].reshape(B, S, Hk, D)
        vc = vp[tables, i].reshape(B, S, Hk, D)
        mixed = attend(q.reshape(B, T, Hk, qpk, D), kc, vc, mask_of(i))
        x = x + _post_norm(
            _proj_l(mixed.reshape(B * T, cfg.q_dim), fw.wo, i,
                    sc.wo if sc else None), fw.pa, i, cfg.norm_eps)
        if cfg.is_moe:
            # paged x MoE chunks (spec verify / batched admission)
            x = _moe_ffn_batched(x, fw, i, sc, cfg)
        else:
            x = _ffn2_l(x, fw, i, sc, cfg)
        return (x, kp, vp)

    x, kp, vp = jax.lax.fori_loop(
        0, cfg.n_layers, layer_body, (x, pool.k, pool.v))
    new_pool = PagedKVPool(k=kp, v=vp)
    if logits_mode == "none":
        return None, new_pool
    if logits_mode == "lastv":
        xg = x.reshape(B, T, cfg.dim)
        idx = (jnp.maximum(valid_len, 1) - 1 if valid_len is not None
               else jnp.full((B,), T - 1, jnp.int32))
        x_last = jnp.take_along_axis(
            xg, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        xn = rmsnorm(x_last, fw.final_norm, cfg.norm_eps)
        return _cap_logits(cfg, gemm(xn, fw.lm_head,
                                     sc.lm_head if sc else None)), new_pool
    xn = rmsnorm(x, fw.final_norm, cfg.norm_eps)
    logits = _cap_logits(cfg, gemm(xn, fw.lm_head,
                                   sc.lm_head if sc else None))
    if logits_mode == "all_h":
        return ((logits.reshape(B, T, -1), xn.reshape(B, T, -1)),
                new_pool)
    return logits.reshape(B, T, -1), new_pool
