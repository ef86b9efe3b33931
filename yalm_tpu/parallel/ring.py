"""Sequence-parallel (ring-attention) prefill.

Long-prompt prefill is compute-bound (chunked attention is O(T·prefix));
this module shards the PROMPT's sequence dimension over an `sp` mesh axis
and runs blockwise ring attention (Liu et al., arXiv:2310.01889 — the
public TPU recipe: each device keeps its query block, key/value blocks
rotate around the ring via `ppermute`, softmax is accumulated online), so
prefill FLOPs and activation memory scale 1/sp while the weights stay
resident per device. Composes with tensor parallelism: an ('sp', 'tp')
mesh shards heads/hidden on tp inside each sequence shard (Megatron psum),
sequence blocks on sp (ring collectives ride ICI neighbors).

The reference has nothing comparable — single device, token-at-a-time
hydration (src/main.cpp:91-97); SURVEY §2.6 lists sequence parallelism as
the one parallelism axis beyond its scope. v1 scope: dense models, whole
prompt at pos0=0, T <= window (the ring-buffer regime hydrates per-token
anyway and cannot batch whole windows).

Numerics note: online-softmax accumulation is algebraically exact; scores
and mixes run bf16->f32 like every other attention path here, so parity
with the oracle holds to normal bf16 tolerances.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ModelConfig
from ..models.cache import KVCache
from ..models.fast import (FastWeights, _cap_logits, _layer_alt,
                           _post_norm, _proj_l, _qk_norm, _softcap_scores)
from ..models.weights import Weights
from ..ops.core import apply_rope, gelu, silu, rmsnorm
from ..ops.pallas.gemv import gemv
from .fast_tp import (_clipper, _embed_psum, fast_tp_supported,
                      fast_tp_weights, fast_weight_pspecs)


def ring_supported(cfg: ModelConfig, sp: int, tp: int = 1) -> bool:
    # all weight dtypes incl. packed int4 (the body dispatches via _proj_l;
    # fast_tp_supported already checks the int4 local-shard tiling/groups)
    return (not cfg.is_moe
            and fast_tp_supported(cfg, tp) and cfg.n_kv_heads % tp == 0)


def make_prefill_ring(cfg: ModelConfig, mesh: Mesh,
                      with_scales: bool = False):
    """Build ring_prefill(fast_weights, tokens (T,)) ->
    (last_logits (V,), chunk_k, chunk_v each (n_layers, T, Hk, D)).

    tokens must satisfy T % sp == 0 and T <= cfg.max_seq_len; weights are
    the shard-major fast-TP layout sharded over `tp` (replicated over
    `sp`). The returned chunk cache rows are the prompt's K/V at positions
    [0, T) — place them into a window cache with `ring_prefill_cache`."""
    sp = mesh.shape["sp"]
    tp = mesh.shape.get("tp", 1)
    assert ring_supported(cfg, sp, tp), (cfg, sp, tp)
    Hq, Hk, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    Hq_l, Hk_l = Hq // tp, Hk // tp
    q_l, kv_l, h_l = cfg.q_dim // tp, cfg.kv_dim // tp, cfg.hidden_dim // tp
    V_l = cfg.vocab_size // tp
    qpk = Hq // Hk
    act = silu if cfg.act_type == "silu" else gelu
    clip = _clipper(cfg)
    w_specs = fast_weight_pspecs(cfg, with_scales)
    nl = cfg.n_layers

    def ring_attn(q, k, v, offset, T_l, sliding):
        """Blockwise causal ring attention: q (T_l, Hk_l, qpk, D) stays
        put; (k, v) rotate sp hops; softmax accumulated online in f32.
        `sliding` (traced bool): also mask q - k >= window (Gemma2/3)."""
        my = jax.lax.axis_index("sp")
        qpos = offset + jnp.arange(T_l)                    # global q rows
        scale = 1.0 / math.sqrt(D)

        def hop(s, carry):
            o, m, l, kc, vc = carry
            src = (my - s) % sp          # whose block we hold this hop
            kpos = src * T_l + jnp.arange(T_l)
            mask = qpos[:, None] >= kpos[None, :]          # (T_l, T_l)
            if any(cfg.layer_sliding):
                mask &= ~sliding | (qpos[:, None] - kpos[None, :]
                                    < cfg.sliding_window)
            sc = jnp.einsum("tgqd,lgd->gqtl", q.astype(jnp.bfloat16),
                            kc.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) * scale
            sc = _softcap_scores(cfg, sc)
            sc = jnp.where(mask[None, None], sc, -jnp.inf)
            m_new = jnp.maximum(m, sc.max(axis=-1))        # (g, q, t)
            # exp(-inf - -inf) guards: rows with nothing visible this hop
            alpha = jnp.exp(jnp.where(jnp.isfinite(m), m - m_new, -jnp.inf))
            p = jnp.exp(jnp.where(jnp.isfinite(sc), sc - m_new[..., None],
                                  -jnp.inf))
            l = l * alpha + p.sum(axis=-1)
            pv = jnp.einsum("gqtl,lgd->gqtd", p.astype(jnp.bfloat16),
                            vc.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            o = o * alpha[..., None] + pv
            perm = [(i, (i + 1) % sp) for i in range(sp)]
            kc = jax.lax.ppermute(kc, "sp", perm)
            vc = jax.lax.ppermute(vc, "sp", perm)
            return (o, m_new, l, kc, vc)

        o0 = jnp.zeros((Hk_l, qpk, T_l, D), jnp.float32)
        m0 = jnp.full((Hk_l, qpk, T_l), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((Hk_l, qpk, T_l), jnp.float32)
        o, m, l, _, _ = jax.lax.fori_loop(0, sp, hop, (o0, m0, l0, k, v))
        # causal self-block guarantees every row saw at least itself
        o = o / l[..., None]
        return jnp.transpose(o, (2, 0, 1, 3))              # (T_l, g, q, D)

    def body(fw: FastWeights, tokens):
        T_l = tokens.shape[0]
        sc = fw.scales
        my = jax.lax.axis_index("sp")
        offset = my * T_l
        positions = offset + jnp.arange(T_l)
        x = _embed_psum(fw.embed, tokens, V_l,
                        sc.embed if sc is not None else None)  # (T_l, dim)
        if cfg.embed_scale != 1.0:
            x = x * cfg.embed_scale
        k_out = jnp.zeros((nl, T_l, Hk_l, D), jnp.bfloat16)
        v_out = jnp.zeros((nl, T_l, Hk_l, D), jnp.bfloat16)

        def layer_body(i, carry):
            x, k_out, v_out = carry
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
            alt_i = _layer_alt(cfg, i)
            q = apply_rope(qf.reshape(T_l, Hq_l, D), positions,
                           cfg.rope_param, cfg.rotary_dim, alt_i)
            k = apply_rope(kf.reshape(T_l, Hk_l, D), positions,
                           cfg.rope_param, cfg.rotary_dim, alt_i)
            v = qkv[:, q_l + kv_l:].reshape(T_l, Hk_l, D)
            k_out = jax.lax.dynamic_update_slice(
                k_out, k.astype(jnp.bfloat16)[None], (i, 0, 0, 0))
            v_out = jax.lax.dynamic_update_slice(
                v_out, v.astype(jnp.bfloat16)[None], (i, 0, 0, 0))

            sliding_i = (jnp.asarray(cfg.layer_sliding, jnp.bool_)[i]
                         if any(cfg.layer_sliding) else jnp.bool_(False))
            mixed = ring_attn(q.reshape(T_l, Hk_l, qpk, D), k, v,
                              offset, T_l, sliding_i)
            x = x + _post_norm(jax.lax.psum(
                _proj_l(mixed.reshape(T_l, q_l), fw.wo, i,
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
            return (x, k_out, v_out)

        x, k_out, v_out = jax.lax.fori_loop(
            0, nl, layer_body, (x, k_out, v_out))
        # last-token logits live on the last sequence shard; tp shards
        # all-gather their vocab slices, sp broadcasts via masked psum
        x_last = rmsnorm(x[-1], fw.final_norm, cfg.norm_eps)
        local = _cap_logits(cfg, gemv(x_last, fw.lm_head,
                                      sc.lm_head if sc is not None else None))
        logits = jax.lax.all_gather(local, "tp").reshape(-1)
        logits = jnp.where(my == sp - 1, logits, 0.0)
        logits = jax.lax.psum(logits, "sp")
        return logits, k_out, v_out

    return shard_map(
        body, mesh=mesh,
        in_specs=(w_specs, P("sp")),
        out_specs=(P(), P(None, "sp", "tp", None), P(None, "sp", "tp", None)),
        check_vma=False,
    )


def shard_ring_weights(weights: Weights | FastWeights, cfg: ModelConfig,
                       mesh: Mesh) -> FastWeights:
    """Place weights for the ring prefill: tp-shard-major, replicated on sp."""
    from jax.sharding import NamedSharding
    if isinstance(weights, Weights):
        weights = fast_tp_weights(weights, cfg, mesh.shape.get("tp", 1))
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        fast_weight_pspecs(cfg, with_scales=weights.scales is not None),
        is_leaf=lambda x: isinstance(x, P))
    return jax.tree.map(jax.device_put, weights, shardings)


def ring_prefill_cache(cfg: ModelConfig, chunk_k, chunk_v, kv_dtype,
                       window_cache: KVCache | None = None) -> KVCache:
    """Place the ring prefill's (nl, T, Hk, D) chunk rows into a
    window-sized single-stream KVCache at slots [0, T)."""
    assert chunk_k.shape[1] <= cfg.max_seq_len, "ring prefill: T <= window"
    if window_cache is None:
        window_cache = KVCache.init(cfg, kv_dtype)
    # the chunk arrays come out of shard_map with explicit ('sp','tp')
    # shardings; unshard them before splicing into the (single-device)
    # decode cache — a one-time host hop at the prefill/decode boundary
    chunk_k = jnp.asarray(np.asarray(chunk_k))
    chunk_v = jnp.asarray(np.asarray(chunk_v))
    return KVCache(
        k=jax.lax.dynamic_update_slice(
            window_cache.k, chunk_k.astype(window_cache.k.dtype),
            (0, 0, 0, 0)),
        v=jax.lax.dynamic_update_slice(
            window_cache.v, chunk_v.astype(window_cache.v.dtype),
            (0, 0, 0, 0)))
