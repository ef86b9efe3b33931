"""Pure-jnp transformer forward pass — the parity oracle.

Functional re-formulation of the reference's per-token forward pass
(src/infer.cpp:254-524): GQA attention with interleaved partial RoPE,
qkv-clipping, a sliding-window KV ring buffer with StreamingLLM attention
sinks, RMSNorm, SwiGLU/GeGLU FFN, and optional MoE routing. Differences are
deliberate TPU-first design, not omissions:

- All layers' weights are stacked and the layer loop is one `lax.scan`.
- Position-dependent control flow (ring index, sink count, kv_len) is data,
  not shape: everything is static-shaped and masked, so one compiled program
  serves every position (the role CUDA graphs play in the reference,
  src/infer.cu:1130-1164).
- `prefill` processes a whole chunk of tokens in batched matmuls — the
  reference hydrates one token at a time (src/main.cpp:91-97); on TPU the MXU
  makes chunked prefill enormously faster and numerically identical (ring
  wraparound can't occur while pos < max_seq_len, which the engine enforces).

Single-sequence functions; batch them with `jax.vmap` (weights in_axes=None).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import KV_SINKS, ModelConfig
from ..ops.attention import attend_chunk, attend_one
from ..ops.core import act_fn, apply_rope, moe_gate, rmsnorm, rope_rotate_cached
from .cache import KVCache
from .weights import LayerWeights, Weights


def _dq(w: jax.Array, compute_dtype) -> jax.Array:
    """Weight-only dequantization: fp8/fp16 weights -> compute dtype.

    XLA fuses the convert into the consuming dot; the Pallas fast path
    replaces the whole (dequant + matmul) with a fused kernel.
    """
    return w.astype(compute_dtype)


def _proj(x: jax.Array, w: jax.Array, compute_dtype) -> jax.Array:
    """x[..., in] @ w[out, in]^T -> [..., out]."""
    return jax.lax.dot_general(
        x.astype(compute_dtype), _dq(w, compute_dtype),
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _clip(x: jax.Array, limit: float) -> jax.Array:
    if math.isinf(limit):
        return x
    return jnp.clip(x, -limit, limit)


def _qkv(xb: jax.Array, lw: LayerWeights, cfg: ModelConfig, compute_dtype):
    """Q/K/V projections with optional Qwen2-style biases (added pre-clip,
    matching HF Linear semantics)."""
    q = _proj(xb, lw.wq, compute_dtype)
    k = _proj(xb, lw.wk, compute_dtype)
    v = _proj(xb, lw.wv, compute_dtype)
    if lw.bq is not None:
        q = q + lw.bq
        k = k + lw.bk
        v = v + lw.bv
    q, k, v = (_clip(q, cfg.qkv_clip), _clip(k, cfg.qkv_clip),
               _clip(v, cfg.qkv_clip))
    if lw.qn is not None:
        # Qwen3-style per-head RMSNorm on q/k (post-projection, pre-RoPE;
        # one (head_dim,) weight shared by all heads — HF Qwen3Attention)
        D = cfg.head_dim
        q = rmsnorm(q.reshape(*q.shape[:-1], cfg.n_heads, D), lw.qn,
                    cfg.norm_eps).reshape(q.shape).astype(q.dtype)
        k = rmsnorm(k.reshape(*k.shape[:-1], cfg.n_kv_heads, D), lw.kn,
                    cfg.norm_eps).reshape(k.shape).astype(k.dtype)
    return q, k, v


def _ffn(xb: jax.Array, w1: jax.Array, w2: jax.Array, w3: jax.Array,
         act: str, compute_dtype) -> jax.Array:
    """GLU feed-forward: w2(act(w1 x) * w3 x) (reference src/infer.cpp:355-377)."""
    h1 = _proj(xb, w1, compute_dtype)
    h3 = _proj(xb, w3, compute_dtype)
    return _proj(act_fn(act)(h1) * h3, w2, compute_dtype)


def _moe_ffn(cfg: ModelConfig, xb: jax.Array, lw: LayerWeights, compute_dtype) -> jax.Array:
    """Top-k expert mixture for a single token's activation xb[dim].

    Router scores -> top-k -> gather just the active experts' weights (XLA
    lowers the take to a DMA of only those experts' bytes — the HBM traffic
    matches the reference's per-active-expert GEMVs, src/infer.cpp:347-384).
    """
    router = _proj(xb, lw.moegate, compute_dtype)           # (n_experts,)
    weights, idx = moe_gate(router, cfg.n_experts_active)

    def one_expert(e):
        return _ffn(xb, lw.w1[e], lw.w2[e], lw.w3[e], cfg.act_type, compute_dtype)

    deltas = jax.vmap(one_expert)(idx)                      # (k, dim)
    return jnp.sum(weights[:, None] * deltas, axis=0)


def _dense_ffn_delta(cfg: ModelConfig, xb: jax.Array, lw: LayerWeights, compute_dtype) -> jax.Array:
    if cfg.is_moe:
        return _moe_ffn(cfg, xb, lw, compute_dtype)
    return _ffn(xb, lw.w1, lw.w2, lw.w3, cfg.act_type, compute_dtype)


# ---------------------------------------------------------------------------
# Single-token decode step
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "output_logits", "compute_dtype", "capture"))
def decode_step(
    cfg: ModelConfig,
    weights: Weights,
    token: jax.Array,        # () int32
    pos: jax.Array,          # () int32 — absolute position in the sequence
    cache: KVCache,
    *,
    output_logits: bool = True,
    compute_dtype=jnp.float32,
    capture: bool = False,
) -> tuple[Optional[jax.Array], KVCache]:
    """One decode step at absolute position `pos`; returns (logits|None, cache).

    Implements the full ring-buffer + attention-sink semantics of the
    reference's top level (src/infer.cpp:474-524): once pos reaches the
    window, the first KV_SINKS slots freeze (but their keys rotate forward
    each step) and the rest of the cache is replaced in ring order.
    """
    L = cfg.max_seq_len
    x = weights.embed[token].astype(jnp.float32)            # embedding gather
    if cfg.embed_scale != 1.0:
        x = x * cfg.embed_scale

    kv_sink = jnp.where(pos >= L, KV_SINKS, 0)
    kv_pos = kv_sink + (pos - kv_sink) % (L - kv_sink)
    kv_len = jnp.minimum(pos + 1, L)
    slot_valid = jnp.arange(L) < kv_len                     # (L,)

    # Alternating local attention (Gemma2/3): sliding layers mask by slot
    # AGE, which is well-defined in both regimes — linear: pos - s; ring:
    # (kv_pos - s) mod (L - sinks); rotated sink views sit at age L-1-s.
    if any(cfg.layer_sliding):
        s_idx = jnp.arange(L)
        age = jnp.where(s_idx < kv_sink, L - 1 - s_idx,
                        (kv_pos - s_idx) % jnp.maximum(L - kv_sink, 1))
        sliding_valid = slot_valid & (age < cfg.sliding_window)
        flags = jnp.asarray(cfg.layer_sliding, jnp.bool_)
    else:
        sliding_valid = slot_valid
        flags = jnp.zeros(cfg.n_layers, jnp.bool_)

    # Gemma3's dual rope: sliding layers rotate with the LOCAL theta —
    # the selector is the same per-layer flag as the sliding mask
    g3 = bool(cfg.rope_scale) and cfg.rope_scale[0] == "gemma3"

    def layer_fn(x, layer):
        lw, kc, vc, sliding = layer
        alt = sliding if g3 else None
        # -- attention ----------------------------------------------------
        xb = rmsnorm(x, lw.rms_att, cfg.norm_eps)
        q, k, v = _qkv(xb, lw, cfg, compute_dtype)

        q = apply_rope(q.reshape(cfg.n_heads, cfg.head_dim), pos,
                       cfg.rope_param, cfg.rotary_dim, alt)
        k = apply_rope(k.reshape(cfg.n_kv_heads, cfg.head_dim), pos,
                       cfg.rope_param, cfg.rotary_dim, alt)
        v = v.reshape(cfg.n_kv_heads, cfg.head_dim)

        kc = jax.lax.dynamic_update_slice(kc, k[None].astype(kc.dtype), (kv_pos, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, v[None].astype(vc.dtype), (kv_pos, 0, 0))

        # LAZY sink rotation (StreamingLLM, reference src/infer.cpp:303-317):
        # frozen sink keys must appear a constant relative distance away.
        # The cache stores them as originally written; attention rotates a
        # VIEW forward by the accumulated offset max(0, pos - L + 1) — the
        # same total rotation the reference applies one step at a time, in
        # one exact application (no per-step cache-dtype round-trips).
        rot = jnp.maximum(pos - L + 1, 0)
        sink_rows = kc[:KV_SINKS].astype(jnp.float32)
        rotated = rope_rotate_cached(sink_rows, cfg.rope_param,
                                     cfg.rotary_dim, rot, alt)
        sink_mask = (jnp.arange(KV_SINKS) < kv_sink)[:, None, None]
        k_view = jax.lax.dynamic_update_slice(
            kc.astype(jnp.float32),
            jnp.where(sink_mask, rotated, sink_rows), (0, 0, 0))

        # -- GQA attention over the ring buffer ---------------------------
        qpk = cfg.n_heads // cfg.n_kv_heads
        q3 = q.reshape(cfg.n_kv_heads, qpk, cfg.head_dim)
        valid_l = jnp.where(sliding, sliding_valid, slot_valid)
        mixed = attend_one(q3, k_view, vc, valid_l,
                           softcap=cfg.attn_softcap).reshape(cfg.q_dim)

        delta = _proj(mixed, lw.wo, compute_dtype)
        if lw.pa is not None:  # Gemma2 sandwich norm on the attention delta
            delta = rmsnorm(delta, lw.pa, cfg.norm_eps)
        x = x + delta

        # -- FFN ----------------------------------------------------------
        xb2 = rmsnorm(x, lw.rms_ffn, cfg.norm_eps)
        delta = _dense_ffn_delta(cfg, xb2, lw, compute_dtype)
        if lw.pf is not None:
            delta = rmsnorm(delta, lw.pf, cfg.norm_eps)
        x = x + delta
        ys = (kc, vc)
        if capture:
            # DEBUG_MODEL-style per-layer activation capture
            # (reference src/model.h:329-348); scan stacks these over layers.
            ys = (kc, vc, {"att_in": xb, "q": q, "k": k, "v": v,
                           "att_mix": mixed, "ffn_in": xb2, "block_out": x})
        return x, ys

    x, ys = jax.lax.scan(layer_fn, x,
                         (weights.layers, cache.k, cache.v, flags))
    new_cache = KVCache(k=ys[0], v=ys[1])
    cap = ys[2] if capture else None

    if not output_logits:
        return (None, new_cache, cap) if capture else (None, new_cache)
    x = rmsnorm(x, weights.final_norm, cfg.norm_eps)
    logits = _proj(x, weights.lm_head, compute_dtype)
    if cfg.final_softcap:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    if capture:
        cap = dict(cap)
        cap["final_norm"] = x
        cap["logits"] = logits
        return logits, new_cache, cap
    return logits, new_cache


# ---------------------------------------------------------------------------
# Chunked prefill
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "logits_mode", "compute_dtype"))
def prefill(
    cfg: ModelConfig,
    weights: Weights,
    tokens: jax.Array,       # (T,) int32, padded to the chunk length
    pos0: jax.Array,         # () int32 — absolute position of tokens[0]
    valid_len: jax.Array,    # () int32 — number of real (non-pad) tokens
    cache: KVCache,
    *,
    logits_mode: str = "last",   # "none" | "last" | "all"
    compute_dtype=jnp.float32,
) -> tuple[Optional[jax.Array], KVCache]:
    """Process a chunk of T tokens starting at absolute position pos0.

    PRECONDITION (engine-enforced): pos0 + T <= cfg.max_seq_len, so no ring
    wraparound or sink rotation can occur inside the chunk — which is what
    makes whole-chunk batched matmuls exactly equivalent to the reference's
    token-at-a-time hydration loop (src/main.cpp:91-97). Positions past
    `valid_len` are padding: their KV writes are masked out and their logits
    meaningless.

    logits_mode: "none" -> (None, cache) — pure KV hydration;
    "last" -> logits of the last valid token, shape (vocab,);
    "all" -> logits at every chunk position, shape (T, vocab) (perplexity).
    """
    T = tokens.shape[0]
    L = cfg.max_seq_len
    positions = pos0 + jnp.arange(T)
    valid = jnp.arange(T) < valid_len                       # (T,)

    x = weights.embed[tokens].astype(jnp.float32)           # (T, dim)
    if cfg.embed_scale != 1.0:
        x = x * cfg.embed_scale

    # causal visibility: query at chunk-row i attends to cache slot l iff
    # l <= pos0 + i (all earlier slots are valid history; no wraparound).
    att_mask = jnp.arange(L)[None, :] <= positions[:, None]  # (T, L)

    # sliding layers additionally require pos - slot < window (no ring can
    # occur during prefill, so slot index IS the absolute position)
    if any(cfg.layer_sliding):
        sliding_mask = att_mask & (
            positions[:, None] - jnp.arange(L)[None, :] < cfg.sliding_window)
        flags = jnp.asarray(cfg.layer_sliding, jnp.bool_)
    else:
        sliding_mask = att_mask
        flags = jnp.zeros(cfg.n_layers, jnp.bool_)

    g3 = bool(cfg.rope_scale) and cfg.rope_scale[0] == "gemma3"

    def layer_fn(x, layer):
        lw, kc, vc, sliding = layer
        alt = sliding if g3 else None
        xb = rmsnorm(x, lw.rms_att, cfg.norm_eps)
        q, k, v = _qkv(xb, lw, cfg, compute_dtype)

        q = apply_rope(q.reshape(T, cfg.n_heads, cfg.head_dim), positions,
                       cfg.rope_param, cfg.rotary_dim, alt)
        k = apply_rope(k.reshape(T, cfg.n_kv_heads, cfg.head_dim), positions,
                       cfg.rope_param, cfg.rotary_dim, alt)
        v = v.reshape(T, cfg.n_kv_heads, cfg.head_dim)

        # masked region write: only valid rows replace cache contents
        old_k = jax.lax.dynamic_slice(kc, (pos0, 0, 0), (T, cfg.n_kv_heads, cfg.head_dim))
        old_v = jax.lax.dynamic_slice(vc, (pos0, 0, 0), (T, cfg.n_kv_heads, cfg.head_dim))
        vmask = valid[:, None, None]
        kc = jax.lax.dynamic_update_slice(kc, jnp.where(vmask, k.astype(kc.dtype), old_k), (pos0, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, jnp.where(vmask, v.astype(vc.dtype), old_v), (pos0, 0, 0))

        qpk = cfg.n_heads // cfg.n_kv_heads
        q4 = q.reshape(T, cfg.n_kv_heads, qpk, cfg.head_dim)
        mask_l = jnp.where(sliding, sliding_mask, att_mask)
        mixed = attend_chunk(q4, kc, vc, mask_l,
                             softcap=cfg.attn_softcap).reshape(T, cfg.q_dim)

        delta = _proj(mixed, lw.wo, compute_dtype)
        if lw.pa is not None:  # Gemma2 sandwich norm on the attention delta
            delta = rmsnorm(delta, lw.pa, cfg.norm_eps)
        x = x + delta
        xb = rmsnorm(x, lw.rms_ffn, cfg.norm_eps)
        if cfg.is_moe:
            delta = jax.vmap(lambda r: _moe_ffn(cfg, r, lw, compute_dtype))(xb)
        else:
            delta = _ffn(xb, lw.w1, lw.w2, lw.w3, cfg.act_type, compute_dtype)
        if lw.pf is not None:
            delta = rmsnorm(delta, lw.pf, cfg.norm_eps)
        x = x + delta
        return x, (kc, vc)

    x, (k_new, v_new) = jax.lax.scan(
        layer_fn, x, (weights.layers, cache.k, cache.v, flags))
    new_cache = KVCache(k=k_new, v=v_new)

    def head(xn):
        logits = _proj(xn, weights.lm_head, compute_dtype)
        if cfg.final_softcap:
            logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
        return logits

    if logits_mode == "none":
        return None, new_cache
    if logits_mode == "last":
        x_last = jnp.take(x, valid_len - 1, axis=0)
        return head(rmsnorm(x_last, weights.final_norm, cfg.norm_eps)), new_cache
    if logits_mode in ("all", "all_h"):
        xn = rmsnorm(x, weights.final_norm, cfg.norm_eps)
        if logits_mode == "all_h":
            return (head(xn), xn), new_cache
        return head(xn), new_cache
    raise ValueError(f"bad logits_mode {logits_mode!r}")
