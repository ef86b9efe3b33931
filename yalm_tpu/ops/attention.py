"""GQA attention over the KV ring buffer (jnp reference implementations).

These two functions are the designated swap points for Pallas kernels: the
decode path (one query position against the whole window) and the prefill
path (a chunk of query positions). Numerics follow the reference's
single-head `attn` (src/infer.cpp:216-248): f32 scores scaled by
1/sqrt(head_dim), softmax over exactly the valid slots, f32 V mix.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .core import masked_softmax


def _softcap(scores: jax.Array, cap: float) -> jax.Array:
    """Gemma2 logit soft-capping: cap * tanh(scores / cap); cap=0 -> off.
    Applied after the 1/sqrt(head_dim) scale, before masking (HF
    eager_attention_forward order)."""
    if not cap:
        return scores
    return cap * jnp.tanh(scores / cap)


def attend_one(q: jax.Array, kb: jax.Array, vb: jax.Array, slot_valid: jax.Array,
               softcap: float = 0.0) -> jax.Array:
    """Single-position GQA attention.

    q: (n_kv_heads, q_per_kv, head_dim) f32 — queries grouped by KV head
    kb/vb: (L, n_kv_heads, head_dim) — the KV cache window (any dtype)
    slot_valid: (L,) bool — which cache slots hold real history
    returns: (n_kv_heads, q_per_kv, head_dim) f32
    """
    head_dim = q.shape[-1]
    kb = kb.astype(jnp.float32)
    vb = vb.astype(jnp.float32)
    scores = jnp.einsum("gqd,lgd->gql", q.astype(jnp.float32), kb) / math.sqrt(head_dim)
    att = masked_softmax(_softcap(scores, softcap), slot_valid)
    return jnp.einsum("gql,lgd->gqd", att, vb)


def attend_chunk(q: jax.Array, kb: jax.Array, vb: jax.Array, att_mask: jax.Array,
                 softcap: float = 0.0) -> jax.Array:
    """Chunked GQA attention for prefill.

    q: (T, n_kv_heads, q_per_kv, head_dim) f32
    kb/vb: (L, n_kv_heads, head_dim)
    att_mask: (T, L) bool — causal visibility of cache slot l from chunk row t
    returns: (T, n_kv_heads, q_per_kv, head_dim) f32
    """
    head_dim = q.shape[-1]
    kb = kb.astype(jnp.float32)
    vb = vb.astype(jnp.float32)
    scores = jnp.einsum("tgqd,lgd->gqtl", q.astype(jnp.float32), kb) / math.sqrt(head_dim)
    att = masked_softmax(_softcap(scores, softcap), att_mask[None, None])
    return jnp.einsum("gqtl,lgd->tgqd", att, vb)
