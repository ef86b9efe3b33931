"""Flash decode attention over the stacked KV ring buffer (Pallas).

The reference splits decode attention into three kernels — attn_dot,
attn_softmax, att_mix (src/infer.cu:338-524) — materializing the score
vector in HBM between them. Here it is ONE kernel with an online softmax
(flash-attention recurrence): KV blocks stream HBM->VMEM once, in the cache
dtype (f16/bf16), and only the (n_heads, head_dim) output leaves.

Like `gemv_l`, the layer index is a scalar-prefetch argument steering the
KV BlockSpec index_maps, so the kernel reads straight from the full
(n_layers, S, n_kv_heads, head_dim) cache in HBM — no per-layer slice copies
inside the engine's layer loop.

Ring-buffer semantics: a slot is attendable iff slot < kv_len (the oracle's
`slot_valid` mask, models/transformer.py); relative order inside the window
never matters for softmax attention, which is what makes StreamingLLM's
in-place ring overwrite correct (reference src/infer.cpp:483-485).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gemv import _emulate

_NEG_INF = -1e30


def _attend_ref(q2: jax.Array, k: jax.Array, v: jax.Array,
                kv_len: jax.Array) -> jax.Array:
    """jnp emulation with the kernel's numerics (bf16 dots, f32 softmax).

    q2: (rows, D) pre-scaled; k/v: (S, Hk, D) one layer; rows = Hk * P.
    Returns (rows, D) f32. Off-TPU default — see gemv._emulate.
    """
    S, Hk, D = k.shape
    P = q2.shape[0] // Hk
    q3 = q2.reshape(Hk, P, D).astype(jnp.bfloat16)
    scores = jnp.einsum("gpd,sgd->gps", q3, k.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    valid = (jnp.arange(S) < kv_len)[None, None, :]
    scores = jnp.where(valid, scores, _NEG_INF)
    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("gps,sgd->gpd", att.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return out.reshape(Hk * P, D)


def _attn_kernel(scal_ref, q_ref, k_ref, v_ref, o_ref,
                 oacc_ref, m_ref, l_ref, *,
                 n_blocks: int, block_s: int, n_kv_heads: int, p_rows: int):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        oacc_ref[...] = jnp.zeros_like(oacc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    kv_len = scal_ref[1]
    slot = s * block_s + jax.lax.broadcasted_iota(jnp.int32, (p_rows, block_s), 1)
    valid = slot < kv_len  # (P, BS) — same mask for every kv head

    for h in range(n_kv_heads):
        r0 = h * p_rows
        qh = q_ref[r0:r0 + p_rows, :]                      # (P, D) f32, pre-scaled
        kh = k_ref[0, :, h, :]                             # (BS, D) cache dtype
        vh = v_ref[0, :, h, :]
        sh = jax.lax.dot_general(
            qh.astype(jnp.bfloat16), kh.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        sh = jnp.where(valid, sh, _NEG_INF)                # (P, BS)

        m_prev = m_ref[r0:r0 + p_rows, 0:1]                # (P, 1)
        l_prev = l_ref[r0:r0 + p_rows, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(sh, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(sh - m_new)                            # (P, BS)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        ob = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vh.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        oacc_ref[r0:r0 + p_rows, :] = oacc_ref[r0:r0 + p_rows, :] * alpha + ob
        m_ref[r0:r0 + p_rows, 0:1] = m_new
        l_ref[r0:r0 + p_rows, 0:1] = l_new

    @pl.when(s == n_blocks - 1)
    def _():
        o_ref[...] = oacc_ref[...] / l_ref[:, 0:1]


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def attend_one_l(q: jax.Array, k_all: jax.Array, v_all: jax.Array,
                 layer: jax.Array, kv_len: jax.Array, *,
                 block_s: int = 0, interpret: bool | None = None) -> jax.Array:
    """Single-position GQA flash attention against layer `layer` of the cache.

    q: (n_kv_heads, q_per_kv, head_dim) f32 (unscaled; 1/sqrt(D) applied here)
    k_all/v_all: (n_layers, S, n_kv_heads, head_dim), any dtype
    kv_len: () int32 — slots < kv_len are attendable
    returns (n_kv_heads, q_per_kv, head_dim) f32
    """
    L, S, Hk, D = k_all.shape
    Hk_q, qpk, Dq = q.shape
    assert (Hk_q, Dq) == (Hk, D), (q.shape, k_all.shape)
    if interpret is None and _emulate():
        q2 = (q.astype(jnp.float32) / math.sqrt(D)).reshape(Hk * qpk, D)
        k = jax.lax.dynamic_index_in_dim(k_all, layer, keepdims=False)
        v = jax.lax.dynamic_index_in_dim(v_all, layer, keepdims=False)
        return _attend_ref(q2, k, v, kv_len).reshape(Hk, qpk, D)
    if interpret is None:
        interpret = False
    if not block_s:
        block_s = S
        for cand in (1024, 512, 256, 128, 64, 32, 16, 8):
            if S % cand == 0 and cand <= S:
                block_s = cand
                break
    n_blocks = S // block_s

    # pad query rows per KV head up to a sublane multiple so each head's
    # row-slice of the scratch accumulators is 8-aligned
    P = max(8, ((qpk + 7) // 8) * 8)
    qp = jnp.zeros((Hk, P, D), jnp.float32)
    qp = qp.at[:, :qpk, :].set(q.astype(jnp.float32) / math.sqrt(D))
    q2 = qp.reshape(Hk * P, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((Hk * P, D), lambda s, sc: (0, 0)),
            pl.BlockSpec((1, block_s, Hk, D), lambda s, sc: (sc[0], s, 0, 0)),
            pl.BlockSpec((1, block_s, Hk, D), lambda s, sc: (sc[0], s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Hk * P, D), lambda s, sc: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hk * P, D), jnp.float32),
            pltpu.VMEM((Hk * P, 128), jnp.float32),
            pltpu.VMEM((Hk * P, 128), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_attn_kernel, n_blocks=n_blocks, block_s=block_s,
                          n_kv_heads=Hk, p_rows=P),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hk * P, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * S * Hk * P * D,
            bytes_accessed=2 * S * Hk * D * k_all.dtype.itemsize,
            transcendentals=S * Hk * P,
        ),
        interpret=interpret,
    )(jnp.stack([jnp.asarray(layer, jnp.int32),
                 jnp.asarray(kv_len, jnp.int32)]), q2, k_all, v_all)
    return out.reshape(Hk, P, D)[:, :qpk, :]


def attention_supported(cfg) -> bool:
    """Shapes the kernel can tile: head_dim a lane multiple, kv heads*dim
    tileable, window splittable into sublane-aligned blocks."""
    return (cfg.head_dim % 128 == 0 and cfg.max_seq_len % 8 == 0
            and cfg.max_seq_len >= 8)
