"""Pallas fused dequant+GEMV/GEMM kernels — the decode hot path.

Single-token decode reads every weight byte once per token, so these kernels
are pure HBM-bandwidth plays (the role of the reference's hand-tuned GEMV
CUDA kernels, src/infer.cu:216-336). XLA's stock lowering of a batch-1
matvec on TPU reaches <15% of streaming bandwidth (measured); this kernel
streams weight tiles HBM->VMEM with the Mosaic pipeline, dequantizes
fp8/fp16 to bf16 on the VPU in-flight, and runs a skinny MXU dot — HBM
traffic stays at the *quantized* byte count, which is the whole point of
weight-only fp8 (the reference's fp8 path was a stub that never actually
dequantized, SURVEY.md §2.5; this is the real thing).

Weights are (out, in) exactly like the checkpoint layout — no load-time
transpose. x is one token's activation (in,).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gemv_kernel(x_ref, w_ref, o_ref, acc_ref, *, n_k: int):
    """One (BN, BK) weight tile: o[BN] += W_tile @ x_tile.

    Grid is (N/BN, K/BK) with K innermost; acc_ref carries the f32 partial
    sums across the K sweep and is flushed once per N block.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(jnp.bfloat16)          # VPU dequant (fp8/f16 -> bf16)
    x = x_ref[...].astype(jnp.bfloat16)          # (1, BK)
    # (1, BK) x (BN, BK)^T -> (1, BN) on the MXU
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == n_k - 1)
    def _():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("block_n", "block_k"))
def gemv(x: jax.Array, w: jax.Array, *, block_n: int = 512, block_k: int = 1024) -> jax.Array:
    """y[N] = W[N, K] @ x[K], fused dequant, f32 output.

    Requires N % block_n == 0 and K % block_k == 0 (model dims are MXU-tiled
    already; callers pick blocks via `pick_blocks`).
    """
    N, K = w.shape
    assert x.shape == (K,), (x.shape, w.shape)
    n_n, n_k = N // block_n, K // block_k
    assert n_n * block_n == N and n_k * block_k == K, (w.shape, block_n, block_k)

    out = pl.pallas_call(
        functools.partial(_gemv_kernel, n_k=n_k),
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((1, block_k), lambda i, j: (0, j)),
            pl.BlockSpec((block_n, block_k), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((1, block_n), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K,
            bytes_accessed=N * K * w.dtype.itemsize + K * x.dtype.itemsize + N * 4,
            transcendentals=0,
        ),
    )(x.reshape(1, K), w)
    return out.reshape(N)


def pick_blocks(N: int, K: int, itemsize: int) -> tuple[int, int]:
    """Choose (block_n, block_k) dividing (N, K), sized for ~2-4MB tiles so
    the Mosaic double-buffer pipeline hides DMA latency within VMEM limits."""
    def best(dim, target, align):
        b = align
        for cand in (align, 256, 512, 1024, 2048, 4096):
            if cand <= dim and dim % cand == 0:
                b = cand
            if cand >= target:
                break
        return b
    # target tile bytes ~2MB split across both dims
    bn = best(N, 512, 128 if N % 128 == 0 else _largest_divisor(N))
    bk = best(K, max(512, (2 << 20) // max(bn * itemsize, 1)), 128 if K % 128 == 0 else _largest_divisor(K))
    return bn, bk


def _largest_divisor(n: int) -> int:
    for d in (512, 256, 128, 64, 32, 16, 8):
        if n % d == 0:
            return d
    return 1
