"""Fused dequant+GEMV Pallas kernels — the decode hot path.

Single-token decode reads every weight byte once per token, so these kernels
are pure HBM-bandwidth plays (the role of the reference's hand-tuned GEMV
CUDA kernels, src/infer.cu:216-336). Two design points make them fast on TPU:

1. **No weight copies.** `gemv_l` reads its tiles *directly* from the stacked
   (n_layers, out, in) weight array in HBM, with the layer selected by a
   scalar-prefetch argument feeding the BlockSpec index_map. Inside the
   engine's `fori_loop` over layers this means zero dynamic-slice
   materialization — the TPU-native equivalent of the reference's CUDA-graph
   kernel-param mutation (src/infer.cu:1146-1163). Measured on v5e: the
   naive XLA formulation (dynamic-slice + astype + dot) moves 3-4x the
   weight bytes; this kernel moves exactly 1x.

2. **Fused dequant.** fp8/f16 weights are widened to bf16 on the VPU after
   the tile lands in VMEM, so HBM traffic stays at the *quantized* byte
   count — the real version of the reference's stubbed fp8 path
   (SURVEY.md §2.5).

Weights are (out, in) exactly like the checkpoint layout — no load-time
transpose (measured: (in, out) layout is no faster; batch-1 GEMV on v5e is
DMA-limited either way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU tests / virtual meshes)."""
    return jax.default_backend() != "tpu"


def _emulate() -> bool:
    """Off-TPU the kernels default to a numerics-matched jnp emulation.

    The Pallas interpreter is exercised explicitly (interpret=True) by the
    kernel parity tests; whole-model CPU runs use the emulation path because
    it is much faster than interpreting every kernel and numerically
    identical by construction.

    YALM_PALLAS_EMULATE=1/0 overrides the backend check — needed when a TPU
    plugin owns the default backend but the computation targets a virtual
    CPU mesh (driver dryruns). Flipping it mid-process is unsupported (the
    flag is read at trace time and jit caches don't key on it).
    """
    import os
    flag = os.environ.get("YALM_PALLAS_EMULATE")
    if flag in ("0", "1"):
        return flag == "1"
    return jax.default_backend() != "tpu"


def _bf16(x: jax.Array) -> jax.Array:
    """Cast to bf16 for the MXU; Mosaic has no direct f16->bf16 cast, so
    fp16 weights/caches take a widening hop through f32."""
    if x.dtype == jnp.float16:
        x = x.astype(jnp.float32)
    return x.astype(jnp.bfloat16)


def _gemv_ref(x: jax.Array, w: jax.Array, scale=None) -> jax.Array:
    """jnp emulation with the kernel's exact numerics: bf16 inputs to the
    dot, f32 accumulation, optional per-output-channel dequant scale."""
    out = jax.lax.dot_general(
        x.reshape(1, -1).astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32).reshape(-1)
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    return out


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "interpret"))
def gemv(x: jax.Array, w: jax.Array, scale: jax.Array | None = None, *,
         block_n: int = 0, block_k: int = 0,
         interpret: bool | None = None) -> jax.Array:
    """y[N] = (W[N, K] @ x[K]) [* scale[N]] with dequant fused in the tile
    stream. x is f32 (or bf16); w may be int8/fp8_e5m2/f16/bf16/f32;
    `scale` is the int8 per-output-channel dequant factor. Output is f32.
    """
    N, K = w.shape
    assert x.shape == (K,), (x.shape, w.shape)
    if interpret is None and _emulate():
        return _gemv_ref(x, w, scale)
    if not block_n or not block_k:
        block_n, block_k = pick_blocks(N, K, w.dtype.itemsize)
    n_n, n_k = N // block_n, K // block_k
    assert n_n * block_n == N and n_k * block_k == K, (w.shape, block_n, block_k)
    if interpret is None:
        interpret = False

    has_scale = scale is not None
    extra_in, extra_specs = [], []
    if has_scale:
        extra_in.append(scale.reshape(1, N).astype(jnp.float32))
        extra_specs.append(pl.BlockSpec((1, block_n), lambda i, j: (0, i)))

    def kern(x_ref, w_ref, *rest):
        refs = list(rest)
        s_ref = refs.pop(0) if has_scale else None
        o_ref, acc_ref = refs
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            x_ref[...].astype(jnp.bfloat16), _bf16(w_ref[...]),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

        @pl.when(j == n_k - 1)
        def _():
            o_ref[...] = acc_ref[...] * s_ref[...] if has_scale else acc_ref[...]

    out = pl.pallas_call(
        kern,
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((1, block_k), lambda i, j: (0, j)),
            pl.BlockSpec((block_n, block_k), lambda i, j: (i, j)),
        ] + extra_specs,
        out_specs=pl.BlockSpec((1, block_n), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K,
            bytes_accessed=N * K * w.dtype.itemsize + K * 4 + N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x.reshape(1, K).astype(jnp.float32), w, *extra_in)
    return out.reshape(N)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "interpret",
                                             "norm_eps"))
def gemv_l(x: jax.Array, w_all: jax.Array, layer: jax.Array, *,
           norm_w: jax.Array | None = None, norm_eps: float = 1e-5,
           residual: jax.Array | None = None,
           scale: jax.Array | None = None,
           block_n: int = 0, block_k: int = 0,
           interpret: bool | None = None) -> jax.Array:
    """y[N] = W_all[layer] @ maybe_rmsnorm(x) [* scale] (+ residual) —
    layer-indexed GEMV over stacked weights.

    `layer` is a traced scalar: it rides the scalar-prefetch channel and
    steers the weight BlockSpec's index_map, so tiles DMA straight from the
    selected layer's bytes in HBM. Safe (and fast) inside lax.fori_loop /
    lax.scan over layers.

    Optional fusions (each removes a small XLA op + an activation HBM
    round-trip from the per-layer chain):
    - norm_w (n_layers, K): RMS-normalize x against layer `layer`'s norm
      weights inside the kernel (requires full-K blocks).
    - scale (n_layers, N): int8 per-output-channel dequant, multiplied into
      the f32 accumulator at flush.
    - residual (N,): added to the output in the final flush.
    """
    L, N, K = w_all.shape
    assert x.shape == (K,), (x.shape, w_all.shape)
    if interpret is None and _emulate():
        xv = x.astype(jnp.float32)
        if norm_w is not None:
            nw = jax.lax.dynamic_index_in_dim(norm_w, layer, keepdims=False)
            ms = jnp.mean(xv * xv)
            xv = xv * jax.lax.rsqrt(ms + norm_eps) * nw.astype(jnp.float32)
        sc = (jax.lax.dynamic_index_in_dim(scale, layer, keepdims=False)
              if scale is not None else None)
        out = _gemv_ref(xv, jax.lax.dynamic_index_in_dim(w_all, layer, keepdims=False),
                        sc)
        return out + residual if residual is not None else out
    if not block_n or not block_k:
        block_n, block_k = pick_blocks(N, K, w_all.dtype.itemsize)
    n_n, n_k = N // block_n, K // block_k
    assert n_n * block_n == N and n_k * block_k == K, (w_all.shape, block_n, block_k)
    assert norm_w is None or n_k == 1, "fused rmsnorm needs full-K blocks"
    if interpret is None:
        interpret = False

    extra_in, extra_specs = [], []
    if norm_w is not None:
        # (L, 1, K) so the block's trailing dims equal the full array dims
        extra_in.append(norm_w.reshape(L, 1, K))
        extra_specs.append(pl.BlockSpec((1, 1, block_k), lambda i, j, l: (l[0], 0, j)))
    if scale is not None:
        extra_in.append(scale.reshape(L, 1, N).astype(jnp.float32))
        extra_specs.append(pl.BlockSpec((1, 1, block_n), lambda i, j, l: (l[0], 0, i)))
    if residual is not None:
        extra_in.append(residual.reshape(1, N).astype(jnp.float32))
        extra_specs.append(pl.BlockSpec((1, block_n), lambda i, j, l: (0, i)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((1, block_k), lambda i, j, l: (0, j)),
            pl.BlockSpec((1, block_n, block_k), lambda i, j, l: (l[0], i, j)),
        ] + extra_specs,
        out_specs=pl.BlockSpec((1, block_n), lambda i, j, l: (0, i)),
        scratch_shapes=[pltpu.VMEM((1, block_n), jnp.float32)],
    )

    has_norm, has_res = norm_w is not None, residual is not None
    has_scale = scale is not None

    def kern(l_ref, x_ref, w_ref, *rest):
        refs = list(rest)
        nw_ref = refs.pop(0) if has_norm else None
        s_ref = refs.pop(0) if has_scale else None
        res_ref = refs.pop(0) if has_res else None
        o_ref, acc_ref = refs
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        xv = x_ref[...].astype(jnp.float32)
        if has_norm:
            ms = jnp.mean(xv * xv, axis=-1, keepdims=True)
            xv = xv * jax.lax.rsqrt(ms + norm_eps) * nw_ref[0].astype(jnp.float32)
        acc_ref[...] += jax.lax.dot_general(
            xv.astype(jnp.bfloat16), _bf16(w_ref[0]),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

        @pl.when(j == n_k - 1)
        def _():
            y = acc_ref[...]
            if has_scale:
                y = y * s_ref[0]
            if has_res:
                y = y + res_ref[...]
            o_ref[...] = y

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K,
            bytes_accessed=N * K * w_all.dtype.itemsize + K * 4 + N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      x.reshape(1, K).astype(jnp.float32), w_all, *extra_in)
    return out.reshape(N)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "interpret"))
def gemv_le(x: jax.Array, w_all: jax.Array, layer: jax.Array,
            expert: jax.Array, scale: jax.Array | None = None, *,
            block_n: int = 0, block_k: int = 0,
            interpret: bool | None = None) -> jax.Array:
    """y[N] = (W_all[layer, expert] @ x) [* scale[layer, expert]] — the MoE
    variant of gemv_l.

    Both the layer and the routed expert index ride the scalar-prefetch
    channel, so only the ACTIVE expert's bytes ever leave HBM — the traffic
    contract of the reference's per-active-expert GEMVs (src/infer.cpp:355-384).
    """
    L, E, N, K = w_all.shape
    assert x.shape == (K,), (x.shape, w_all.shape)
    if interpret is None and _emulate():
        w = w_all[layer, expert]
        return _gemv_ref(x, w, scale[layer, expert] if scale is not None else None)
    if not block_n or not block_k:
        block_n, block_k = pick_blocks(N, K, w_all.dtype.itemsize)
    n_n, n_k = N // block_n, K // block_k
    assert n_n * block_n == N and n_k * block_k == K, (w_all.shape, block_n, block_k)
    if interpret is None:
        interpret = False

    has_scale = scale is not None
    extra_in, extra_specs = [], []
    if has_scale:
        extra_in.append(scale.reshape(L, E, 1, N).astype(jnp.float32))
        extra_specs.append(pl.BlockSpec((1, 1, 1, block_n),
                                        lambda i, j, sc: (sc[0], sc[1], 0, i)))

    def kern(sc_ref, x_ref, w_ref, *rest):
        refs = list(rest)
        s_ref = refs.pop(0) if has_scale else None
        o_ref, acc_ref = refs
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            x_ref[...].astype(jnp.bfloat16), _bf16(w_ref[0, 0]),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

        @pl.when(j == n_k - 1)
        def _():
            o_ref[...] = acc_ref[...] * s_ref[0, 0] if has_scale else acc_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((1, block_k), lambda i, j, sc: (0, j)),
            pl.BlockSpec((1, 1, block_n, block_k),
                         lambda i, j, sc: (sc[0], sc[1], i, j)),
        ] + extra_specs,
        out_specs=pl.BlockSpec((1, block_n), lambda i, j, sc: (0, i)),
        scratch_shapes=[pltpu.VMEM((1, block_n), jnp.float32)],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K,
            bytes_accessed=N * K * w_all.dtype.itemsize + K * 4 + N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.stack([jnp.asarray(layer, jnp.int32),
                 jnp.asarray(expert, jnp.int32)]),
      x.reshape(1, K).astype(jnp.float32), w_all, *extra_in)
    return out.reshape(N)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "interpret"))
def gemm_le(x: jax.Array, w_all: jax.Array, layer: jax.Array,
            expert: jax.Array, scale: jax.Array | None = None, *,
            block_n: int = 0, block_k: int = 0,
            interpret: bool | None = None) -> jax.Array:
    """y[B, N] = x[B, K] @ W_all[layer, expert]^T [* scale] — batched gemv_le.

    Used by the batched MoE tick: tiles stream straight from the selected
    (layer, expert) bytes, so no expert-stack slices ever materialize.
    """
    B, K = x.shape
    L, E, N, Kw = w_all.shape
    assert K == Kw, (x.shape, w_all.shape)
    if interpret is None and _emulate():
        w = w_all[layer, expert]
        out = jax.lax.dot_general(
            x.astype(jnp.bfloat16), _bf16(w),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if scale is not None:
            out = out * scale[layer, expert][None].astype(jnp.float32)
        return out
    if not block_n or not block_k:
        block_n, block_k = pick_blocks(N, K, w_all.dtype.itemsize)
    n_n, n_k = N // block_n, K // block_k
    assert n_n * block_n == N and n_k * block_k == K, (w_all.shape, block_n, block_k)
    if interpret is None:
        interpret = False

    has_scale = scale is not None
    extra_in, extra_specs = [], []
    if has_scale:
        extra_in.append(scale.reshape(L, E, 1, N).astype(jnp.float32))
        extra_specs.append(pl.BlockSpec((1, 1, 1, block_n),
                                        lambda i, j, sc: (sc[0], sc[1], 0, i)))

    def kern(sc_ref, x_ref, w_ref, *rest):
        refs = list(rest)
        s_ref = refs.pop(0) if has_scale else None
        o_ref, acc_ref = refs
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            x_ref[...].astype(jnp.bfloat16), _bf16(w_ref[0, 0]),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

        @pl.when(j == n_k - 1)
        def _():
            o_ref[...] = acc_ref[...] * s_ref[0, 0] if has_scale else acc_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((B, block_k), lambda i, j, sc: (0, j)),
            pl.BlockSpec((1, 1, block_n, block_k),
                         lambda i, j, sc: (sc[0], sc[1], i, j)),
        ] + extra_specs,
        out_specs=pl.BlockSpec((B, block_n), lambda i, j, sc: (0, i)),
        scratch_shapes=[pltpu.VMEM((B, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * K * w_all.dtype.itemsize + B * (K + N) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.stack([jnp.asarray(layer, jnp.int32),
                 jnp.asarray(expert, jnp.int32)]),
      x.astype(jnp.float32), w_all, *extra_in)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "interpret"))
def gemm_l(x: jax.Array, w_all: jax.Array, layer: jax.Array,
           scale: jax.Array | None = None, *,
           block_n: int = 0, block_k: int = 0,
           interpret: bool | None = None) -> jax.Array:
    """y[B, N] = x[B, K] @ W_all[layer]^T [* scale[layer]] — batched gemv_l.

    The continuous-batching tick decodes B tokens against the same weights;
    streaming each weight tile once and multiplying an (B, bk) activation
    block amortizes the HBM traffic over the whole batch (same roofline as
    batch 1, ~B× the tokens). Any B works — the activation block spans the
    full batch dim, which Mosaic accepts regardless of alignment (verified
    on hardware with odd prefill chunk sizes).
    """
    B, K = x.shape
    L, N, Kw = w_all.shape
    assert K == Kw, (x.shape, w_all.shape)
    if interpret is None and _emulate():
        w = jax.lax.dynamic_index_in_dim(w_all, layer, keepdims=False)
        out = jax.lax.dot_general(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if scale is not None:
            sc = jax.lax.dynamic_index_in_dim(scale, layer, keepdims=False)
            out = out * sc[None].astype(jnp.float32)
        return out
    if not block_n or not block_k:
        block_n, block_k = pick_blocks(N, K, w_all.dtype.itemsize)
    n_n, n_k = N // block_n, K // block_k
    assert n_n * block_n == N and n_k * block_k == K, (w_all.shape, block_n, block_k)
    if interpret is None:
        interpret = False

    has_scale = scale is not None
    extra_in, extra_specs = [], []
    if has_scale:
        extra_in.append(scale.reshape(L, 1, N).astype(jnp.float32))
        extra_specs.append(pl.BlockSpec((1, 1, block_n),
                                        lambda i, j, l: (l[0], 0, i)))

    def kern(l_ref, x_ref, w_ref, *rest):
        refs = list(rest)
        s_ref = refs.pop(0) if has_scale else None
        o_ref, acc_ref = refs
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jax.lax.dot_general(
            x_ref[...].astype(jnp.bfloat16), _bf16(w_ref[0]),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

        @pl.when(j == n_k - 1)
        def _():
            o_ref[...] = acc_ref[...] * s_ref[0] if has_scale else acc_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((B, block_k), lambda i, j, l: (0, j)),
            pl.BlockSpec((1, block_n, block_k), lambda i, j, l: (l[0], i, j)),
        ] + extra_specs,
        out_specs=pl.BlockSpec((B, block_n), lambda i, j, l: (0, i)),
        scratch_shapes=[pltpu.VMEM((B, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * K * w_all.dtype.itemsize + B * (K + N) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      x.astype(jnp.float32), w_all, *extra_in)


def gemm(x: jax.Array, w: jax.Array, scale: jax.Array | None = None, *,
         interpret: bool | None = None) -> jax.Array:
    """y[B, N] = x[B, K] @ W[N, K]^T [* scale] (2-D weights, e.g. the LM head)."""
    return gemm_l(x, w[None], jnp.int32(0),
                  scale[None] if scale is not None else None,
                  interpret=interpret)


# ---------------------------------------------------------------------------
# int4 weights: planar-packed nibbles + per-group dequant scales
# ---------------------------------------------------------------------------
#
# Two int4 values pack per byte PLANAR WITHIN EACH GROUP of `group` unpacked
# columns: byte t of a group holds (col t) in its low nibble and (col t +
# group/2) in its high nibble, values offset-8 (0..15 = -8..7). Unpacking is
# then two bitwise ops yielding two CONTIGUOUS half-tiles whose dots against
# the matching x halves sum to the group's partial product — no lane
# interleave anywhere (Mosaic rejects pair-split lane reshapes). Each
# k-grid step covers exactly one group, so the group's dequant scale
# multiplies the f32 partial before accumulation:
#     y[n] = sum_g s[n, g] * sum_{k in g} x[k] * q[n, k]
# Weight HBM traffic halves vs int8/fp8 — decode is weight-bandwidth-bound,
# so this is the deepest quantization the GEMV path offers (AWQ/GPTQ-class
# group-wise int4; the reference's deepest real dtype is f16, §2.5).

def int4_group(K: int) -> int:
    """Group width: 512 unpacked cols when possible (256-lane packed
    blocks), 256 otherwise. K must be a multiple of 256."""
    return 512 if K % 512 == 0 else 256


def int4_supported(N: int, K: int) -> bool:
    return K % 256 == 0 and (N % 128 == 0 or N <= 512)


def pack_int4(w, group: int = 0):
    """Quantize float weights (..., N, K) to planar-packed int4.

    Returns (packed uint8 (..., N, K//2), scales f32 (..., G, N)) with
    G = K // group; scales are GROUP-major so kernels can block them
    (1, block_n) per (group, n-tile) step. Symmetric per-(row, group):
    s = max|w| / 7, q = clip(round(w/s), -8, 7) stored offset-8."""
    import numpy as np
    w = np.asarray(w, np.float32)
    K = w.shape[-1]
    group = group or int4_group(K)
    G, H = K // group, group // 2
    wg = w.reshape(*w.shape[:-1], G, group)
    s = np.abs(wg).max(axis=-1) / 7.0                    # (..., N, G)
    s = np.maximum(s, 1e-12)
    q = np.clip(np.rint(wg / s[..., None]), -8, 7).astype(np.int8) + 8
    lo, hi = q[..., :H], q[..., H:]                      # (..., N, G, H)
    packed = (lo | (hi << 4)).astype(np.uint8)
    packed = packed.reshape(*w.shape[:-1], K // 2)
    scales = np.moveaxis(s, -1, -2).copy()               # (..., G, N)
    return packed, np.ascontiguousarray(scales, dtype=np.float32)


def unpack_int4(packed, scales, group: int = 0):
    """Dequantize back to f32 (..., N, K) — loader/oracle path."""
    import numpy as np
    packed = np.asarray(packed)
    K = packed.shape[-1] * 2
    group = group or int4_group(K)
    G, H = K // group, group // 2
    p = packed.reshape(*packed.shape[:-1], G, H)
    lo = (p & 0xF).astype(np.float32) - 8.0
    hi = (p >> 4).astype(np.float32) - 8.0
    q = np.concatenate([lo, hi], axis=-1)                # (..., N, G, group)
    s = np.moveaxis(np.asarray(scales, np.float32), -1, -2)  # (..., N, G)
    return (q * s[..., None]).reshape(*packed.shape[:-1], K)


def _gemm4_ref(x, w4, gs, group: int) -> jax.Array:
    """jnp emulation with the kernel's exact numerics: per-group bf16 dots,
    f32 accumulation, group scale on the f32 partial."""
    B, K = x.shape
    N = w4.shape[0]
    G, H = K // group, group // 2
    p = w4.reshape(N, G, H)
    lo = ((p & 0xF).astype(jnp.bfloat16) - 8).astype(jnp.bfloat16)
    hi = ((p >> 4).astype(jnp.bfloat16) - 8).astype(jnp.bfloat16)
    q = jnp.concatenate([lo, hi], axis=-1)               # (N, G, group)
    xg = x.reshape(B, G, group).astype(jnp.bfloat16)
    parts = jnp.einsum("bgk,ngk->bgn", xg, q,
                       preferred_element_type=jnp.float32)
    return jnp.einsum("bgn,gn->bn", parts, gs.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def gemm4_l(x: jax.Array, w4_all: jax.Array, layer: jax.Array,
            gscale: jax.Array, *,
            interpret: bool | None = None) -> jax.Array:
    """y[B, N] = x[B, K] @ dequant4(W4_all[layer])^T — layer-indexed
    batched GEMV over PACKED int4 weights (L, N, K//2) with group scales
    (L, G, N). Same scalar-prefetch steering as gemm_l; weight tiles DMA
    HALF the bytes of int8/fp8."""
    B, K2 = x.shape[0], w4_all.shape[-1]
    K = 2 * K2
    L, N = w4_all.shape[0], w4_all.shape[1]
    assert x.shape == (B, K), (x.shape, w4_all.shape)
    group = int4_group(K)
    G, Hp = K // group, group // 2
    assert gscale.shape == (L, G, N), (gscale.shape, (L, G, N))
    if interpret is None and _emulate():
        w4 = jax.lax.dynamic_index_in_dim(w4_all, layer, keepdims=False)
        gs = jax.lax.dynamic_index_in_dim(gscale, layer, keepdims=False)
        return _gemm4_ref(x.astype(jnp.float32), w4, gs, group)
    if interpret is None:
        interpret = False
    import os
    tile_bytes = int(os.environ.get("YALM_GEMV_TILE_BYTES", 2 << 20))
    block_n = _best_divisor(N, target=max(128, min(N, tile_bytes // Hp)),
                            align=128)
    # two groups per k-step (when G divides): halves the grid steps and the
    # one-hot scale selects — probed +8% alone, +21% with the unsigned-dot
    # correction (tools/int4_unpack_probe.py, BH variant)
    gps = 2 if G % 2 == 0 else 1
    n_n, n_k = N // block_n, G // gps

    def kern(l_ref, x_ref, w_ref, s_ref, o_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        # group scale: s block is the FULL (G, bn) slab (a (1, 1, bn)
        # block would put extent 1 on the second-minor dim — Mosaic
        # rejects it); j-invariant index_map keeps it resident, one-hot
        # reduce selects the row without a dynamic minor-dim slice
        def load_s(g):
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
                      == j * gps + g)
            return jnp.sum(jnp.where(onehot, s_ref[0], 0.0), axis=0)

        # dot4_tile: ONE u8->i32 widen, i32 mask/shift (Mosaic has no
        # uint8->bf16 cast; `w >> 4` ON UINT8 crashes its compiler when
        # the result feeds the MXU; extra u8-domain ops measured 4x
        # slower), unsigned dots + 8*sum(x) correction
        xb = x_ref[...].astype(jnp.bfloat16)             # (B, gps*group)
        acc_ref[...] += dot4_tile(
            xb, lambda g: w_ref[0][:, g * Hp:(g + 1) * Hp], load_s,
            gps, group)

        @pl.when(j == n_k - 1)
        def _():
            o_ref[...] = acc_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((B, gps * group), lambda i, j, l: (0, j)),
            pl.BlockSpec((1, block_n, gps * Hp), lambda i, j, l: (l[0], i, j)),
            pl.BlockSpec((1, G, block_n), lambda i, j, l: (l[0], 0, i)),
        ],
        out_specs=pl.BlockSpec((B, block_n), lambda i, j, l: (0, i)),
        scratch_shapes=[pltpu.VMEM((B, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * K2 + B * (K + N) * 4 + G * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      x.astype(jnp.float32), w4_all, gscale.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def gemm4_le(x: jax.Array, w4_all: jax.Array, layer: jax.Array,
             expert: jax.Array, gscale: jax.Array, *,
             interpret: bool | None = None) -> jax.Array:
    """y[B, N] = x[B, K] @ dequant4(W4_all[layer, expert])^T — the MoE
    variant of gemm4_l: layer AND routed expert ride the scalar-prefetch
    channel, so only the active expert's PACKED bytes leave HBM (half the
    int8 routed traffic). w4_all (L, E, N, K//2), gscale (L, E, G, N)."""
    B, K2 = x.shape[0], w4_all.shape[-1]
    K = 2 * K2
    L, E, N = w4_all.shape[0], w4_all.shape[1], w4_all.shape[2]
    assert x.shape == (B, K), (x.shape, w4_all.shape)
    group = int4_group(K)
    G, Hp = K // group, group // 2
    assert gscale.shape == (L, E, G, N), (gscale.shape, (L, E, G, N))
    if interpret is None and _emulate():
        w4 = w4_all[layer, expert]
        gs = gscale[layer, expert]
        return _gemm4_ref(x.astype(jnp.float32), w4, gs, group)
    if interpret is None:
        interpret = False
    import os
    tile_bytes = int(os.environ.get("YALM_GEMV_TILE_BYTES", 2 << 20))
    block_n = _best_divisor(N, target=max(128, min(N, tile_bytes // Hp)),
                            align=128)
    gps = 2 if G % 2 == 0 else 1
    n_n, n_k = N // block_n, G // gps

    def kern(sc_ref, x_ref, w_ref, s_ref, o_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        # same dot4_tile body + full-(G, bn) scale slab as gemm4_l
        def load_s(g):
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
                      == j * gps + g)
            return jnp.sum(jnp.where(onehot, s_ref[0, 0], 0.0), axis=0)

        xb = x_ref[...].astype(jnp.bfloat16)
        acc_ref[...] += dot4_tile(
            xb, lambda g: w_ref[0, 0][:, g * Hp:(g + 1) * Hp], load_s,
            gps, group)

        @pl.when(j == n_k - 1)
        def _():
            o_ref[...] = acc_ref[...]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((B, gps * group), lambda i, j, sc: (0, j)),
            pl.BlockSpec((1, 1, block_n, gps * Hp),
                         lambda i, j, sc: (sc[0], sc[1], i, j)),
            pl.BlockSpec((1, 1, G, block_n),
                         lambda i, j, sc: (sc[0], sc[1], 0, i)),
        ],
        out_specs=pl.BlockSpec((B, block_n), lambda i, j, sc: (0, i)),
        scratch_shapes=[pltpu.VMEM((B, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * K2 + B * (K + N) * 4 + G * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.stack([jnp.asarray(layer, jnp.int32),
                 jnp.asarray(expert, jnp.int32)]),
      x.astype(jnp.float32), w4_all, gscale.astype(jnp.float32))


def gemv4_le(x: jax.Array, w4_all: jax.Array, layer: jax.Array,
             expert: jax.Array, gscale: jax.Array, *,
             interpret: bool | None = None) -> jax.Array:
    """Single-token routed-expert int4 GEMV."""
    return gemm4_le(x.reshape(1, -1), w4_all, layer, expert, gscale,
                    interpret=interpret).reshape(-1)


def gemv4_l(x: jax.Array, w4_all: jax.Array, layer: jax.Array,
            gscale: jax.Array, *,
            interpret: bool | None = None) -> jax.Array:
    """Single-token int4 GEMV (x (K,) -> y (N,))."""
    return gemm4_l(x.reshape(1, -1), w4_all, layer, gscale,
                   interpret=interpret).reshape(-1)


def gemm4(x: jax.Array, w4: jax.Array, gscale: jax.Array, *,
          interpret: bool | None = None) -> jax.Array:
    """2-D packed weights (N, K//2), scales (G, N) — e.g. the LM head."""
    return gemm4_l(x, w4[None], jnp.int32(0), gscale[None],
                   interpret=interpret)


def gemv4(x: jax.Array, w4: jax.Array, gscale: jax.Array, *,
          interpret: bool | None = None) -> jax.Array:
    return gemm4(x.reshape(1, -1), w4, gscale,
                 interpret=interpret).reshape(-1)


def dot4_tile(xb, load_w, load_s, G: int, group: int):
    """Per-tile packed-int4 GEMV body shared by the kernels (gemm4_l,
    ffn4_l, attn_block4_l): y = sum_g (x_lo_g @ lo_g^T + x_hi_g @ hi_g^T -
    8*sum(x_g)) * s_g — bf16 dots, f32 partials, group scale on the f32
    partial; equal to the signed dequant up to f32 accumulation order.

    The UNSIGNED-nibble dot + 8*sum(x) correction drops both per-element
    `-8` subtracts from the unpack (7 -> 5 VPU ops per byte; probed +21%
    with the 2-group step on the w2 shape, tools/int4_unpack_probe.py).
    The correction sums the SAME bf16-rounded x the dots consume, in f32,
    and is shared across every output row of the tile.

    xb: (B, G*group) bf16 activations (static slices per group).
    load_w(g) -> (bn, group//2) uint8 packed tile slice for group g.
    load_s(g) -> (bn,) f32 group-g dequant scales for this tile's rows.
    Returns (B, bn) f32.
    """
    Hp = group // 2
    acc = None
    for g in range(G):
        # ONE u8->i32 widen per byte, then i32 mask/shift: `w >> 4` on
        # uint8 feeding the MXU crashes Mosaic, and extra u8-domain ops
        # measured 4x slower (see gemm4_l)
        wi = load_w(g).astype(jnp.int32)                 # (bn, Hp)
        lo = (wi & 0xF).astype(jnp.bfloat16)
        hi = (wi >> 4).astype(jnp.bfloat16)
        x_lo = xb[:, g * group: g * group + Hp]
        x_hi = xb[:, g * group + Hp: (g + 1) * group]
        part = jax.lax.dot_general(
            x_lo, lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        part += jax.lax.dot_general(
            x_hi, hi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        part -= 8.0 * (jnp.sum(x_lo.astype(jnp.float32), -1, keepdims=True)
                       + jnp.sum(x_hi.astype(jnp.float32), -1, keepdims=True))
        part = part * load_s(g)[None, :]
        acc = part if acc is None else acc + part
    return acc


def pick_blocks(N: int, K: int, itemsize: int) -> tuple[int, int]:
    """Choose (block_n, block_k) dividing (N, K).

    block_k rides the lane (minor) dim of both x and the weight tile —
    multiples of 128. block_n is the weight tile's sublane dim but also the
    lane dim of the (1, N) OUTPUT, so Mosaic requires it to be a multiple of
    128 too (or the full dimension). Tiles target ~0.5-2 MB so the Mosaic
    double-buffer pipeline hides DMA latency well within VMEM.
    """
    import os
    tile_bytes = int(os.environ.get("YALM_GEMV_TILE_BYTES", 2 << 20))
    # full-K blocks make every weight tile one fully contiguous byte range in
    # HBM (vs per-row strips) — measured ~7% faster end-to-end decode on v5e
    bk = K if K * itemsize <= tile_bytes else _best_divisor(
        K, target=min(K, 2048), align=128)
    per_row = bk * itemsize
    bn = _best_divisor(N, target=max(128, min(N, tile_bytes // max(per_row, 1))),
                       align=128)
    return bn, bk


def gemv_supported(N: int, K: int) -> bool:
    """Shapes the kernels can tile.

    K must split into 128-lane blocks. N always tiles: either a
    multiple-of-128 divisor exists or the whole N rides one block (Mosaic
    allows a block equal to the full dimension) — gate the latter on the
    resulting weight tile fitting comfortably in VMEM.
    """
    if K % 128 != 0:
        return False
    if any(N % d == 0 for d in range(128, min(N, 4096) + 1, 128)):
        return True
    return N * 128 * 4 <= (1 << 22)  # full-N block, conservatively sized


def _best_divisor(n: int, target: int, align: int) -> int:
    """Largest multiple-of-`align` divisor of n that is <= target; if none
    exists at all, the full dimension (always a legal Mosaic block)."""
    best = None
    d = align
    while d <= n:
        if n % d == 0:
            if d <= target:
                best = d
            elif best is None:
                best = d
                break
        d += align
    return best if best is not None else n
