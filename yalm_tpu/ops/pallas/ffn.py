"""Fully-fused dense FFN kernel: norm + w13-stream + GLU + w2-stream + residual.

One Pallas call per layer replaces the two gemv_l calls (w13, w2) plus the
XLA GLU in between. Beyond the launch saving, the payoff is pipeline
continuity: with both weight streams inside one kernel there is no Mosaic
pipeline drain between the w13 sweep and the w2 sweep — the w2 prefetch
starts while the last w13 tiles are still in flight (manual double-buffered
DMA, the same pattern as the fused attention kernel).

The GLU intermediate (2*hidden f32) lives entirely in VMEM; nothing but the
(dim,) output touches HBM besides the weight bytes themselves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gemv import (_bf16, _best_divisor, _emulate, _gemm4_ref, dot4_tile,
                   int4_group, pick_blocks)


_DEPTH = 2  # outstanding weight-tile DMAs per stream. Measured on v5e: a
            # lone double-buffered stream already reaches ~700 GB/s and
            # depth 3 benched NO faster end-to-end (94.8 vs 96.0 tok/s) —
            # the extra VMEM buys nothing, so keep the classic double buffer


def _ffn_kernel(scal_ref, x_ref, nw_ref, res_ref, *rest,
                H: int, K: int, D: int, bn1: int, bn2: int,
                norm_eps: float, act: str, add_residual: bool,
                has_scale: bool):
    refs = list(rest)
    if has_scale:
        s13_ref = refs.pop(0)
        s2_ref = refs.pop(0)
    w13_hbm, w2_hbm, o_ref, w13buf, w2buf, h_ref, sem = refs
    layer = scal_ref[0]
    n1 = (2 * H) // bn1
    n2 = D // bn2

    # RMS-normalize each row in-kernel (x is the raw residual stream(s))
    xv = x_ref[...].astype(jnp.float32)                  # (B, K)
    ms = jnp.mean(xv * xv, axis=-1, keepdims=True)
    xb = (xv * jax.lax.rsqrt(ms + norm_eps) * nw_ref[0].astype(jnp.float32)
          ).astype(jnp.bfloat16)

    def w13_dma(slot, blk):
        return pltpu.make_async_copy(
            w13_hbm.at[layer, pl.ds(blk * bn1, bn1)], w13buf.at[slot],
            sem.at[slot])

    def w2_dma(slot, blk):
        return pltpu.make_async_copy(
            w2_hbm.at[layer, pl.ds(blk * bn2, bn2)], w2buf.at[slot],
            sem.at[_DEPTH + slot])

    # -- phase 1: h13 = W13 @ xb, DEPTH tiles in flight -------------------
    for d in range(min(_DEPTH, n1)):
        w13_dma(d, d).start()

    def p1(blk, _):
        slot = blk % _DEPTH
        w13_dma(slot, blk).wait()
        y = jax.lax.dot_general(
            xb, _bf16(w13buf[slot]),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if has_scale:
            y = y * s13_ref[0, :, pl.ds(blk * bn1, bn1)]
        h_ref[:, pl.ds(blk * bn1, bn1)] = y

        # the dot has consumed this slot; refill it DEPTH tiles ahead
        @pl.when(blk + _DEPTH < n1)
        def _():
            w13_dma(slot, blk + _DEPTH).start()

        # start the FIRST w2 tile once the last w13 tile is in flight:
        # no pipeline drain between the two weight streams
        @pl.when(blk + _DEPTH == n1)
        def _():
            w2_dma(0, 0).start()

        return 0

    jax.lax.fori_loop(0, n1, p1, 0)
    if n1 < _DEPTH:
        # short first phase: the in-loop w2 prefetch never triggered
        w2_dma(0, 0).start()

    # -- GLU in VMEM ------------------------------------------------------
    h1 = h_ref[:, :H]
    h3 = h_ref[:, H:]
    if act == "silu":
        g = h1 * jax.nn.sigmoid(h1)
    else:
        g = 0.5 * h1 * (1.0 + jnp.tanh(0.797885 * (h1 + 0.044715 * h1 * h1 * h1)))
    hb = (g * h3).astype(jnp.bfloat16)   # (1, H)

    # -- phase 2: out = W2 @ h + residual ---------------------------------
    # tiles 1.._DEPTH-1 start as soon as h is ready (tile 0 started during
    # phase 1)
    for d in range(1, min(_DEPTH, n2)):
        w2_dma(d, d).start()

    def p2(blk, _):
        slot = blk % _DEPTH
        w2_dma(slot, blk).wait()
        y = jax.lax.dot_general(
            hb, _bf16(w2buf[slot]),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if has_scale:
            y = y * s2_ref[0, :, pl.ds(blk * bn2, bn2)]
        if add_residual:
            y = y + res_ref[:, pl.ds(blk * bn2, bn2)]
        o_ref[:, pl.ds(blk * bn2, bn2)] = y

        @pl.when(blk + _DEPTH < n2)
        def _():
            w2_dma(slot, blk + _DEPTH).start()
        return 0

    jax.lax.fori_loop(0, n2, p2, 0)


def _ffn4_kernel(scal_ref, x_ref, nw_ref, res_ref, s13_ref, s2_ref, *rest,
                 H: int, K: int, D: int, bn1: int, bn2: int,
                 G13: int, group13: int, G2: int, group2: int,
                 norm_eps: float, act: str, add_residual: bool):
    w13_hbm, w2_hbm, o_ref, w13buf, w2buf, h_ref, sem = rest
    layer = scal_ref[0]
    Kp13, Hp2 = group13 // 2, group2 // 2
    n1 = (2 * H) // bn1
    n2 = D // bn2

    xv = x_ref[...].astype(jnp.float32)                  # (B, K)
    ms = jnp.mean(xv * xv, axis=-1, keepdims=True)
    xb = (xv * jax.lax.rsqrt(ms + norm_eps) * nw_ref[0].astype(jnp.float32)
          ).astype(jnp.bfloat16)

    def w13_dma(slot, blk):
        return pltpu.make_async_copy(
            w13_hbm.at[layer, pl.ds(blk * bn1, bn1)], w13buf.at[slot],
            sem.at[slot])

    def w2_dma(slot, blk):
        return pltpu.make_async_copy(
            w2_hbm.at[layer, pl.ds(blk * bn2, bn2)], w2buf.at[slot],
            sem.at[_DEPTH + slot])

    # -- phase 1: h13 = dequant4(W13) @ xb, _DEPTH tiles in flight --------
    for d in range(min(_DEPTH, n1)):
        w13_dma(d, d).start()

    def p1(blk, _):
        slot = blk % _DEPTH
        w13_dma(slot, blk).wait()
        y = dot4_tile(
            xb,
            lambda g: w13buf[slot, :, g * Kp13:(g + 1) * Kp13],
            lambda g: s13_ref[0, g, pl.ds(blk * bn1, bn1)],
            G13, group13)
        h_ref[:, pl.ds(blk * bn1, bn1)] = y

        @pl.when(blk + _DEPTH < n1)
        def _():
            w13_dma(slot, blk + _DEPTH).start()

        @pl.when(blk + _DEPTH == n1)
        def _():
            w2_dma(0, 0).start()
        return 0

    jax.lax.fori_loop(0, n1, p1, 0)
    if n1 < _DEPTH:
        w2_dma(0, 0).start()

    # -- GLU in VMEM ------------------------------------------------------
    h1 = h_ref[:, :H]
    h3 = h_ref[:, H:]
    if act == "silu":
        g = h1 * jax.nn.sigmoid(h1)
    else:
        g = 0.5 * h1 * (1.0 + jnp.tanh(0.797885 * (h1 + 0.044715 * h1 * h1 * h1)))
    hb = (g * h3).astype(jnp.bfloat16)                   # (B, H)

    # -- phase 2: out = dequant4(W2) @ h + residual ------------------------
    for d in range(1, min(_DEPTH, n2)):
        w2_dma(d, d).start()

    def p2(blk, _):
        slot = blk % _DEPTH
        w2_dma(slot, blk).wait()
        y = dot4_tile(
            hb,
            lambda g: w2buf[slot, :, g * Hp2:(g + 1) * Hp2],
            lambda g: s2_ref[0, g, pl.ds(blk * bn2, bn2)],
            G2, group2)
        if add_residual:
            y = y + res_ref[:, pl.ds(blk * bn2, bn2)]
        o_ref[:, pl.ds(blk * bn2, bn2)] = y

        @pl.when(blk + _DEPTH < n2)
        def _():
            w2_dma(slot, blk + _DEPTH).start()
        return 0

    jax.lax.fori_loop(0, n2, p2, 0)


def ffn4_supported(K: int, H: int, D: int) -> bool:
    """Whether the fused int4 FFN kernel tiles these dims: both packed
    sweeps need a 128-aligned output-tile divisor and whole groups."""
    bn1 = _best_divisor(2 * H, target=max(128, (2 << 20) // (K // 2)),
                        align=128)
    bn2 = _best_divisor(D, target=max(128, (2 << 20) // (H // 2)), align=128)
    return (K % 256 == 0 and H % 256 == 0
            and (2 * H) % bn1 == 0 and bn1 % 128 == 0
            and D % bn2 == 0 and bn2 % 128 == 0)


@functools.partial(jax.jit, static_argnames=("norm_eps", "act",
                                             "add_residual", "interpret"))
def ffn4_l(x: jax.Array, norm_w: jax.Array, w13_all: jax.Array,
           w2_all: jax.Array, layer: jax.Array,
           gs13: jax.Array, gs2: jax.Array, *,
           norm_eps: float, act: str, add_residual: bool = True,
           interpret: bool | None = None) -> jax.Array:
    """x + deq4(W2[layer]) @ glu(deq4(W13[layer]) @ rmsnorm(x)) — the
    PACKED-INT4 fused FFN (norm + w13 stream + GLU + w2 stream + residual
    in one kernel; same pipeline as ffn_l at HALF the weight bytes).

    w13_all: (L, 2H, K//2) planar-packed uint8; w2_all: (L, D, H//2);
    gs13: (L, K//group(K), 2H) f32 group scales; gs2: (L, H//group(H), D).
    Numerics match gemm4_l (bf16 group dots, f32 partials, group scale on
    the f32 partial) so the unfused and fused int4 paths agree to f32
    accumulation order.
    """
    L, H2, Kp = w13_all.shape
    H = H2 // 2
    K = 2 * Kp
    _, D, Hp_tot = w2_all.shape
    assert Hp_tot * 2 == H, (w13_all.shape, w2_all.shape)
    squeeze = x.ndim == 1
    x2 = x.reshape(-1, K)
    B = x2.shape[0]
    assert D == K, (x.shape, w13_all.shape, w2_all.shape)
    group13, group2 = int4_group(K), int4_group(H)
    G13, G2 = K // group13, H // group2
    assert gs13.shape == (L, G13, H2), (gs13.shape, (L, G13, H2))
    assert gs2.shape == (L, G2, D), (gs2.shape, (L, G2, D))
    if interpret is None and _emulate():
        nw = jax.lax.dynamic_index_in_dim(norm_w, layer, keepdims=False)
        xv = x2.astype(jnp.float32)
        ms = jnp.mean(xv * xv, axis=-1, keepdims=True)
        xb = xv * jax.lax.rsqrt(ms + norm_eps) * nw.astype(jnp.float32)
        w13 = jax.lax.dynamic_index_in_dim(w13_all, layer, keepdims=False)
        s13 = jax.lax.dynamic_index_in_dim(gs13, layer, keepdims=False)
        h13 = _gemm4_ref(xb, w13, s13, group13)
        h1, h3 = h13[:, :H], h13[:, H:]
        if act == "silu":
            g = h1 * jax.nn.sigmoid(h1)
        else:
            g = 0.5 * h1 * (1.0 + jnp.tanh(0.797885 * (h1 + 0.044715 * h1 ** 3)))
        w2 = jax.lax.dynamic_index_in_dim(w2_all, layer, keepdims=False)
        s2 = jax.lax.dynamic_index_in_dim(gs2, layer, keepdims=False)
        out = _gemm4_ref((g * h3).astype(jnp.float32), w2, s2, group2)
        if add_residual:
            out = x2 + out
        return out.reshape(x.shape)
    if interpret is None:
        interpret = False

    import os
    tile_bytes = int(os.environ.get("YALM_GEMV_TILE_BYTES", 2 << 20))
    bn1 = _best_divisor(H2, target=max(128, tile_bytes // Kp), align=128)
    bn2 = _best_divisor(D, target=max(128, tile_bytes // Hp_tot), align=128)
    assert H2 % bn1 == 0 and D % bn2 == 0, (w13_all.shape, bn1, bn2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i, sc: (0, 0)),
            pl.BlockSpec((1, 1, K), lambda i, sc: (sc[0], 0, 0)),
            pl.BlockSpec((B, D), lambda i, sc: (0, 0)),
            pl.BlockSpec((1, G13, H2), lambda i, sc: (sc[0], 0, 0)),
            pl.BlockSpec((1, G2, D), lambda i, sc: (sc[0], 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, D), lambda i, sc: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((_DEPTH, bn1, Kp), jnp.uint8),
            pltpu.VMEM((_DEPTH, bn2, Hp_tot), jnp.uint8),
            pltpu.VMEM((B, H2), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * _DEPTH,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_ffn4_kernel, H=H, K=K, D=D, bn1=bn1, bn2=bn2,
                          G13=G13, group13=group13, G2=G2, group2=group2,
                          norm_eps=norm_eps, act=act,
                          add_residual=add_residual),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (H2 * K + D * H),
            bytes_accessed=H2 * Kp + D * Hp_tot
                           + 4 * (G13 * H2 + G2 * D),
            transcendentals=B * H,
        ),
        interpret=bool(interpret),
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      x2.astype(jnp.float32),
      norm_w.reshape(L, 1, K),
      x2.astype(jnp.float32),
      gs13.astype(jnp.float32),
      gs2.astype(jnp.float32),
      w13_all, w2_all)
    return out.reshape(x.shape)


@functools.partial(jax.jit, static_argnames=("norm_eps", "act",
                                             "add_residual", "interpret"))
def ffn_l(x: jax.Array, norm_w: jax.Array, w13_all: jax.Array,
          w2_all: jax.Array, layer: jax.Array,
          scale13: jax.Array | None = None,
          scale2: jax.Array | None = None, *,
          norm_eps: float, act: str, add_residual: bool = True,
          interpret: bool | None = None) -> jax.Array:
    """x + W2[layer] @ glu(W13[layer] @ rmsnorm(x, norm_w[layer])).

    x: (dim,) or (B, dim) f32 residual stream(s); returns the updated
    stream(s) with the same shape. The whole batch shares one weight
    stream, exactly like gemm_l.
    w13_all: (L, 2*hidden, dim); w2_all: (L, dim, hidden).

    add_residual=False returns only the W2 product — the row-parallel TP
    form (each shard's hidden slice yields a partial sum psum'd by the
    caller before the residual add).
    """
    L, H2, K = w13_all.shape
    H = H2 // 2
    _, D, _ = w2_all.shape
    squeeze = x.ndim == 1
    x2 = x.reshape(-1, K)
    B = x2.shape[0]
    assert D == K, (x.shape, w13_all.shape, w2_all.shape)
    if interpret is None and _emulate():
        nw = jax.lax.dynamic_index_in_dim(norm_w, layer, keepdims=False)
        xv = x2.astype(jnp.float32)
        ms = jnp.mean(xv * xv, axis=-1, keepdims=True)
        xb = xv * jax.lax.rsqrt(ms + norm_eps) * nw.astype(jnp.float32)
        w13 = jax.lax.dynamic_index_in_dim(w13_all, layer, keepdims=False)
        h13 = jax.lax.dot_general(
            xb.astype(jnp.bfloat16), w13.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if scale13 is not None:
            h13 = h13 * jax.lax.dynamic_index_in_dim(
                scale13, layer, keepdims=False)[None].astype(jnp.float32)
        h1, h3 = h13[:, :H], h13[:, H:]
        if act == "silu":
            g = h1 * jax.nn.sigmoid(h1)
        else:
            g = 0.5 * h1 * (1.0 + jnp.tanh(0.797885 * (h1 + 0.044715 * h1 ** 3)))
        w2 = jax.lax.dynamic_index_in_dim(w2_all, layer, keepdims=False)
        out = jax.lax.dot_general(
            (g * h3).astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if scale2 is not None:
            out = out * jax.lax.dynamic_index_in_dim(
                scale2, layer, keepdims=False)[None].astype(jnp.float32)
        if add_residual:
            out = x2 + out
        return out.reshape(x.shape)
    if interpret is None:
        interpret = False

    bn1, _ = pick_blocks(H2, K, w13_all.dtype.itemsize)
    bn2, _ = pick_blocks(D, H, w2_all.dtype.itemsize)

    has_scale = scale13 is not None
    assert (scale2 is not None) == has_scale, "scale13/scale2 come together"
    extra_in, extra_specs = [], []
    if has_scale:
        extra_in.append(scale13.reshape(L, 1, H2).astype(jnp.float32))
        extra_specs.append(pl.BlockSpec((1, 1, H2), lambda i, sc: (sc[0], 0, 0)))
        extra_in.append(scale2.reshape(L, 1, D).astype(jnp.float32))
        extra_specs.append(pl.BlockSpec((1, 1, D), lambda i, sc: (sc[0], 0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i, sc: (0, 0)),
            pl.BlockSpec((1, 1, K), lambda i, sc: (sc[0], 0, 0)),
            pl.BlockSpec((B, D), lambda i, sc: (0, 0)),
        ] + extra_specs + [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, D), lambda i, sc: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((_DEPTH, bn1, K), w13_all.dtype),
            pltpu.VMEM((_DEPTH, bn2, H), w2_all.dtype),
            pltpu.VMEM((B, H2), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * _DEPTH,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, H=H, K=K, D=D, bn1=bn1, bn2=bn2,
                          norm_eps=norm_eps, act=act,
                          add_residual=add_residual, has_scale=has_scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (H2 * K + D * H),
            bytes_accessed=(H2 * K) * w13_all.dtype.itemsize
                           + (D * H) * w2_all.dtype.itemsize,
            transcendentals=B * H,
        ),
        interpret=bool(interpret),
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      x2.astype(jnp.float32),
      norm_w.reshape(L, 1, K),
      x2.astype(jnp.float32),
      *extra_in,
      w13_all, w2_all)
    return out.reshape(x.shape)
