"""Fully-fused attention block: norm + wqkv GEMV + attention + wo + residual.

ONE Pallas call per layer covers everything the reference spreads over five
kernels (rmsnorm, fused_qkv_matmul_clip, fused_rope_and_cache_update +
rotate_sink_tokens + the attn trio, fused_matmul_add_residuals —
src/infer.cu:526-539, 290-336, 642-697, 338-524, 270-288). Together with
`ffn_l` this brings a dense decode layer down to TWO kernel launches.

Why it pays on TPU: batch-1 decode is pure weight streaming, and the cost
that remains after the round-1 fusions is per-kernel fixed overhead —
launch, pipeline fill/drain — multiplied by ~4 kernels x n_layers. Fusing
the three weight streams (wqkv, KV cache, wo) into one kernel keeps the DMA
engines busy across what used to be kernel boundaries:

- wqkv tiles stream double-buffered (manual DMA like ffn_l) into a GEMV
  against the in-kernel rmsnorm'd activation;
- the fused attention body (ops/pallas/attention.py) writes the new KV row,
  re-rotates sink keys, and flash-attends over the ring buffer with the
  cache aliased in place;
- the first wo tile is prefetched while the last wqkv tile is still in
  flight, and the wo sweep streams against the flattened attention output,
  adding the residual on the way out.

The attention output lives in VMEM as (Hk*P, D) sublane-major rows (P =
sublane-padded q-per-kv-head group); the wo GEMV needs it lane-major
(1, q_dim). Mosaic has no sublane->lane reshape, so the flatten is a
tile-mask-reduce: repeat the rows across Hq lane groups, keep entry
(s, hq*D+d) only where s is hq's padded row, and sum out the sublane axis —
all natively lowerable ops.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gemv import (_bf16, _best_divisor, _emulate, _gemm4_ref, _gemv_ref,
                   dot4_tile, int4_group, pick_blocks)
from .attention import _attn_step_ref, _fused_attn_body
from .ffn import _DEPTH


def _attn_block_kernel(scal_ref, x_ref, nw_ref, *rest,
                       S: int, block_s: int, Hq: int, Hk: int, P: int, D: int,
                       kv_sinks: int, theta: float, rotary_dim: int,
                       norm_eps: float, qkv_clip: float,
                       Nqkv: int, K: int, q_dim: int, bnq: int, bno: int,
                       has_bias: bool, add_residual: bool, has_scale: bool):
    refs = list(rest)
    bias_ref = refs.pop(0) if has_bias else None
    sq_ref = refs.pop(0) if has_scale else None
    so_ref = refs.pop(0) if has_scale else None
    kst = vst = None
    if len(refs) > 21:  # quantized cache: trailing bf16 staging refs
        vst = refs.pop()
        kst = refs.pop()
    (wqkv_hbm, wo_hbm, k_hbm, v_hbm,
     o_ref, ko_hbm, vo_hbm,
     wqkvbuf, wobuf, qkv_ref,
     kbuf, vbuf, newk, newv, m_ref, l_ref, acc_ref, mixbuf,
     wsem, sem, rowsem) = refs

    layer, kv_pos, kv_len, kv_sink, pos = (scal_ref[0], scal_ref[1],
                                           scal_ref[2], scal_ref[3],
                                           scal_ref[4])
    qpk = Hq // Hk
    nq = Nqkv // bnq
    no = K // bno  # wo output dim == K (the residual stream width)

    # ---- in-kernel rmsnorm of the residual stream -----------------------
    xv = x_ref[...].astype(jnp.float32)                       # (1, K)
    ms = jnp.mean(xv * xv, axis=-1, keepdims=True)
    xb = (xv * jax.lax.rsqrt(ms + norm_eps)
          * nw_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)

    def wqkv_dma(slot, blk):
        return pltpu.make_async_copy(
            wqkv_hbm.at[layer, pl.ds(blk * bnq, bnq)], wqkvbuf.at[slot],
            wsem.at[slot])

    def wo_dma(slot, blk):
        return pltpu.make_async_copy(
            wo_hbm.at[layer, pl.ds(blk * bno, bno)], wobuf.at[slot],
            wsem.at[_DEPTH + slot])

    # ---- phase 1: qkv = Wqkv[layer] @ xb, _DEPTH tiles in flight --------
    for d in range(min(_DEPTH, nq)):
        wqkv_dma(d, d).start()

    def p1(blk, _):
        slot = blk % _DEPTH
        wqkv_dma(slot, blk).wait()
        y = jax.lax.dot_general(
            xb, _bf16(wqkvbuf[slot]),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if has_scale:
            y = y * sq_ref[0, :, pl.ds(blk * bnq, bnq)]
        qkv_ref[:, pl.ds(blk * bnq, bnq)] = y

        # slot consumed; refill it _DEPTH tiles ahead
        @pl.when(blk + _DEPTH < nq)
        def _():
            wqkv_dma(slot, blk + _DEPTH).start()

        # prefetch the first wo tile behind the last wqkv tile: the wo sweep
        # starts hot even when the attention phase is short
        @pl.when(blk + _DEPTH == nq)
        def _():
            wo_dma(0, 0).start()
        return 0

    jax.lax.fori_loop(0, nq, p1, 0)
    if nq < _DEPTH:
        wo_dma(0, 0).start()

    qkv = qkv_ref[...]                                        # (1, Nqkv) f32
    if has_bias:
        qkv = qkv + bias_ref[0].astype(jnp.float32)
    if not math.isinf(qkv_clip):
        qkv = jnp.clip(qkv, -qkv_clip, qkv_clip)

    # ---- split q/k/v out of the lane-major qkv row ----------------------
    # q rows regrouped (kv-head-major, sublane-padded to P) for _flash_heads;
    # all slices are static 128-multiple lane offsets.
    zrow = jnp.zeros((1, D), jnp.float32)
    qrows = []
    for g in range(Hk):
        for r in range(P):
            hq = g * qpk + r
            qrows.append(qkv[:, hq * D:(hq + 1) * D] if r < qpk else zrow)
    q2 = jnp.concatenate(qrows, axis=0)                       # (Hk*P, D)
    knew = jnp.concatenate(
        [qkv[:, q_dim + h * D: q_dim + (h + 1) * D] for h in range(Hk)],
        axis=0)                                               # (Hk, D)
    kv_off = q_dim + Hk * D
    vnew = jnp.concatenate(
        [qkv[:, kv_off + h * D: kv_off + (h + 1) * D] for h in range(Hk)],
        axis=0)                                               # (Hk, D)

    # ---- phase 2: RoPE + cache write + lazy sinks + flash attention -----
    _fused_attn_body((layer,), q2, knew, vnew, ko_hbm, vo_hbm, mixbuf,
                     kbuf, vbuf, newk, newv, m_ref, l_ref, acc_ref,
                     sem, rowsem, S=S, block_s=block_s, Hk=Hk, P=P,
                     kv_sinks=kv_sinks, theta=theta, rotary_dim=rotary_dim,
                     kv_pos=kv_pos, kv_len=kv_len, kv_sink=kv_sink, pos=pos,
                     kst=kst, vst=vst)

    # ---- flatten (Hk*P, D) sublane-major -> (1, q_dim) lane-major -------
    mix = mixbuf[...]
    tiled = pltpu.repeat(mix, Hq, 1)                          # (Hk*P, Hq*D)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, tiled.shape, 0)
    hq_idx = jax.lax.broadcasted_iota(jnp.int32, tiled.shape, 1) // D
    target = (hq_idx // qpk) * P + (hq_idx % qpk)
    mixl = jnp.sum(jnp.where(s_idx == target, tiled, 0.0),
                   axis=0, keepdims=True)                     # (1, q_dim)
    mixb = mixl.astype(jnp.bfloat16)

    # ---- phase 3: out = Wo[layer] @ mix + residual ----------------------
    # tile 0 was prefetched during phase 1; top the pipeline up now
    for d in range(1, min(_DEPTH, no)):
        wo_dma(d, d).start()

    def p3(blk, _):
        slot = blk % _DEPTH
        wo_dma(slot, blk).wait()
        y = jax.lax.dot_general(
            mixb, _bf16(wobuf[slot]),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if has_scale:
            y = y * so_ref[0, :, pl.ds(blk * bno, bno)]
        if add_residual:
            y = y + x_ref[:, pl.ds(blk * bno, bno)]
        o_ref[:, pl.ds(blk * bno, bno)] = y

        @pl.when(blk + _DEPTH < no)
        def _():
            wo_dma(slot, blk + _DEPTH).start()
        return 0

    jax.lax.fori_loop(0, no, p3, 0)


def _attn_block4_kernel(scal_ref, x_ref, nw_ref, *rest,
                        S: int, block_s: int, Hq: int, Hk: int, P: int, D: int,
                        kv_sinks: int, theta: float, rotary_dim: int,
                        norm_eps: float, qkv_clip: float,
                        Nqkv: int, K: int, q_dim: int, bnq: int, bno: int,
                        GK: int, groupK: int, Gq: int, groupq: int,
                        has_bias: bool, add_residual: bool):
    """Packed-int4 variant of _attn_block_kernel: the wqkv and wo sweeps
    stream HALF the bytes and dequantize per group via dot4_tile; the
    attention body is shared verbatim."""
    refs = list(rest)
    bias_ref = refs.pop(0) if has_bias else None
    sq_ref = refs.pop(0)
    so_ref = refs.pop(0)
    kst = vst = None
    if len(refs) > 21:  # quantized cache: trailing bf16 staging refs
        vst = refs.pop()
        kst = refs.pop()
    (wqkv_hbm, wo_hbm, k_hbm, v_hbm,
     o_ref, ko_hbm, vo_hbm,
     wqkvbuf, wobuf, qkv_ref,
     kbuf, vbuf, newk, newv, m_ref, l_ref, acc_ref, mixbuf,
     wsem, sem, rowsem) = refs

    layer, kv_pos, kv_len, kv_sink, pos = (scal_ref[0], scal_ref[1],
                                           scal_ref[2], scal_ref[3],
                                           scal_ref[4])
    qpk = Hq // Hk
    nq = Nqkv // bnq
    no = K // bno
    KpK, Kpq = groupK // 2, groupq // 2

    xv = x_ref[...].astype(jnp.float32)                       # (1, K)
    ms = jnp.mean(xv * xv, axis=-1, keepdims=True)
    xb = (xv * jax.lax.rsqrt(ms + norm_eps)
          * nw_ref[0].astype(jnp.float32)).astype(jnp.bfloat16)

    def wqkv_dma(slot, blk):
        return pltpu.make_async_copy(
            wqkv_hbm.at[layer, pl.ds(blk * bnq, bnq)], wqkvbuf.at[slot],
            wsem.at[slot])

    def wo_dma(slot, blk):
        return pltpu.make_async_copy(
            wo_hbm.at[layer, pl.ds(blk * bno, bno)], wobuf.at[slot],
            wsem.at[_DEPTH + slot])

    # ---- phase 1: qkv = dequant4(Wqkv[layer]) @ xb ----------------------
    for d in range(min(_DEPTH, nq)):
        wqkv_dma(d, d).start()

    def p1(blk, _):
        slot = blk % _DEPTH
        wqkv_dma(slot, blk).wait()
        y = dot4_tile(
            xb,
            lambda g: wqkvbuf[slot, :, g * KpK:(g + 1) * KpK],
            lambda g: sq_ref[0, g, pl.ds(blk * bnq, bnq)],
            GK, groupK)
        qkv_ref[:, pl.ds(blk * bnq, bnq)] = y

        @pl.when(blk + _DEPTH < nq)
        def _():
            wqkv_dma(slot, blk + _DEPTH).start()

        @pl.when(blk + _DEPTH == nq)
        def _():
            wo_dma(0, 0).start()
        return 0

    jax.lax.fori_loop(0, nq, p1, 0)
    if nq < _DEPTH:
        wo_dma(0, 0).start()

    qkv = qkv_ref[...]                                        # (1, Nqkv) f32
    if has_bias:
        qkv = qkv + bias_ref[0].astype(jnp.float32)
    if not math.isinf(qkv_clip):
        qkv = jnp.clip(qkv, -qkv_clip, qkv_clip)

    zrow = jnp.zeros((1, D), jnp.float32)
    qrows = []
    for g in range(Hk):
        for r in range(P):
            hq = g * qpk + r
            qrows.append(qkv[:, hq * D:(hq + 1) * D] if r < qpk else zrow)
    q2 = jnp.concatenate(qrows, axis=0)                       # (Hk*P, D)
    knew = jnp.concatenate(
        [qkv[:, q_dim + h * D: q_dim + (h + 1) * D] for h in range(Hk)],
        axis=0)                                               # (Hk, D)
    kv_off = q_dim + Hk * D
    vnew = jnp.concatenate(
        [qkv[:, kv_off + h * D: kv_off + (h + 1) * D] for h in range(Hk)],
        axis=0)                                               # (Hk, D)

    # ---- phase 2: RoPE + cache write + lazy sinks + flash attention -----
    _fused_attn_body((layer,), q2, knew, vnew, ko_hbm, vo_hbm, mixbuf,
                     kbuf, vbuf, newk, newv, m_ref, l_ref, acc_ref,
                     sem, rowsem, S=S, block_s=block_s, Hk=Hk, P=P,
                     kv_sinks=kv_sinks, theta=theta, rotary_dim=rotary_dim,
                     kv_pos=kv_pos, kv_len=kv_len, kv_sink=kv_sink, pos=pos,
                     kst=kst, vst=vst)

    # ---- flatten (Hk*P, D) sublane-major -> (1, q_dim) lane-major -------
    mix = mixbuf[...]
    tiled = pltpu.repeat(mix, Hq, 1)                          # (Hk*P, Hq*D)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, tiled.shape, 0)
    hq_idx = jax.lax.broadcasted_iota(jnp.int32, tiled.shape, 1) // D
    target = (hq_idx // qpk) * P + (hq_idx % qpk)
    mixl = jnp.sum(jnp.where(s_idx == target, tiled, 0.0),
                   axis=0, keepdims=True)                     # (1, q_dim)
    mixb = mixl.astype(jnp.bfloat16)

    # ---- phase 3: out = dequant4(Wo[layer]) @ mix + residual ------------
    for d in range(1, min(_DEPTH, no)):
        wo_dma(d, d).start()

    def p3(blk, _):
        slot = blk % _DEPTH
        wo_dma(slot, blk).wait()
        y = dot4_tile(
            mixb,
            lambda g: wobuf[slot, :, g * Kpq:(g + 1) * Kpq],
            lambda g: so_ref[0, g, pl.ds(blk * bno, bno)],
            Gq, groupq)
        if add_residual:
            y = y + x_ref[:, pl.ds(blk * bno, bno)]
        o_ref[:, pl.ds(blk * bno, bno)] = y

        @pl.when(blk + _DEPTH < no)
        def _():
            wo_dma(slot, blk + _DEPTH).start()
        return 0

    jax.lax.fori_loop(0, no, p3, 0)


def _block4_tiles(Nqkv: int, K: int, q_dim: int,
                  quant_cache: bool) -> tuple[int, int]:
    import os
    tile_bytes = int(os.environ.get("YALM_GEMV_TILE_BYTES", 2 << 20))
    bnq = _best_divisor(Nqkv, target=max(128, tile_bytes // (K // 2)),
                        align=128)
    bno = _best_divisor(K, target=max(128, tile_bytes // (q_dim // 2)),
                        align=128)
    if quant_cache:
        # quantized cache adds bf16 staging; halve the weight tiles to stay
        # inside scoped VMEM (mirrors attn_block_l's rule)
        if bnq % 256 == 0:
            bnq //= 2
        if bno % 256 == 0:
            bno //= 2
    return bnq, bno


def attn_block4_dims_supported(dim: int, q_dim: int, kv_dim: int,
                               head_dim: int, max_seq_len: int) -> bool:
    """int4 attention block: packed tiles always span full K (contiguous
    rows); needs whole groups on both sweeps and lane-aligned heads."""
    Nqkv = q_dim + 2 * kv_dim
    bnq, bno = _block4_tiles(Nqkv, dim, q_dim, True)
    return (head_dim % 128 == 0
            and max_seq_len % 8 == 0
            and dim % 256 == 0 and q_dim % 256 == 0
            and Nqkv % bnq == 0 and bnq % 128 == 0
            and dim % bno == 0 and bno % 128 == 0)


def attn_block4_supported(cfg) -> bool:
    return attn_block4_dims_supported(cfg.dim, cfg.q_dim, cfg.kv_dim,
                                      cfg.head_dim, cfg.max_seq_len)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "kv_sinks", "theta",
                                    "rotary_dim", "norm_eps", "qkv_clip",
                                    "add_residual", "block_s", "interpret"))
def attn_block4_l(x: jax.Array, norm_w: jax.Array, wqkv_all: jax.Array,
                  wo_all: jax.Array, k_all: jax.Array, v_all: jax.Array,
                  layer: jax.Array, kv_pos: jax.Array, kv_len: jax.Array,
                  kv_sink: jax.Array, pos: jax.Array, *,
                  scale_qkv: jax.Array, scale_o: jax.Array,
                  n_heads: int, kv_sinks: int, theta: float, rotary_dim: int,
                  norm_eps: float, qkv_clip: float = float("inf"),
                  bqkv_all: jax.Array | None = None,
                  add_residual: bool = True,
                  block_s: int = 0, interpret: bool | None = None
                  ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """attn_block_l over PACKED INT4 weights: x + deq4(Wo[layer]) @
    attend(rope(deq4(Wqkv[layer]) @ rmsnorm(x))) in one kernel, with both
    weight sweeps at half the int8/fp8 bytes.

    wqkv_all: (L, Nqkv, dim//2) planar-packed uint8; wo_all:
    (L, dim, q_dim//2). scale_qkv: (L, dim//group(dim), Nqkv) f32 group
    scales; scale_o: (L, q_dim//group(q_dim), dim). Everything else matches
    attn_block_l.
    """
    L, S, Hk, D = k_all.shape
    Lw, Nqkv, Kp = wqkv_all.shape
    K = 2 * Kp
    _, Dout, qp = wo_all.shape
    q_dim = 2 * qp
    Hq = n_heads
    qpk = Hq // Hk
    assert x.shape == (K,) and Dout == K and q_dim == Hq * D, (
        x.shape, wqkv_all.shape, wo_all.shape, k_all.shape)
    assert Nqkv == q_dim + 2 * Hk * D
    groupK, groupq = int4_group(K), int4_group(q_dim)
    GK, Gq = K // groupK, q_dim // groupq
    assert scale_qkv.shape == (L, GK, Nqkv), (scale_qkv.shape, (L, GK, Nqkv))
    assert scale_o.shape == (L, Gq, K), (scale_o.shape, (L, Gq, K))

    if interpret is None and _emulate():
        nw = jax.lax.dynamic_index_in_dim(norm_w, layer, keepdims=False)
        xv = x.astype(jnp.float32)
        ms = jnp.mean(xv * xv)
        xb = xv * jax.lax.rsqrt(ms + norm_eps) * nw.astype(jnp.float32)
        qkv = _gemm4_ref(
            xb.reshape(1, K),
            jax.lax.dynamic_index_in_dim(wqkv_all, layer, keepdims=False),
            jax.lax.dynamic_index_in_dim(scale_qkv, layer, keepdims=False),
            groupK).reshape(Nqkv)
        if bqkv_all is not None:
            qkv = qkv + jax.lax.dynamic_index_in_dim(
                bqkv_all, layer, keepdims=False).astype(jnp.float32)
        if not math.isinf(qkv_clip):
            qkv = jnp.clip(qkv, -qkv_clip, qkv_clip)
        q2 = qkv[:q_dim].reshape(Hk * qpk, D)
        knew = qkv[q_dim:q_dim + Hk * D].reshape(Hk, D)
        vnew = qkv[q_dim + Hk * D:].reshape(Hk, D)
        mix, k_all, v_all = _attn_step_ref(
            q2, knew, vnew, k_all, v_all, layer, kv_pos, kv_len, kv_sink,
            pos, kv_sinks=kv_sinks, theta=theta, rotary_dim=rotary_dim)
        out = _gemm4_ref(
            mix.reshape(1, q_dim),
            jax.lax.dynamic_index_in_dim(wo_all, layer, keepdims=False),
            jax.lax.dynamic_index_in_dim(scale_o, layer, keepdims=False),
            groupq).reshape(K)
        if add_residual:
            out = x + out
        return out, k_all, v_all

    if not block_s:
        block_s = S
        for cand in (512, 256, 128, 64, 32, 16, 8):
            if S % cand == 0:
                block_s = cand
                break
    bnq, bno = _block4_tiles(Nqkv, K, q_dim, k_all.dtype.itemsize == 1)
    assert Nqkv % bnq == 0 and K % bno == 0
    P = max(8, ((qpk + 7) // 8) * 8)
    if interpret is None:
        interpret = False

    has_bias = bqkv_all is not None
    extra_in, extra_specs = [], []
    if has_bias:
        extra_in.append(bqkv_all.reshape(L, 1, Nqkv).astype(jnp.float32))
        extra_specs.append(
            pl.BlockSpec((1, 1, Nqkv), lambda i, sc: (sc[0], 0, 0)))
    extra_in.append(scale_qkv.astype(jnp.float32))
    extra_specs.append(
        pl.BlockSpec((1, GK, Nqkv), lambda i, sc: (sc[0], 0, 0)))
    extra_in.append(scale_o.astype(jnp.float32))
    extra_specs.append(
        pl.BlockSpec((1, Gq, K), lambda i, sc: (sc[0], 0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, K), lambda i, sc: (0, 0)),
            pl.BlockSpec((1, 1, K), lambda i, sc: (sc[0], 0, 0)),
        ] + extra_specs + [
            pl.BlockSpec(memory_space=pl.ANY),   # wqkv (packed)
            pl.BlockSpec(memory_space=pl.ANY),   # wo (packed)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # k cache
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # v cache
        ],
        out_specs=[
            pl.BlockSpec((1, K), lambda i, sc: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_DEPTH, bnq, Kp), jnp.uint8),
            pltpu.VMEM((_DEPTH, bno, qp), jnp.uint8),
            pltpu.VMEM((1, Nqkv), jnp.float32),
            pltpu.VMEM((2, block_s, Hk, D), k_all.dtype),
            pltpu.VMEM((2, block_s, Hk, D), v_all.dtype),
            pltpu.VMEM((Hk, D), k_all.dtype),
            pltpu.VMEM((Hk, D), v_all.dtype),
            pltpu.VMEM((Hk * P, 128), jnp.float32),
            pltpu.VMEM((Hk * P, 128), jnp.float32),
            pltpu.VMEM((Hk * P, D), jnp.float32),
            pltpu.VMEM((Hk * P, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * _DEPTH,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ] + ([pltpu.VMEM((block_s, Hk, D), jnp.bfloat16),
              pltpu.VMEM((block_s, Hk, D), jnp.bfloat16)]
             if k_all.dtype.itemsize == 1 else []),
    )

    # operand numbering for aliasing includes the scalar-prefetch arg (0)
    k_idx = 3 + (1 if has_bias else 0) + 2 + 2
    scal = jnp.stack([jnp.asarray(layer, jnp.int32),
                      jnp.asarray(kv_pos, jnp.int32),
                      jnp.asarray(kv_len, jnp.int32),
                      jnp.asarray(kv_sink, jnp.int32),
                      jnp.asarray(pos, jnp.int32)])
    out, k_out, v_out = pl.pallas_call(
        functools.partial(
            _attn_block4_kernel, S=S, block_s=block_s, Hq=Hq, Hk=Hk, P=P,
            D=D, kv_sinks=kv_sinks, theta=theta, rotary_dim=rotary_dim,
            norm_eps=norm_eps, qkv_clip=qkv_clip, Nqkv=Nqkv, K=K,
            q_dim=q_dim, bnq=bnq, bno=bno, GK=GK, groupK=groupK, Gq=Gq,
            groupq=groupq, has_bias=has_bias, add_residual=add_residual),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={k_idx: 1, k_idx + 1: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (Nqkv * K + K * q_dim) + 4 * S * Hk * P * D,
            bytes_accessed=(Nqkv * Kp + K * qp
                            + 2 * S * Hk * D * k_all.dtype.itemsize),
            transcendentals=S * Hk * P,
        ),
        interpret=bool(interpret),
    )(scal, x.reshape(1, K).astype(jnp.float32),
      norm_w.reshape(L, 1, K), *extra_in,
      wqkv_all, wo_all, k_all, v_all)
    return out.reshape(K), k_out, v_out


def attn_block_dims_supported(dim: int, q_dim: int, kv_dim: int,
                              head_dim: int, max_seq_len: int,
                              itemsize: int) -> bool:
    """Both weight sweeps need full-K tiles (one contiguous HBM range per
    tile) and the attention body needs lane-aligned heads. Dims may be the
    full model's or a tensor-parallel shard's."""
    bnq, bkq = pick_blocks(q_dim + 2 * kv_dim, dim, itemsize)
    bno, bko = pick_blocks(dim, q_dim, itemsize)
    return (head_dim % 128 == 0
            and max_seq_len % 8 == 0
            and bkq == dim and bko == q_dim
            and (q_dim + 2 * kv_dim) % bnq == 0
            and dim % bno == 0)


def attn_block_supported(cfg, itemsize: int) -> bool:
    return attn_block_dims_supported(cfg.dim, cfg.q_dim, cfg.kv_dim,
                                     cfg.head_dim, cfg.max_seq_len, itemsize)


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "kv_sinks", "theta",
                                    "rotary_dim", "norm_eps", "qkv_clip",
                                    "add_residual", "block_s", "interpret"))
def attn_block_l(x: jax.Array, norm_w: jax.Array, wqkv_all: jax.Array,
                 wo_all: jax.Array, k_all: jax.Array, v_all: jax.Array,
                 layer: jax.Array, kv_pos: jax.Array, kv_len: jax.Array,
                 kv_sink: jax.Array, pos: jax.Array, *,
                 n_heads: int, kv_sinks: int, theta: float, rotary_dim: int,
                 norm_eps: float, qkv_clip: float = float("inf"),
                 bqkv_all: jax.Array | None = None, add_residual: bool = True,
                 scale_qkv: jax.Array | None = None,
                 scale_o: jax.Array | None = None,
                 block_s: int = 0, interpret: bool | None = None
                 ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """x + Wo[layer] @ attend(rope(Wqkv[layer] @ rmsnorm(x))) in one kernel.

    x: (dim,) f32 residual stream. norm_w: (L, dim). wqkv_all: (L, q_dim +
    2*kv_dim, dim). wo_all: (L, dim, q_dim). k_all/v_all: (L, S, Hk, D)
    ring-buffer caches, aliased in place. bqkv_all: optional (L, Nqkv) f32
    qkv bias. Returns (updated stream (dim,), k_all, v_all).

    add_residual=False returns only Wo @ mix — the row-parallel TP form
    where each shard's partial product is psum'd before the caller adds the
    residual (Megatron wo split; nothing comparable in the single-device
    reference, src/model.cpp:385-386).
    """
    L, S, Hk, D = k_all.shape
    Lw, Nqkv, K = wqkv_all.shape
    _, Dout, q_dim = wo_all.shape
    Hq = n_heads
    qpk = Hq // Hk
    assert x.shape == (K,) and Dout == K and q_dim == Hq * D, (
        x.shape, wqkv_all.shape, wo_all.shape, k_all.shape)
    assert Nqkv == q_dim + 2 * Hk * D

    if interpret is None and _emulate():
        nw = jax.lax.dynamic_index_in_dim(norm_w, layer, keepdims=False)
        xv = x.astype(jnp.float32)
        ms = jnp.mean(xv * xv)
        xb = xv * jax.lax.rsqrt(ms + norm_eps) * nw.astype(jnp.float32)
        qkv = _gemv_ref(xb, jax.lax.dynamic_index_in_dim(
            wqkv_all, layer, keepdims=False),
            jax.lax.dynamic_index_in_dim(scale_qkv, layer, keepdims=False)
            if scale_qkv is not None else None)
        if bqkv_all is not None:
            qkv = qkv + jax.lax.dynamic_index_in_dim(
                bqkv_all, layer, keepdims=False).astype(jnp.float32)
        if not math.isinf(qkv_clip):
            qkv = jnp.clip(qkv, -qkv_clip, qkv_clip)
        q2 = qkv[:q_dim].reshape(Hk * qpk, D)
        knew = qkv[q_dim:q_dim + Hk * D].reshape(Hk, D)
        vnew = qkv[q_dim + Hk * D:].reshape(Hk, D)
        mix, k_all, v_all = _attn_step_ref(
            q2, knew, vnew, k_all, v_all, layer, kv_pos, kv_len, kv_sink,
            pos, kv_sinks=kv_sinks, theta=theta, rotary_dim=rotary_dim)
        out = _gemv_ref(mix.reshape(q_dim), jax.lax.dynamic_index_in_dim(
            wo_all, layer, keepdims=False),
            jax.lax.dynamic_index_in_dim(scale_o, layer, keepdims=False)
            if scale_o is not None else None)
        if add_residual:
            out = x + out
        return out, k_all, v_all

    if not block_s:
        block_s = S
        for cand in (512, 256, 128, 64, 32, 16, 8):
            if S % cand == 0:
                block_s = cand
                break
    bnq, bkq = pick_blocks(Nqkv, K, wqkv_all.dtype.itemsize)
    bno, bko = pick_blocks(K, q_dim, wo_all.dtype.itemsize)
    if k_all.dtype.itemsize == 1:
        # quantized cache adds 2x block_s*Hk*D bf16 staging; halve the
        # weight tiles instead of the KV block (1 MB tiles still stream at
        # full rate, and attention at block_s 512 measures faster) to stay
        # inside the 16 MB scoped-VMEM limit at 7B scale
        if bnq % 2 == 0 and (Nqkv // bnq) % 1 == 0 and bnq > 128:
            bnq //= 2
        if bno % 2 == 0 and bno > 128:
            bno //= 2
    assert bkq == K and bko == q_dim, "attn_block_l needs full-K weight tiles"
    assert Nqkv % bnq == 0 and K % bno == 0
    P = max(8, ((qpk + 7) // 8) * 8)
    if interpret is None:
        interpret = False

    has_bias = bqkv_all is not None
    has_scale = scale_qkv is not None
    assert (scale_o is not None) == has_scale, "scale_qkv/scale_o come together"
    extra_in, extra_specs = [], []
    if has_bias:
        extra_in.append(bqkv_all.reshape(L, 1, Nqkv).astype(jnp.float32))
        extra_specs.append(
            pl.BlockSpec((1, 1, Nqkv), lambda i, sc: (sc[0], 0, 0)))
    if has_scale:
        extra_in.append(scale_qkv.reshape(L, 1, Nqkv).astype(jnp.float32))
        extra_specs.append(
            pl.BlockSpec((1, 1, Nqkv), lambda i, sc: (sc[0], 0, 0)))
        extra_in.append(scale_o.reshape(L, 1, K).astype(jnp.float32))
        extra_specs.append(
            pl.BlockSpec((1, 1, K), lambda i, sc: (sc[0], 0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, K), lambda i, sc: (0, 0)),
            pl.BlockSpec((1, 1, K), lambda i, sc: (sc[0], 0, 0)),
        ] + extra_specs + [
            pl.BlockSpec(memory_space=pl.ANY),   # wqkv
            pl.BlockSpec(memory_space=pl.ANY),   # wo
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # k cache
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),   # v cache
        ],
        out_specs=[
            pl.BlockSpec((1, K), lambda i, sc: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_DEPTH, bnq, K), wqkv_all.dtype),
            pltpu.VMEM((_DEPTH, bno, q_dim), wo_all.dtype),
            pltpu.VMEM((1, Nqkv), jnp.float32),
            pltpu.VMEM((2, block_s, Hk, D), k_all.dtype),
            pltpu.VMEM((2, block_s, Hk, D), v_all.dtype),
            pltpu.VMEM((Hk, D), k_all.dtype),
            pltpu.VMEM((Hk, D), v_all.dtype),
            pltpu.VMEM((Hk * P, 128), jnp.float32),
            pltpu.VMEM((Hk * P, 128), jnp.float32),
            pltpu.VMEM((Hk * P, D), jnp.float32),
            pltpu.VMEM((Hk * P, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * _DEPTH,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ] + ([pltpu.VMEM((block_s, Hk, D), jnp.bfloat16),
              pltpu.VMEM((block_s, Hk, D), jnp.bfloat16)]
             if k_all.dtype.itemsize == 1 else []),
    )

    # operand numbering for aliasing includes the scalar-prefetch arg (0)
    k_idx = 3 + (1 if has_bias else 0) + (2 if has_scale else 0) + 2
    scal = jnp.stack([jnp.asarray(layer, jnp.int32),
                      jnp.asarray(kv_pos, jnp.int32),
                      jnp.asarray(kv_len, jnp.int32),
                      jnp.asarray(kv_sink, jnp.int32),
                      jnp.asarray(pos, jnp.int32)])
    out, k_out, v_out = pl.pallas_call(
        functools.partial(
            _attn_block_kernel, S=S, block_s=block_s, Hq=Hq, Hk=Hk, P=P, D=D,
            kv_sinks=kv_sinks, theta=theta, rotary_dim=rotary_dim,
            norm_eps=norm_eps, qkv_clip=qkv_clip, Nqkv=Nqkv, K=K,
            q_dim=q_dim, bnq=bnq, bno=bno, has_bias=has_bias,
            add_residual=add_residual, has_scale=has_scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={k_idx: 1, k_idx + 1: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (Nqkv * K + K * q_dim) + 4 * S * Hk * P * D,
            bytes_accessed=(Nqkv * K * wqkv_all.dtype.itemsize
                            + K * q_dim * wo_all.dtype.itemsize
                            + 2 * S * Hk * D * k_all.dtype.itemsize),
            transcendentals=S * Hk * P,
        ),
        interpret=bool(interpret),
    )(scal, x.reshape(1, K).astype(jnp.float32),
      norm_w.reshape(L, 1, K), *extra_in,
      wqkv_all, wo_all, k_all, v_all)
    return out.reshape(K), k_out, v_out
