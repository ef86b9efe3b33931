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

from ..core import rope_mscale, rope_pair_freqs, rope_rotation_param
from .gemv import _bf16, _emulate

_NEG_INF = -1e30


def _attend_ref(q2: jax.Array, k: jax.Array, v: jax.Array,
                kv_len: jax.Array, softcap: float = 0.0,
                extra_valid: jax.Array | None = None) -> jax.Array:
    """jnp emulation with the kernel's numerics (bf16 dots, f32 softmax).

    q2: (rows, D) pre-scaled; k/v: (S, Hk, D) one layer; rows = Hk * P.
    extra_valid: optional (S,) bool ANDed into the slot mask (sliding
    window). Returns (rows, D) f32. Off-TPU default — see gemv._emulate.
    """
    S, Hk, D = k.shape
    P = q2.shape[0] // Hk
    q3 = q2.reshape(Hk, P, D).astype(jnp.bfloat16)
    scores = jnp.einsum("gpd,sgd->gps", q3, k.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    if softcap:
        scores = softcap * jnp.tanh(scores / softcap)
    valid = (jnp.arange(S) < kv_len)[None, None, :]
    if extra_valid is not None:
        valid = valid & extra_valid[None, None, :]
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
    slot_idx = s * block_s + jax.lax.broadcasted_iota(
        jnp.int32, (p_rows, block_s), 1)
    _flash_heads(q_ref[...], k_ref, v_ref, 0, slot_idx < kv_len,
                 m_ref, l_ref, oacc_ref, n_kv_heads, p_rows)

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
    """Shapes the kernel can tile: head_dim must be a lane-group multiple
    (Mosaic rejects 64-wide slices of 128-tiled VMEM scratch), window
    splittable into sublane-aligned blocks."""
    return (cfg.head_dim % 128 == 0
            and cfg.max_seq_len % 8 == 0 and cfg.max_seq_len >= 8)




def _flash_heads(q_rot, kbuf, vbuf, slot, valid, m_ref, l_ref, acc_ref,
                 Hk: int, P: int, softcap: float = 0.0):
    """One KV block's online-softmax update for every kv head (shared by all
    fused attention kernels; accumulators live in VMEM scratch refs).
    slot=None means kbuf/vbuf are 3-D (block_s, Hk, D) refs (the bf16
    staging buffers of a quantized cache) instead of 4-D slot buffers.
    softcap != 0 applies Gemma2's cap*tanh(s/cap) to the scaled scores
    BEFORE the validity mask (masked slots must stay -inf, not -cap)."""
    for h in range(Hk):
        r0 = h * P  # python-static row offset, P is a sublane multiple
        qh = q_rot[r0:r0 + P, :]
        kh = kbuf[slot, :, h, :] if slot is not None else kbuf[:, h, :]
        vh = vbuf[slot, :, h, :] if slot is not None else vbuf[:, h, :]
        sh = jax.lax.dot_general(
            qh.astype(jnp.bfloat16), _bf16(kh),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if softcap:
            sh = softcap * jnp.tanh(sh * (1.0 / softcap))
        sh = jnp.where(valid, sh, _NEG_INF)
        m_prev = m_ref[r0:r0 + P, 0:1]
        l_prev = l_ref[r0:r0 + P, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(sh, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(sh - m_new)
        ob = jax.lax.dot_general(
            p.astype(jnp.bfloat16), _bf16(vh),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_ref[r0:r0 + P, 0:1] = m_new
        l_ref[r0:r0 + P, 0:1] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[r0:r0 + P, :] = acc_ref[r0:r0 + P, :] * alpha + ob


def _slot_age(slot_idx, kv_pos, kv_sink, S: int):
    """Age (pos - held position) of each absolute cache slot, valid in both
    regimes: linear (kv_sink=0, kv_pos=pos -> pos - s) and ring
    ((kv_pos - s) mod (S - kv_sink)); the rotated sink view sits at age
    S-1-s. Used for Gemma2/3 sliding-window masking (age < window)."""
    m = jnp.maximum(S - kv_sink, 1)
    return jnp.where(slot_idx < kv_sink, S - 1 - slot_idx,
                     jnp.mod(kv_pos - slot_idx, m))


def _lazy_sink_rotate(kbuf, slot, rot, kv_sink, *, kv_sinks, theta,
                      rotary_dim, alt=None):
    """Rotate the first kv_sink sink rows of the fetched block 0 IN VMEM by
    the accumulated offset `rot` (StreamingLLM lazy view — the HBM cache
    keeps sink keys as originally written; see _attn_step_ref). slot=None
    addresses a 3-D staging ref (quantized caches)."""
    for r in range(kv_sinks):
        at = (slot, r) if slot is not None else (r,)
        rowf = kbuf[at].astype(jnp.float32)
        # rotation of already-written (already-mscaled) keys: mscale off
        rowr = _rot_lanes(rowf, rope_rotation_param(theta), rotary_dim, rot,
                          alt)

        @pl.when(r < kv_sink)
        def _(rowr=rowr):
            kbuf[at] = rowr.astype(kbuf.dtype)


def _fused_attn_body(idx, q_in, knew_in, vnew_in, ko_hbm, vo_hbm, o_out,
                     kbuf, vbuf, newk, newv, m_ref, l_ref, acc_ref,
                     sem, rowsem, *, S, block_s, Hk, P, kv_sinks, theta,
                     rotary_dim, kv_pos, kv_len, kv_sink, pos,
                     do_write=True, kst=None, vst=None,
                     softcap: float = 0.0, win=None, alt=None):
    """The whole fused step: in-kernel RoPE, kv-row write, lazy sink
    rotation, and double-buffered flash attention. `idx` is the HBM index
    prefix for this lane's cache (e.g. (layer,) or (b, layer)).

    The new-row HBM write is issued asynchronously and only drained at the
    end of the body: the flash loop never waits on it because any block it
    fetches that overlaps the written row gets PATCHED in VMEM with the
    same values. Write-lands-before-fetch and write-lands-after-fetch are
    therefore both correct.

    Sink keys are NEVER rewritten in HBM (the reference mutates them by one
    position per step, src/infer.cpp:303-317): the cache stores them as
    originally written and attention rotates the fetched copy forward by
    the accumulated offset max(0, pos - S + 1) — mathematically identical,
    numerically better (no per-step cache-dtype round-trips, which matters
    for quantized caches), and one less serial HBM read-modify-write per
    layer per step.

    do_write (traced bool or python True) gates EVERY cache mutation: a
    False lane computes attention read-only — the continuous-batching tick
    uses this so lanes mid-admission (chunked prefill owns their cache) can
    ride the batched step without corruption. The lazy sink VIEW applies to
    read-only lanes too (it is part of attention, not a mutation).

    kst/vst: bf16 staging refs (block_s, Hk, D), REQUIRED when the cache
    dtype is 1-byte (fp8 quantized KV). Packed sub-byte tiling rejects the
    per-head / per-row sub-tile slices the flash path needs, so each
    fetched block is widened once to bf16 (the same VPU convert the fp8
    WEIGHT kernels do per tile, proven faster than the HBM stream) and all
    patches/flash reads hit the staging copy. HBM traffic stays at
    1 byte/element — halving decode's cache-bound tail vs bf16.
    """
    D = q_in.shape[-1]
    n_blocks = S // block_s
    static_write = do_write is True
    wr = jnp.bool_(True) if static_write else do_write

    # RoPE fused in: rotate q (pre-softmax-scaled) and the new k row at the
    # current position (reference fused_rope_and_cache_update,
    # src/infer.cu:642-677)
    q_rot = _rot_lanes(q_in.astype(jnp.float32), theta, rotary_dim,
                       pos.astype(jnp.float32), alt) * (1.0 / math.sqrt(D))
    k_rot = _rot_lanes(knew_in.astype(jnp.float32).reshape(Hk, D),
                       theta, rotary_dim, pos.astype(jnp.float32), alt)
    kdt = k_rot.astype(newk.dtype)             # the exact bits HBM will hold
    vdt = vnew_in.astype(newv.dtype).reshape(Hk, D)
    sink_rot = jnp.maximum(pos - S + 1, 0).astype(jnp.float32)

    @pl.when(wr)
    def _():
        newk[...] = kdt
        pltpu.make_async_copy(newk, ko_hbm.at[(*idx, kv_pos)],
                              rowsem.at[0]).start()
        newv[...] = vdt
        pltpu.make_async_copy(newv, vo_hbm.at[(*idx, kv_pos)],
                              rowsem.at[1]).start()

    # flash attention over the ring buffer (fetches race the row write
    # above; the affected block is patched after its fetch)
    def kv_dma(slot, blk, buf, hbm):
        return pltpu.make_async_copy(
            hbm.at[(*idx, pl.ds(blk * block_s, block_s))],
            buf.at[slot], sem.at[slot])

    # only stream blocks that hold live history: slots >= kv_len are masked
    # out anyway, so their DMA would be pure waste. Sliding layers in the
    # LINEAR regime additionally SKIP the blocks below the window (the
    # sliding win's whole point: stream win rows, not kv_len); in the ring
    # regime (sinks active) the live window wraps, so stream everything
    # and let the age mask narrow it.
    n_act = jnp.minimum((kv_len + block_s - 1) // block_s, n_blocks)
    if win is not None:
        lo = jnp.where(kv_sink > 0, 0,
                       jnp.maximum(kv_len - win, 0) // block_s)
    else:
        lo = 0

    kv_dma(lo % 2 if win is not None else 0, lo, kbuf, ko_hbm).start()
    kv_dma(lo % 2 if win is not None else 0, lo, vbuf, vo_hbm).start()

    m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    quant = kst is not None

    def block_step(sblk, _):
        slot = sblk % 2

        @pl.when(sblk + 1 < n_act)
        def _():
            kv_dma((sblk + 1) % 2, sblk + 1, kbuf, ko_hbm).start()
            kv_dma((sblk + 1) % 2, sblk + 1, vbuf, vo_hbm).start()

        kv_dma(slot, sblk, kbuf, ko_hbm).wait()
        kv_dma(slot, sblk, vbuf, vo_hbm).wait()

        # quantized cache: widen the fetched block to the bf16 staging
        # copy once; all patches and flash reads use the staging refs
        if quant:
            kst[...] = _bf16(kbuf[slot])
            vst[...] = _bf16(vbuf[slot])
        kb, vb, sl = (kst, vst, None) if quant else (kbuf, vbuf, slot)

        # lazy sink view on the fetched copy (block 0 holds the sink rows)
        @pl.when((sblk == 0) & (kv_sink > 0))
        def _():
            _lazy_sink_rotate(kb, sl, sink_rot, kv_sink,
                              kv_sinks=kv_sinks, theta=theta,
                              rotary_dim=rotary_dim, alt=alt)

        # patch the row whose in-flight HBM write may not have landed
        # before this block's fetch read it (the staging patch uses the
        # STORED bits kdt/vdt widened, so either landing order agrees)
        row = kv_pos - sblk * block_s
        @pl.when((row >= 0) & (row < block_s) & wr)
        def _():
            if quant:
                kst[row] = _bf16(kdt)
                vst[row] = _bf16(vdt)
            else:
                kbuf[slot, row] = kdt
                vbuf[slot, row] = vdt

        slot_idx = sblk * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (P, block_s), 1)
        valid = slot_idx < kv_len
        if win is not None:  # Gemma2/3 sliding layer: mask by slot age
            valid &= _slot_age(slot_idx, kv_pos, kv_sink, S) < win
        _flash_heads(q_rot, kb, vb, sl, valid,
                     m_ref, l_ref, acc_ref, Hk, P, softcap)
        return 0

    jax.lax.fori_loop(lo, n_act, block_step, 0)
    o_out[...] = acc_ref[...] / l_ref[:, 0:1]

    # drain the async row writes before the kernel (or this lane) ends
    @pl.when(wr)
    def _():
        pltpu.make_async_copy(newk, ko_hbm.at[(*idx, kv_pos)],
                              rowsem.at[0]).wait()
        pltpu.make_async_copy(newv, vo_hbm.at[(*idx, kv_pos)],
                              rowsem.at[1]).wait()


# ---------------------------------------------------------------------------
# Batched fused attention step (continuous-batching tick)
# ---------------------------------------------------------------------------

def _attn_step_batched_kernel(scal_ref, q_ref, knew_ref, vnew_ref,
                              k_hbm, v_hbm,
                              o_ref, ko_hbm, vo_hbm,
                              kbuf, vbuf, newk, newv, m_ref, l_ref, acc_ref,
                              sem, rowsem, *rest,
                              S: int, block_s: int, n_kv_heads: int,
                              p_rows: int, kv_sinks: int, theta: float,
                              rotary_dim: int, softcap: float = 0.0,
                              sliding: bool = False, alt_rope: bool = False):
    """ONE program sweeps all B lanes with CROSS-LANE pipelined KV fetches:
    while lane b's block j is being flash-attended, the next block — lane
    b's j+1, or lane b+1's block 0 at a lane boundary — is already in
    flight. The naive grid-(B,) formulation paid each lane's first-fetch
    latency serially (measured 197 µs/layer at batch 16 for ~44 µs of
    bytes); the pipeline keeps exactly one fetch outstanding across the
    whole sweep. Scalars: [layer, kv_pos[B], kv_len[B], kv_sink[B], pos[B],
    write[B], win] (win: this layer's sliding window, read when sliding).

    Correctness of the early prefetch: a lane's new-row HBM write is async
    and may land before OR after any fetch of the region — every fetched
    block is PATCHED in VMEM with the same values (computed from the kernel
    inputs, not from HBM), so both orders agree. Sink keys use the LAZY
    rotation view (never rewritten in HBM) — see _fused_attn_body.
    """
    kst, vst = rest if rest else (None, None)
    quant = kst is not None
    B = q_ref.shape[0]
    Hk = n_kv_heads
    P = p_rows
    D = q_ref.shape[-1]
    n_blocks = S // block_s
    layer = scal_ref[0]

    def lane_scal(name_off, b):
        return scal_ref[1 + name_off * B + b]

    def n_act_of(b):
        return jnp.minimum((lane_scal(1, b) + block_s - 1) // block_s,
                           n_blocks)

    def kv_dma(slot, b, blk, buf, hbm):
        return pltpu.make_async_copy(
            hbm.at[b, layer, pl.ds(blk * block_s, block_s)],
            buf.at[slot], sem.at[slot])

    alt = scal_ref[1 + 5 * B + 1] if alt_rope else None

    def lo_of(b):
        # sliding layers skip the blocks below the window in the linear
        # regime (ring regime: the live window wraps — stream everything)
        if not sliding:
            return 0
        bc = jnp.minimum(b, B - 1)
        return jnp.where(
            lane_scal(2, bc) > 0, 0,
            jnp.maximum(lane_scal(1, bc) - scal_ref[1 + 5 * B], 0) // block_s)

    # prime the pipeline: lane 0's first live block into slot 0
    kv_dma(0, 0, lo_of(0), kbuf, ko_hbm).start()
    kv_dma(0, 0, lo_of(0), vbuf, vo_hbm).start()

    def lane_body(b, slot0):
        kv_pos = lane_scal(0, b)
        kv_len = lane_scal(1, b)
        kv_sink = lane_scal(2, b)
        pos = lane_scal(3, b)
        wr = lane_scal(4, b) != 0

        q_rot = _rot_lanes(q_ref[b].astype(jnp.float32), theta, rotary_dim,
                           pos.astype(jnp.float32), alt) \
            * (1.0 / math.sqrt(D))
        k_rot = _rot_lanes(knew_ref[b].astype(jnp.float32), theta,
                           rotary_dim, pos.astype(jnp.float32), alt)
        kdt = k_rot.astype(newk.dtype)
        vdt = vnew_ref[b].astype(newv.dtype)
        sink_rot = jnp.maximum(pos - S + 1, 0).astype(jnp.float32)

        @pl.when(wr)
        def _():
            newk[...] = kdt
            pltpu.make_async_copy(newk, ko_hbm.at[b, layer, kv_pos],
                                  rowsem.at[0]).start()
            newv[...] = vdt
            pltpu.make_async_copy(newv, vo_hbm.at[b, layer, kv_pos],
                                  rowsem.at[1]).start()

        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        na = n_act_of(b)

        def block_step(j, slot):
            nslot = (slot + 1) % 2
            last = j + 1 >= na
            nb = jnp.where(last, b + 1, b)
            nj = jnp.where(last, lo_of(b + 1), j + 1)

            @pl.when(nb < B)
            def _():
                kv_dma(nslot, nb, nj, kbuf, ko_hbm).start()
                kv_dma(nslot, nb, nj, vbuf, vo_hbm).start()

            kv_dma(slot, b, j, kbuf, ko_hbm).wait()
            kv_dma(slot, b, j, vbuf, vo_hbm).wait()

            # quantized cache: widen the fetched block once to bf16 staging
            if quant:
                kst[...] = _bf16(kbuf[slot])
                vst[...] = _bf16(vbuf[slot])
            kb, vb, sl = (kst, vst, None) if quant else (kbuf, vbuf, slot)

            @pl.when((j == 0) & (kv_sink > 0))
            def _():
                _lazy_sink_rotate(kb, sl, sink_rot, kv_sink,
                                  kv_sinks=kv_sinks, theta=theta,
                                  rotary_dim=rotary_dim, alt=alt)

            row = kv_pos - j * block_s

            @pl.when((row >= 0) & (row < block_s) & wr)
            def _():
                if quant:
                    kst[row] = _bf16(kdt)
                    vst[row] = _bf16(vdt)
                else:
                    kbuf[slot, row] = kdt
                    vbuf[slot, row] = vdt

            slot_idx = j * block_s + jax.lax.broadcasted_iota(
                jnp.int32, (P, block_s), 1)
            valid = slot_idx < kv_len
            if sliding:
                valid &= _slot_age(slot_idx, kv_pos, kv_sink, S) \
                    < scal_ref[1 + 5 * B]
            _flash_heads(q_rot, kb, vb, sl, valid,
                         m_ref, l_ref, acc_ref, Hk, P, softcap)
            return nslot

        slot_end = jax.lax.fori_loop(lo_of(b), na, block_step, slot0)
        o_ref[b] = acc_ref[...] / l_ref[:, 0:1]

        # drain this lane's async row writes before its buffers are reused
        @pl.when(wr)
        def _():
            pltpu.make_async_copy(newk, ko_hbm.at[b, layer, kv_pos],
                                  rowsem.at[0]).wait()
            pltpu.make_async_copy(newv, vo_hbm.at[b, layer, kv_pos],
                                  rowsem.at[1]).wait()

        return slot_end

    jax.lax.fori_loop(0, B, lane_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("kv_sinks", "theta", "rotary_dim",
                                    "block_s", "interpret", "softcap"))
def attend_step_batched_l(q: jax.Array, k_new: jax.Array, v_new: jax.Array,
                          k_all: jax.Array, v_all: jax.Array,
                          layer: jax.Array, kv_pos: jax.Array,
                          kv_len: jax.Array, kv_sink: jax.Array,
                          pos: jax.Array, write: jax.Array | None = None,
                          win: jax.Array | None = None,
                          alt: jax.Array | None = None, *,
                          kv_sinks: int, theta: float, rotary_dim: int,
                          block_s: int = 0, interpret: bool | None = None,
                          softcap: float = 0.0
                          ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched attend_step_l for the continuous-batching tick.

    q: (B, n_kv_heads, q_per_kv, head_dim) f32 (UNrotated, unscaled)
    k_new/v_new: (B, Hk, D) f32 (k_new UNrotated)
    k_all/v_all: (B, n_layers, S, Hk, D); kv_pos/kv_len/kv_sink/pos: (B,) int32
    layer: () int32 (shared across the batch)
    write: optional (B,) int32 — 0 disables ALL cache mutation for that lane
    (read-only attention; used for lanes mid-admission whose cache the
    chunked prefill owns). Default: every lane writes.
    returns (mix (B, Hk, qpk, D) f32, k_all, v_all)
    """
    B, L, S, Hk, D = k_all.shape
    _, _, qpk, _ = q.shape
    if write is None:
        write = jnp.ones((B,), jnp.int32)
    if interpret is None and _emulate():
        def one(q1, kn1, vn1, k1, v1, kp, kl, ks, p1, wr1):
            q2 = q1.astype(jnp.float32).reshape(Hk * qpk, D)
            out, k2, v2 = _attn_step_ref(
                q2, kn1, vn1, k1, v1, layer, kp, kl, ks, p1,
                kv_sinks=kv_sinks, theta=theta, rotary_dim=rotary_dim,
                softcap=softcap, win=win, alt=alt)
            # write-masked lanes mutate NOTHING and attend the cache as-is
            # except for the lazy sink VIEW, which is part of attention —
            # matching the kernel exactly
            q2r = _rot_lanes_ref(q2, theta, rotary_dim,
                                 jnp.asarray(p1, jnp.float32), alt) \
                * (1.0 / math.sqrt(D))
            k1l = jax.lax.dynamic_index_in_dim(k1, layer, keepdims=False)
            extra = (None if win is None
                     else _slot_age(jnp.arange(S), kp, ks, S) < win)
            out_r = _attend_ref(
                q2r, _sink_view_ref(k1l, ks, p1, kv_sinks=kv_sinks,
                                    theta=theta, rotary_dim=rotary_dim,
                                    alt=alt),
                jax.lax.dynamic_index_in_dim(v1, layer, keepdims=False), kl,
                softcap, extra)
            keep = wr1 != 0
            return (jnp.where(keep, out, out_r).reshape(Hk, qpk, D),
                    jnp.where(keep, k2, k1), jnp.where(keep, v2, v1))
        return jax.vmap(one)(q, k_new, v_new, k_all, v_all,
                             kv_pos, kv_len, kv_sink, pos, write)

    if not block_s:
        block_s = S
        for cand in (512, 256, 128, 64, 32, 16, 8):
            if S % cand == 0:
                block_s = cand
                break

    P = max(8, ((qpk + 7) // 8) * 8)
    qp = jnp.zeros((B, Hk, P, D), jnp.float32)
    qp = qp.at[:, :, :qpk, :].set(q.astype(jnp.float32))
    q2 = qp.reshape(B, Hk * P, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, Hk * P, D), lambda i, sc: (0, 0, 0)),
            pl.BlockSpec((B, Hk, D), lambda i, sc: (0, 0, 0)),
            pl.BlockSpec((B, Hk, D), lambda i, sc: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((B, Hk * P, D), lambda i, sc: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_s, Hk, D), k_all.dtype),
            pltpu.VMEM((2, block_s, Hk, D), v_all.dtype),
            pltpu.VMEM((Hk, D), k_all.dtype),
            pltpu.VMEM((Hk, D), v_all.dtype),
            pltpu.VMEM((Hk * P, 128), jnp.float32),
            pltpu.VMEM((Hk * P, 128), jnp.float32),
            pltpu.VMEM((Hk * P, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ] + ([pltpu.VMEM((block_s, Hk, D), jnp.bfloat16),
              pltpu.VMEM((block_s, Hk, D), jnp.bfloat16)]
             if k_all.dtype.itemsize == 1 else []),
    )

    scal = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(kv_pos, jnp.int32).reshape(B),
        jnp.asarray(kv_len, jnp.int32).reshape(B),
        jnp.asarray(kv_sink, jnp.int32).reshape(B),
        jnp.asarray(pos, jnp.int32).reshape(B),
        jnp.asarray(write, jnp.int32).reshape(B),
        jnp.asarray(S if win is None else win, jnp.int32).reshape(1),
        jnp.asarray(0 if alt is None else alt, jnp.int32).reshape(1),
    ])
    out, k_out, v_out = pl.pallas_call(
        functools.partial(
            _attn_step_batched_kernel, S=S, block_s=block_s, n_kv_heads=Hk,
            p_rows=P, kv_sinks=kv_sinks, theta=theta, rotary_dim=rotary_dim,
            softcap=softcap, sliding=win is not None,
            alt_rope=alt is not None),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hk * P, D), jnp.float32),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * Hk * P * D,
            bytes_accessed=2 * B * S * Hk * D * k_all.dtype.itemsize,
            transcendentals=B * S * Hk * P,
        ),
        interpret=bool(interpret),
    )(scal, q2, k_new.astype(jnp.float32), v_new.astype(jnp.float32),
      k_all, v_all)
    return out.reshape(B, Hk, P, D)[:, :, :qpk, :], k_out, v_out


# ---------------------------------------------------------------------------
# Fully-fused attention step: cache write + sink rotation + flash attention
# in ONE kernel over ALIASED cache buffers.
# ---------------------------------------------------------------------------
#
# The XLA formulation (dynamic_update_slice + slice/where for sinks + a
# separate attention kernel) leaves the cache in XLA's hands, and XLA then
# (a) spends ~100us/layer on the tiny in-place updates and (b) picks an
# S-minor layout for the loop-carried cache, forcing full-cache relayout
# copies at the jit boundary — hundreds of MB per decode step on a 7B model.
# Owning the whole cache interaction inside one custom call with
# input_output_aliases keeps the buffer bitwise in place: XLA just threads
# it through. This is the role the reference's fused_rope_and_cache_update +
# rotate_sink_tokens + attn kernels play inside its CUDA graph
# (src/infer.cu:642-697, 338-524), collapsed into a single Pallas kernel.


def _rot_lanes_ref(rows: jax.Array, theta: float, rotary_dim: int,
                   pos, alt=None) -> jax.Array:
    """XLA twin of _rot_lanes (pair-split reshape; Mosaic can't lower it but
    the emulation path can): RoPE rows[..., D] forward by `pos` positions."""
    D = rows.shape[-1]
    half = D // 2
    j = 2.0 * jax.lax.broadcasted_iota(jnp.int32, (1, half), 1).astype(jnp.float32)
    freq = rope_pair_freqs(theta, rotary_dim, j, alt)
    ang = jnp.asarray(pos, jnp.float32) * freq
    ms = rope_mscale(theta)
    cos, sin = ms * jnp.cos(ang), ms * jnp.sin(ang)
    r = rows.reshape(*rows.shape[:-1], half, 2)
    x0, x1 = r[..., 0], r[..., 1]
    out = jnp.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    return out.reshape(rows.shape)


def _sink_view_ref(k: jax.Array, kv_sink, pos, *, kv_sinks: int,
                   theta: float, rotary_dim: int, alt=None) -> jax.Array:
    """Emulation of the kernels' lazy sink view: rotate the first kv_sink
    rows of one layer's cache (S, Hk, D) forward by max(0, pos - S + 1) and
    round them through the VMEM working dtype (the cache dtype, or bf16 for
    sub-byte quantized caches whose blocks are staged to bf16)."""
    S, Hk, D = k.shape
    rot = jnp.maximum(jnp.asarray(pos, jnp.int32) - S + 1, 0)
    rows = k[:kv_sinks].astype(jnp.float32).reshape(kv_sinks * Hk, D)
    rotr = _rot_lanes_ref(rows, rope_rotation_param(theta), rotary_dim,
                          rot.astype(jnp.float32), alt)
    mask = (jnp.arange(kv_sinks) < kv_sink)[:, None, None]
    wd = k.dtype if k.dtype.itemsize >= 2 else jnp.bfloat16
    view = jnp.where(mask, rotr.reshape(kv_sinks, Hk, D),
                     rows.reshape(kv_sinks, Hk, D)).astype(wd)
    return jax.lax.dynamic_update_slice(k.astype(wd), view, (0, 0, 0))


def _rot_lanes(rows: jax.Array, theta: float, rotary_dim: int,
               pos, alt=None) -> jax.Array:
    """In-kernel RoPE by `pos` positions without lane-splitting reshapes.

    Pair p lives in lanes (2p, 2p+1). rotated = rows * cos_full +
    swap(rows) * sin_signed, where swap exchanges adjacent lanes (two rolls
    + a parity select) — all operations Mosaic lowers natively. `pos` may be
    a traced scalar (current decode position) or 1 (sink maintenance).
    """
    R, D = rows.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, D), 1)
    j = (lane - (lane % 2)).astype(jnp.float32)          # 2p per pair
    freq = rope_pair_freqs(theta, rotary_dim, j, alt)
    ang = jnp.asarray(pos, jnp.float32) * freq
    ms = rope_mscale(theta)
    cos_full = ms * jnp.cos(ang)
    sin_full = ms * jnp.sin(ang)
    even = (lane % 2) == 0
    sin_signed = jnp.where(even, -sin_full, sin_full)
    # pltpu.roll requires non-negative shifts: rolling by D-1 ≡ -1 circular
    swapped = jnp.where(even,
                        pltpu.roll(rows, D - 1, 1),      # lane 2p   <- 2p+1
                        pltpu.roll(rows, 1, 1))          # lane 2p+1 <- 2p
    return rows * cos_full + swapped * sin_signed


def _attn_step_kernel(scal_ref, q_ref, knew_ref, vnew_ref,
                      k_hbm, v_hbm,          # ANY-space inputs (aliased)
                      o_ref, ko_hbm, vo_hbm,  # outputs (ko/vo alias k/v)
                      kbuf, vbuf, newk, newv, m_ref, l_ref, acc_ref,
                      sem, rowsem, *rest,
                      S: int, block_s: int, n_kv_heads: int, p_rows: int,
                      kv_sinks: int, theta: float, rotary_dim: int,
                      softcap: float = 0.0, sliding: bool = False,
                      alt_rope: bool = False):
    kst, vst = rest if rest else (None, None)
    layer, kv_pos, kv_len, kv_sink, pos = (scal_ref[0], scal_ref[1],
                                           scal_ref[2], scal_ref[3],
                                           scal_ref[4])
    win = scal_ref[5] if sliding else None
    alt = scal_ref[6] if alt_rope else None
    _fused_attn_body((layer,), q_ref[...], knew_ref[...], vnew_ref[...],
                     ko_hbm, vo_hbm, o_ref,
                     kbuf, vbuf, newk, newv, m_ref, l_ref, acc_ref,
                     sem, rowsem, S=S, block_s=block_s, Hk=n_kv_heads,
                     P=p_rows, kv_sinks=kv_sinks, theta=theta,
                     rotary_dim=rotary_dim, kv_pos=kv_pos, kv_len=kv_len,
                     kv_sink=kv_sink, pos=pos, kst=kst, vst=vst,
                     softcap=softcap, win=win, alt=alt)


def _attn_step_ref(q2, k_new, v_new, k_all, v_all, layer, kv_pos, kv_len,
                   kv_sink, pos, *, kv_sinks, theta, rotary_dim,
                   softcap: float = 0.0, win=None, alt=None):
    """jnp emulation of the fused step (off-TPU default; kernel numerics).

    q2 (rows, D) and k_new arrive UNrotated/unscaled; RoPE at `pos` and the
    1/sqrt(D) scale are applied here like the kernel does. Sink rotation is
    LAZY: only the new row mutates the cache; attention sees a VIEW whose
    sink keys are rotated by the accumulated offset (see _fused_attn_body)."""
    S, D = k_all.shape[1], k_all.shape[3]
    posf = jnp.asarray(pos, jnp.float32)
    q2 = _rot_lanes_ref(q2.astype(jnp.float32), theta, rotary_dim, posf,
                        alt) * (1.0 / math.sqrt(D))
    k_new = _rot_lanes_ref(k_new.astype(jnp.float32), theta, rotary_dim,
                           posf, alt)
    k_all = jax.lax.dynamic_update_slice(
        k_all, k_new[None, None].astype(k_all.dtype), (layer, kv_pos, 0, 0))
    v_all = jax.lax.dynamic_update_slice(
        v_all, v_new[None, None].astype(v_all.dtype), (layer, kv_pos, 0, 0))
    k = jax.lax.dynamic_index_in_dim(k_all, layer, keepdims=False)
    v = jax.lax.dynamic_index_in_dim(v_all, layer, keepdims=False)
    k_view = _sink_view_ref(k, kv_sink, pos, kv_sinks=kv_sinks, theta=theta,
                            rotary_dim=rotary_dim, alt=alt)
    extra = None
    if win is not None:
        extra = _slot_age(jnp.arange(S), kv_pos, kv_sink, S) < win
    out = _attend_ref(q2, k_view, v, kv_len, softcap, extra)
    return out, k_all, v_all


@functools.partial(jax.jit,
                   static_argnames=("kv_sinks", "theta", "rotary_dim",
                                    "block_s", "interpret", "softcap"))
def attend_step_l(q: jax.Array, k_new: jax.Array, v_new: jax.Array,
                  k_all: jax.Array, v_all: jax.Array,
                  layer: jax.Array, kv_pos: jax.Array, kv_len: jax.Array,
                  kv_sink: jax.Array, pos: jax.Array,
                  win: jax.Array | None = None,
                  alt: jax.Array | None = None, *,
                  kv_sinks: int, theta: float, rotary_dim: int,
                  block_s: int = 0, interpret: bool | None = None,
                  softcap: float = 0.0
                  ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused decode-attention step against layer `layer` of the cache.

    Applies RoPE at absolute position `pos` to q and k_new in-kernel, writes
    (k_new, v_new) into ring slot kv_pos, re-rotates the first kv_sink sink
    keys by one position, then runs flash attention over slots < kv_len —
    all inside one kernel whose cache operands are aliased to its outputs,
    so the buffers update strictly in place.

    q: (n_kv_heads, q_per_kv, head_dim) f32 (UNrotated, unscaled)
    k_new/v_new: (n_kv_heads, head_dim) f32 (k_new UNrotated)
    win: optional () int32 — this layer's sliding window (Gemma2/3): only
    slots younger than `win` are attendable. softcap: Gemma2 score cap.
    returns (mix (n_kv_heads, q_per_kv, head_dim) f32, k_all, v_all)
    """
    L, S, Hk, D = k_all.shape
    _, qpk, _ = q.shape
    if interpret is None and _emulate():
        q2 = q.astype(jnp.float32).reshape(Hk * qpk, D)
        out, k_all, v_all = _attn_step_ref(
            q2, k_new, v_new, k_all, v_all, layer, kv_pos, kv_len, kv_sink,
            pos, kv_sinks=kv_sinks, theta=theta, rotary_dim=rotary_dim,
            softcap=softcap, win=win, alt=alt)
        return out.reshape(Hk, qpk, D)[:, :qpk, :], k_all, v_all

    if not block_s:
        block_s = S
        for cand in (512, 256, 128, 64, 32, 16, 8):
            if S % cand == 0:
                block_s = cand
                break

    P = max(8, ((qpk + 7) // 8) * 8)
    qp = jnp.zeros((Hk, P, D), jnp.float32)
    qp = qp.at[:, :qpk, :].set(q.astype(jnp.float32))
    q2 = qp.reshape(Hk * P, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((Hk * P, D), lambda i, sc: (0, 0)),
            pl.BlockSpec((Hk, D), lambda i, sc: (0, 0)),
            pl.BlockSpec((Hk, D), lambda i, sc: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((Hk * P, D), lambda i, sc: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_s, Hk, D), k_all.dtype),
            pltpu.VMEM((2, block_s, Hk, D), v_all.dtype),
            pltpu.VMEM((Hk, D), k_all.dtype),
            pltpu.VMEM((Hk, D), v_all.dtype),
            pltpu.VMEM((Hk * P, 128), jnp.float32),
            pltpu.VMEM((Hk * P, 128), jnp.float32),
            pltpu.VMEM((Hk * P, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ] + ([pltpu.VMEM((block_s, Hk, D), jnp.bfloat16),
              pltpu.VMEM((block_s, Hk, D), jnp.bfloat16)]
             if k_all.dtype.itemsize == 1 else []),
    )

    scal = jnp.stack([jnp.asarray(layer, jnp.int32),
                      jnp.asarray(kv_pos, jnp.int32),
                      jnp.asarray(kv_len, jnp.int32),
                      jnp.asarray(kv_sink, jnp.int32),
                      jnp.asarray(pos, jnp.int32),
                      jnp.asarray(S if win is None else win, jnp.int32),
                      jnp.asarray(0 if alt is None else alt, jnp.int32)])
    out, k_out, v_out = pl.pallas_call(
        functools.partial(
            _attn_step_kernel, S=S, block_s=block_s, n_kv_heads=Hk,
            p_rows=P, kv_sinks=kv_sinks, theta=theta, rotary_dim=rotary_dim,
            softcap=softcap, sliding=win is not None,
            alt_rope=alt is not None),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Hk * P, D), jnp.float32),
            jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
            jax.ShapeDtypeStruct(v_all.shape, v_all.dtype),
        ],
        input_output_aliases={4: 1, 5: 2},  # k_all, v_all in place
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * S * Hk * P * D,
            bytes_accessed=2 * S * Hk * D * k_all.dtype.itemsize,
            transcendentals=S * Hk * P,
        ),
        interpret=bool(interpret),
    )(scal, q2, k_new.astype(jnp.float32), v_new.astype(jnp.float32),
      k_all, v_all)
    return out.reshape(Hk, P, D)[:, :qpk, :], k_out, v_out


# ---------------------------------------------------------------------------
# Paged batched attention step (vLLM-style block tables)
# ---------------------------------------------------------------------------
#
# Same fused semantics as attend_step_batched_l, but the cache is a POOL of
# pages (n_pages, n_layers, page_size, Hk, D) and each lane's logical slot s
# resolves through a per-lane page table: (table[s // page_size], s % page
# _size). Page ids ride the scalar-prefetch channel, so every DMA — block
# fetch, kv-row write, sink read-modify-write — goes straight to the owning
# page's bytes. kernel block_s == page_size, which also guarantees each
# fetched block is one contiguous page range.


def _attn_step_paged_kernel(scal_ref, q_ref, knew_ref, vnew_ref,
                            kp_in, vp_in,
                            o_ref, kp_hbm, vp_hbm,
                            kbuf, vbuf, newk, newv, m_ref, l_ref, acc_ref,
                            sem, rowsem, *rest,
                            S: int, block_s: int, n_kv_heads: int,
                            p_rows: int, kv_sinks: int, theta: float,
                            rotary_dim: int, nblk: int,
                            softcap: float = 0.0, sliding: bool = False,
                            alt_rope: bool = False):
    """One program sweeps all lanes with cross-lane pipelined PAGE fetches
    (same pipeline as the dense batched kernel; every fetch target resolves
    through the page table). Sink keys use the lazy rotation view, never an
    HBM rewrite (see _fused_attn_body). Scalars: [layer, kv_pos[B],
    kv_len[B], kv_sink[B], pos[B], write[B], pages[B * nblk], win]."""
    kst, vst = rest if rest else (None, None)
    quant = kst is not None
    B = q_ref.shape[0]
    Hk = n_kv_heads
    P = p_rows
    D = q_ref.shape[-1]
    n_blocks = S // block_s
    layer = scal_ref[0]

    def lane_scal(off, b):
        return scal_ref[1 + off * B + b]

    def page_of(b, blk):
        return scal_ref[1 + 5 * B + b * nblk + blk]

    def kv_dma(slot, b, blk, buf, pool):
        return pltpu.make_async_copy(pool.at[page_of(b, blk), layer],
                                     buf.at[slot], sem.at[slot])

    alt = scal_ref[1 + 5 * B + B * nblk + 1] if alt_rope else None

    def lo_of(b):
        if not sliding:
            return 0
        bc = jnp.minimum(b, B - 1)
        return jnp.where(
            lane_scal(2, bc) > 0, 0,
            jnp.maximum(lane_scal(1, bc) - scal_ref[1 + 5 * B + B * nblk],
                        0) // block_s)

    kv_dma(0, 0, lo_of(0), kbuf, kp_hbm).start()
    kv_dma(0, 0, lo_of(0), vbuf, vp_hbm).start()

    def lane_body(b, slot0):
        kv_pos = lane_scal(0, b)
        kv_len = lane_scal(1, b)
        kv_sink = lane_scal(2, b)
        pos = lane_scal(3, b)
        wr = lane_scal(4, b) != 0

        q_rot = _rot_lanes(q_ref[b].astype(jnp.float32), theta, rotary_dim,
                           pos.astype(jnp.float32), alt) \
            * (1.0 / math.sqrt(D))
        k_rot = _rot_lanes(knew_ref[b].astype(jnp.float32), theta,
                           rotary_dim, pos.astype(jnp.float32), alt)
        kdt = k_rot.astype(newk.dtype)
        vdt = vnew_ref[b].astype(newv.dtype)
        sink_rot = jnp.maximum(pos - S + 1, 0).astype(jnp.float32)
        page_w = page_of(b, kv_pos // block_s)
        row_w = kv_pos % block_s

        @pl.when(wr)
        def _():
            newk[...] = kdt
            pltpu.make_async_copy(newk, kp_hbm.at[page_w, layer, row_w],
                                  rowsem.at[0]).start()
            newv[...] = vdt
            pltpu.make_async_copy(newv, vp_hbm.at[page_w, layer, row_w],
                                  rowsem.at[1]).start()

        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        na = jnp.minimum((kv_len + block_s - 1) // block_s, n_blocks)

        def block_step(j, slot):
            nslot = (slot + 1) % 2
            last = j + 1 >= na
            nb = jnp.where(last, b + 1, b)
            nj = jnp.where(last, lo_of(b + 1), j + 1)

            @pl.when(nb < B)
            def _():
                kv_dma(nslot, nb, nj, kbuf, kp_hbm).start()
                kv_dma(nslot, nb, nj, vbuf, vp_hbm).start()

            kv_dma(slot, b, j, kbuf, kp_hbm).wait()
            kv_dma(slot, b, j, vbuf, vp_hbm).wait()

            if quant:
                kst[...] = _bf16(kbuf[slot])
                vst[...] = _bf16(vbuf[slot])
            kb, vb, sl = (kst, vst, None) if quant else (kbuf, vbuf, slot)

            @pl.when((j == 0) & (kv_sink > 0))
            def _():
                _lazy_sink_rotate(kb, sl, sink_rot, kv_sink,
                                  kv_sinks=kv_sinks, theta=theta,
                                  rotary_dim=rotary_dim, alt=alt)

            row = kv_pos - j * block_s

            @pl.when((row >= 0) & (row < block_s) & wr)
            def _():
                if quant:
                    kst[row] = _bf16(kdt)
                    vst[row] = _bf16(vdt)
                else:
                    kbuf[slot, row] = kdt
                    vbuf[slot, row] = vdt

            slot_idx = j * block_s + jax.lax.broadcasted_iota(
                jnp.int32, (P, block_s), 1)
            valid = slot_idx < kv_len
            if sliding:
                valid &= _slot_age(slot_idx, kv_pos, kv_sink, S) \
                    < scal_ref[1 + 5 * B + B * nblk]
            _flash_heads(q_rot, kb, vb, sl, valid,
                         m_ref, l_ref, acc_ref, Hk, P, softcap)
            return nslot

        slot_end = jax.lax.fori_loop(lo_of(b), na, block_step, slot0)
        o_ref[b] = acc_ref[...] / l_ref[:, 0:1]

        @pl.when(wr)
        def _():
            pltpu.make_async_copy(newk, kp_hbm.at[page_w, layer, row_w],
                                  rowsem.at[0]).wait()
            pltpu.make_async_copy(newv, vp_hbm.at[page_w, layer, row_w],
                                  rowsem.at[1]).wait()

        return slot_end

    jax.lax.fori_loop(0, B, lane_body, 0)


def _gather_lane(pool, table_b):
    """(nblk,) page ids -> (L, S, Hk, D) lane view (emulation only)."""
    pages = jnp.take(pool, table_b, axis=0)       # (nblk, L, bs, Hk, D)
    return jnp.transpose(pages, (1, 0, 2, 3, 4)).reshape(
        pool.shape[1], -1, pool.shape[3], pool.shape[4])


def _scatter_lane(pool, table_b, lane):
    """Inverse of _gather_lane: write the lane view back to its pages."""
    L, S, Hk, D = lane.shape
    nblk = table_b.shape[0]
    bs = S // nblk
    pages = jnp.transpose(lane.reshape(L, nblk, bs, Hk, D), (1, 0, 2, 3, 4))
    return pool.at[table_b].set(pages.astype(pool.dtype))


@functools.partial(jax.jit,
                   static_argnames=("kv_sinks", "theta", "rotary_dim",
                                    "window", "interpret", "softcap"))
def attend_step_paged_l(q: jax.Array, k_new: jax.Array, v_new: jax.Array,
                        k_pool: jax.Array, v_pool: jax.Array,
                        tables: jax.Array,
                        layer: jax.Array, kv_pos: jax.Array,
                        kv_len: jax.Array, kv_sink: jax.Array,
                        pos: jax.Array, write: jax.Array | None = None,
                        win: jax.Array | None = None,
                        alt: jax.Array | None = None, *,
                        kv_sinks: int, theta: float, rotary_dim: int,
                        window: int, interpret: bool | None = None,
                        softcap: float = 0.0
                        ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Paged attend_step_batched_l.

    k_pool/v_pool: (n_pages, L, page_size, Hk, D); tables: (B, nblk) int32
    page ids (nblk = window // page_size; unmapped blocks may point
    anywhere below kv_len's coverage — they are never touched).
    Other args as attend_step_batched_l. Returns (mix, k_pool, v_pool) with
    the pools updated in place (aliased).
    """
    Pn, L, bs, Hk, D = k_pool.shape
    B, _, qpk, _ = q.shape
    nblk = tables.shape[1]
    assert nblk * bs == window, (tables.shape, bs, window)
    if write is None:
        write = jnp.ones((B,), jnp.int32)
    if interpret is None and _emulate():
        def one(q1, kn1, vn1, tb, kp, vp, kpos, kl, ks, p1, wr1):
            q2 = q1.astype(jnp.float32).reshape(Hk * qpk, D)
            k1 = _gather_lane(kp, tb)
            v1 = _gather_lane(vp, tb)
            out, k2, v2 = _attn_step_ref(
                q2, kn1, vn1, k1, v1, layer, kpos, kl, ks, p1,
                kv_sinks=kv_sinks, theta=theta, rotary_dim=rotary_dim,
                softcap=softcap, win=win, alt=alt)
            # write-masked lanes attend the cache as-is except for the lazy
            # sink view (see batched twin)
            q2r = _rot_lanes_ref(q2, theta, rotary_dim,
                                 jnp.asarray(p1, jnp.float32), alt) \
                * (1.0 / math.sqrt(D))
            k1l = jax.lax.dynamic_index_in_dim(k1, layer, keepdims=False)
            extra = (None if win is None else
                     _slot_age(jnp.arange(window), kpos, ks, window) < win)
            out_r = _attend_ref(
                q2r, _sink_view_ref(k1l, ks, p1, kv_sinks=kv_sinks,
                                    theta=theta, rotary_dim=rotary_dim,
                                    alt=alt),
                jax.lax.dynamic_index_in_dim(v1, layer, keepdims=False), kl,
                softcap, extra)
            keep = wr1 != 0
            out = jnp.where(keep, out, out_r)
            k2 = jnp.where(keep, k2, k1)
            v2 = jnp.where(keep, v2, v1)
            return out.reshape(Hk, qpk, D), k2, v2

        # sequential host-level loop over lanes: pool writes must compose
        # (each lane owns disjoint pages; vmapped scatters would conflict
        # on the reserved page 0)
        outs = []
        for b in range(B):
            o, k2, v2 = one(q[b], k_new[b], v_new[b], tables[b],
                            k_pool, v_pool, kv_pos[b], kv_len[b], kv_sink[b],
                            pos[b], write[b])
            k_pool = _scatter_lane(k_pool, tables[b], k2)
            v_pool = _scatter_lane(v_pool, tables[b], v2)
            outs.append(o)
        return jnp.stack(outs), k_pool, v_pool

    P = max(8, ((qpk + 7) // 8) * 8)
    qp = jnp.zeros((B, Hk, P, D), jnp.float32)
    qp = qp.at[:, :, :qpk, :].set(q.astype(jnp.float32))
    q2 = qp.reshape(B, Hk * P, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, Hk * P, D), lambda i, sc: (0, 0, 0)),
            pl.BlockSpec((B, Hk, D), lambda i, sc: (0, 0, 0)),
            pl.BlockSpec((B, Hk, D), lambda i, sc: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((B, Hk * P, D), lambda i, sc: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, bs, Hk, D), k_pool.dtype),
            pltpu.VMEM((2, bs, Hk, D), v_pool.dtype),
            pltpu.VMEM((Hk, D), k_pool.dtype),
            pltpu.VMEM((Hk, D), v_pool.dtype),
            pltpu.VMEM((Hk * P, 128), jnp.float32),
            pltpu.VMEM((Hk * P, 128), jnp.float32),
            pltpu.VMEM((Hk * P, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ] + ([pltpu.VMEM((bs, Hk, D), jnp.bfloat16),
              pltpu.VMEM((bs, Hk, D), jnp.bfloat16)]
             if k_pool.dtype.itemsize == 1 else []),
    )

    scal = jnp.concatenate([
        jnp.asarray(layer, jnp.int32).reshape(1),
        jnp.asarray(kv_pos, jnp.int32).reshape(B),
        jnp.asarray(kv_len, jnp.int32).reshape(B),
        jnp.asarray(kv_sink, jnp.int32).reshape(B),
        jnp.asarray(pos, jnp.int32).reshape(B),
        jnp.asarray(write, jnp.int32).reshape(B),
        jnp.asarray(tables, jnp.int32).reshape(B * nblk),
        jnp.asarray(window if win is None else win, jnp.int32).reshape(1),
        jnp.asarray(0 if alt is None else alt, jnp.int32).reshape(1),
    ])
    out, kp_out, vp_out = pl.pallas_call(
        functools.partial(
            _attn_step_paged_kernel, S=window, block_s=bs, n_kv_heads=Hk,
            p_rows=P, kv_sinks=kv_sinks, theta=theta, rotary_dim=rotary_dim,
            nblk=nblk, softcap=softcap, sliding=win is not None,
            alt_rope=alt is not None),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hk * P, D), jnp.float32),
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ],
        input_output_aliases={4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * window * Hk * P * D,
            bytes_accessed=2 * B * window * Hk * D * k_pool.dtype.itemsize,
            transcendentals=B * window * Hk * P,
        ),
        interpret=bool(interpret),
    )(scal, q2, k_new.astype(jnp.float32), v_new.astype(jnp.float32),
      k_pool, v_pool)
    return out.reshape(B, Hk, P, D)[:, :, :qpk, :], kp_out, vp_out
