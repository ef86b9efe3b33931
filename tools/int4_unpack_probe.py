"""On-chip bisect of int4 gemv unpack variants (w2 shape, 4096x14336).

Round-4 follow-up to the 2.4x unpack fix: the fixed kernel still runs
0.055 ms vs the 0.039 ms streaming SoL for its 29.3 MB of packed bytes
(~71%). Variants probed here are equivalent up to f32 accumulation order
(sum-corr reorders the accumulation: unsigned dots then -8*sum(x) vs
signed dots) — each is asserted against the emulation numerics before its
time is reported, so a wrong variant cannot "win":

  A  prod-equivalent re-impl of gemm4_l's tile body (7 u8/i32 ops/byte;
     drops the layer-stack dim + scalar-prefetch steering, so times can
     drift slightly from the shipped layer-indexed kernel)
  B  sum-corr      unsigned nibble dots + 8*sum(x) correction folded into
                   the f32 flush (drops both -8 subtracts: 5 ops per byte)
  H  2-group       two groups per k-step (2 MB DMA chunks, half the grid
                   steps / scale selects)
  BH both

Run from /root/repo with the tunnel up; nothing else may touch the TPU.
"""

from __future__ import annotations

import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K = 4096, 14336          # w2: the biggest decode gemv
GROUP = 512
G, Hp = K // GROUP, GROUP // 2
B = 1


def _make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((N, K), np.float32) * 0.02
    from yalm_tpu.ops.pallas.gemv import pack_int4
    w4, gs = pack_int4(w, GROUP)
    x = rng.standard_normal((B, K), np.float32)
    return (jnp.asarray(w4), jnp.asarray(gs), jnp.asarray(x),
            jnp.asarray(w, jnp.bfloat16))


def _time(fn, x, *consts, reps=7):
    """Two-size difference: t = (T(hi) - T(lo)) / (hi - lo) cancels the
    ~26 ms tunnel RTT exactly (at small iter counts RTT/iters swamps the
    kernel; see BASELINE.md round-4 ceiling-probe note)."""
    lo_iters, hi_iters = 100, 600

    def make(iters):
        @jax.jit
        def run(x, consts):
            def body(i, c):
                # chain the carry into x so XLA cannot hoist the call out
                # of the loop (a loop-invariant pallas_call gets CSE'd to
                # ONE launch)
                y = fn(x + c * 1e-20, *consts)
                return c + y[0, :8].sum() * 1e-12
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return run

    run_lo, run_hi = make(lo_iters), make(hi_iters)
    np.asarray(run_lo(x, consts)); np.asarray(run_hi(x, consts))  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(run_lo(x, consts))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(run_hi(x, consts))
        t_hi = time.perf_counter() - t0
        ts.append((t_hi - t_lo) / (hi_iters - lo_iters))
    return statistics.median(ts)


def _variant(sum_corr: bool, groups_per_step: int):
    """Build a gemm4-style pallas kernel with the given options."""
    gps = groups_per_step
    n_k = G // gps
    block_n = N  # full-N, matches the production pick for this shape

    def kern(x_ref, w_ref, s_ref, o_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        for g in range(gps):
            wi = w_ref[:, g * Hp:(g + 1) * Hp].astype(jnp.int32)
            xb = x_ref[:, g * GROUP:(g + 1) * GROUP]
            x_lo = xb[:, :Hp].astype(jnp.bfloat16)
            x_hi = xb[:, Hp:].astype(jnp.bfloat16)
            if sum_corr:
                lo = (wi & 0xF).astype(jnp.bfloat16)
                hi = (wi >> 4).astype(jnp.bfloat16)
            else:
                lo = ((wi & 0xF) - 8).astype(jnp.bfloat16)
                hi = ((wi >> 4) - 8).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                x_lo, lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            part += jax.lax.dot_general(
                x_hi, hi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if sum_corr:
                # correction must see the SAME bf16-rounded x as the dots
                part -= 8.0 * (jnp.sum(x_lo.astype(jnp.float32), -1, keepdims=True)
                               + jnp.sum(x_hi.astype(jnp.float32), -1, keepdims=True))
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
                      == j * gps + g)
            s = jnp.sum(jnp.where(onehot, s_ref[...], 0.0), axis=0)
            acc_ref[...] += part * s[None, :]

        @pl.when(j == n_k - 1)
        def _():
            o_ref[...] = acc_ref[...]

    @functools.partial(jax.jit)
    def run(x, w4, gs):
        return pl.pallas_call(
            kern,
            grid=(N // block_n, n_k),
            in_specs=[
                pl.BlockSpec((B, gps * GROUP), lambda i, j: (0, j)),
                pl.BlockSpec((block_n, gps * Hp), lambda i, j: (i, j)),
                pl.BlockSpec((G, block_n), lambda i, j: (0, i)),
            ],
            out_specs=pl.BlockSpec((B, block_n), lambda i, j: (0, i)),
            out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((B, block_n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * N * K,
                bytes_accessed=N * K // 2 + B * (K + N) * 4 + G * N * 4,
                transcendentals=0),
        )(x.astype(jnp.float32), w4, gs.astype(jnp.float32))

    return run


def main():
    w4, gs, x, w_bf = _make_inputs()
    sol_bytes = N * K // 2 + G * N * 4
    print(f"w2 {N}x{K} int4 packed bytes: {sol_bytes/1e6:.1f} MB")

    # correctness pin vs the emulation numerics
    from yalm_tpu.ops.pallas.gemv import _gemm4_ref
    ref = np.asarray(_gemm4_ref(jnp.asarray(x), w4, gs, GROUP))

    variants = {
        "A  prod-equiv re-impl": _variant(False, 1),
        "B  sum-corr": _variant(True, 1),
        "H  2-group": _variant(False, 2),
        "BH sum-corr+2-group": _variant(True, 2),
        "H4 4-group": _variant(False, 4),
        "BH4 sum-corr+4-group": _variant(True, 4),
    }
    for name, fn in variants.items():
        try:
            out = np.asarray(fn(x, w4, gs))
            err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
            # bf16 dots reordered in f32 stay well under 1e-2; anything
            # larger means the variant computes something else — fail it
            # rather than let a wrong kernel win the bench
            assert err < 1e-2, f"numerics mismatch (relerr {err:.2e})"
            dt = _time(fn, x, w4, gs)
            print(f"{name:26s} {dt*1e3:7.3f} ms  {sol_bytes/dt/1e9:6.0f} GB/s  "
                  f"relerr {err:.2e}")
        except Exception as e:  # noqa: BLE001 — probe: report and continue
            print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
