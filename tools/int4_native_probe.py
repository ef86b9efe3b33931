"""Probe Mosaic-native int4 handling inside Pallas kernels (round-5 cont.).

The shipped int4 unpack (unsigned nibble dots + 8*sum(x) correction,
2 groups/step) is VPU-bound at ~618 GB/s packed — 5 u8/i32 VPU ops per
byte. If Mosaic can treat the packed buffer AS jnp.int4 (native load or
pltpu.bitcast) and convert i4->bf16 in hardware, the per-byte op count
collapses. Each probe is standalone (a Mosaic rejection raises cleanly,
the HTTP 500 path gives nothing — see CLAUDE.md rule 5 crash-bisect).

Run from /root/repo, tunnel up, nothing else on the TPU.
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

N, K = 4096, 14336
GROUP = 512
G, Hp = K // GROUP, GROUP // 2
B = 1


def _time(fn, x, *consts, reps=7):
    lo_iters, hi_iters = 100, 600

    def make(iters):
        @jax.jit
        def run(x, consts):
            def body(i, c):
                y = fn(x + c * 1e-20, *consts)
                return c + y[0, :8].sum() * 1e-12
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return run

    run_lo, run_hi = make(lo_iters), make(hi_iters)
    np.asarray(run_lo(x, consts)); np.asarray(run_hi(x, consts))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(run_lo(x, consts))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(run_hi(x, consts))
        t_hi = time.perf_counter() - t0
        ts.append((t_hi - t_lo) / (hi_iters - lo_iters))
    return statistics.median(ts)


def _make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((N, K), np.float32) * 0.02
    from yalm_tpu.ops.pallas.gemv import pack_int4
    w4, gs = pack_int4(w, GROUP)
    x = rng.standard_normal((B, K), np.float32)
    return jnp.asarray(w4), jnp.asarray(gs), jnp.asarray(x)


def probe_smoke_bitcast():
    """Tiny kernel: load u8 block, pltpu.bitcast to int4, convert bf16."""
    def kern(w_ref, o_ref):
        w = w_ref[...]                       # (8, 128) u8
        w4 = pltpu.bitcast(w, jnp.int4)      # (8, 256) i4?
        o_ref[...] = w4.astype(jnp.bfloat16)

    w = jnp.arange(8 * 128, dtype=jnp.uint8).reshape(8, 128)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.bfloat16),
    )(w)
    out = np.asarray(out)
    # expected: byte b -> nibbles, signed i4
    b = np.arange(8 * 128, dtype=np.uint8)
    lo = (b & 0xF).astype(np.int8); lo[lo >= 8] -= 16
    hi = (b >> 4).astype(np.int8); hi[hi >= 8] -= 16
    print("bitcast smoke out[0,:8] =", out[0, :8])
    print("expected lo/hi interleave? lo:", lo[:4], "hi:", hi[:4])
    return out


def probe_smoke_i4ref():
    """Pass an int4 array into pallas directly (if jnp can make one)."""
    def kern(w_ref, o_ref):
        o_ref[...] = w_ref[...].astype(jnp.bfloat16)

    wi8 = jnp.asarray(np.arange(-8, 8, dtype=np.int8).reshape(2, 8).repeat(16, 1))
    w4 = jax.lax.convert_element_type(wi8, jnp.int4)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2, 128), jnp.bfloat16),
    )(w4)
    print("i4-ref smoke out[0,:8] =", np.asarray(out)[0, :8])
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "bitcast"):
        try:
            probe_smoke_bitcast()
            print("BITCAST: OK")
        except Exception as e:
            print(f"BITCAST FAILED: {type(e).__name__}: {str(e)[:400]}")
    if which in ("all", "i4ref"):
        try:
            probe_smoke_i4ref()
            print("I4REF: OK")
        except Exception as e:
            print(f"I4REF FAILED: {type(e).__name__}: {str(e)[:400]}")


if __name__ == "__main__":
    main()
