"""Kernel & memory microbenchmarks (reference: src/test.cpp mem_bench /
kernel_bench, selected via `./build/test -bk {matmul,mha,ffn}`).

Usage: python -m yalm_tpu.bench [-bk matmul|matmul-fp8|mha|ffn|mem] [-n iters]

Runs single kernels at Mistral-7B shapes (head_dim 128, 32 q / 8 kv heads,
hidden 14336, window 4096 — reference src/test.cpp:308-314) in a device-side
loop with host-fetch fencing, reporting ms and achieved GB/s against the
bytes each kernel must touch. Also usable as a profiler attach target
(jax.profiler.trace wraps the measured region when --trace is given).
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Mistral-7B shapes (reference src/test.cpp:308-314)
DIM = 4096
HIDDEN = 14336
N_HEADS = 32
N_KV_HEADS = 8
HEAD_DIM = 128
SEQ = 4096


def _fence(x):
    return np.asarray(jax.tree.leaves(x)[0])


def _devloop(fn, init, iters, *consts):
    """Time an on-device loop. Loop-invariant arrays go in *consts: they
    become jit ARGUMENTS (closing over concrete arrays bakes them into the
    HLO as literals; threading them through the carry forces per-iteration
    copies). Inside the traced function they are tracers, safe to close
    over in the fori body."""
    @jax.jit
    def run(consts, carry):
        return jax.lax.fori_loop(0, iters, lambda i, c: fn(i, c, *consts), carry)
    out = run(consts, init)
    _fence(out)
    t0 = time.perf_counter()
    out = run(consts, init)
    _fence(out)
    return (time.perf_counter() - t0) / iters


def bench_matmul(iters: int, dtype) -> None:
    w = (jax.random.normal(jax.random.PRNGKey(0), (HIDDEN, DIM), jnp.bfloat16) * 0.02).astype(dtype)
    x0 = jnp.ones((DIM,), jnp.float32)

    def body(i, carry, w):
        x, acc = carry
        y = jax.lax.dot_general(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                                (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        return (x0 + y[:DIM] * 1e-12, acc + y[0])

    dt = _devloop(body, (x0, jnp.float32(0)), iters, w)
    nbytes = HIDDEN * DIM * dtype.dtype.itemsize if hasattr(dtype, "dtype") else HIDDEN * DIM * jnp.dtype(dtype).itemsize
    print(f"matmul {HIDDEN}x{DIM} {jnp.dtype(dtype).name}: {dt*1e3:.3f} ms  "
          f"{nbytes/dt/1e9:.0f} GB/s")


def bench_mha(iters: int) -> None:
    from yalm_tpu.ops.attention import attend_one
    kb = jax.random.normal(jax.random.PRNGKey(0), (SEQ, N_KV_HEADS, HEAD_DIM), jnp.bfloat16)
    vb = jax.random.normal(jax.random.PRNGKey(1), (SEQ, N_KV_HEADS, HEAD_DIM), jnp.bfloat16)
    q0 = jnp.ones((N_KV_HEADS, N_HEADS // N_KV_HEADS, HEAD_DIM), jnp.float32)
    valid = jnp.ones((SEQ,), bool)

    def body(i, carry, kb, vb):
        q, acc = carry
        out = attend_one(q, kb, vb, valid)
        return (q0 + out * 1e-12, acc + out[0, 0, 0])

    dt = _devloop(body, (q0, jnp.float32(0)), iters, kb, vb)
    nbytes = 2 * SEQ * N_KV_HEADS * HEAD_DIM * 2
    print(f"mha decode (window {SEQ}): {dt*1e3:.3f} ms  {nbytes/dt/1e9:.0f} GB/s")


def bench_ffn(iters: int) -> None:
    from yalm_tpu.ops.core import act_fn
    w1 = jax.random.normal(jax.random.PRNGKey(0), (HIDDEN, DIM), jnp.bfloat16) * 0.02
    w3 = jax.random.normal(jax.random.PRNGKey(1), (HIDDEN, DIM), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(jax.random.PRNGKey(2), (DIM, HIDDEN), jnp.bfloat16) * 0.02
    x0 = jnp.ones((DIM,), jnp.float32)

    def proj(x, w):
        return jax.lax.dot_general(x.astype(jnp.bfloat16), w,
                                   (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    def body(i, carry, w1, w2, w3):
        x, acc = carry
        h = act_fn("silu")(proj(x, w1)) * proj(x, w3)
        y = proj(h, w2)
        return (x0 + y * 1e-12, acc + y[0])

    dt = _devloop(body, (x0, jnp.float32(0)), iters, w1, w2, w3)
    nbytes = 3 * HIDDEN * DIM * 2
    print(f"ffn (SwiGLU {DIM}->{HIDDEN}): {dt*1e3:.3f} ms  {nbytes/dt/1e9:.0f} GB/s")


def bench_mem(iters: int) -> None:
    """HBM streaming probe (reference mem_bench, src/test.cpp:218-249).

    Random data (jnp.ones folds to a broadcast constant) and a loop-carried
    dependence through the summed array (a closed-over constant sum is
    loop-invariant and gets hoisted, inflating GB/s by ~iters x).
    """
    # Random data (jnp.ones folds to a broadcast constant and measures
    # nothing; an on-device loop either hoists the loop-invariant reduction
    # or defeats fusion through the forced dependence). Repeated host
    # dispatches of one jitted reduction are honest: each call re-reads the
    # array, and async dispatch overlaps the ~ms launch cost.
    big = jax.random.normal(jax.random.PRNGKey(0), (16384, 16384),
                            jnp.bfloat16)  # 512 MB
    red = jax.jit(lambda b: jnp.sum(b.astype(jnp.float32)))
    _fence(red(big))  # compile
    t0 = time.perf_counter()
    outs = [red(big) for _ in range(iters)]
    _fence(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    nb = big.size * 2
    print(f"mem read {nb/2**30:.2f} GiB: {dt*1e3:.2f} ms  {nb/dt/1e9:.0f} GB/s")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-bk", default="matmul",
                    choices=["matmul", "matmul-fp8", "mha", "ffn", "mem"])
    ap.add_argument("-n", type=int, default=50)
    ap.add_argument("--trace", type=str, default=None,
                    help="jax.profiler trace output dir")
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    def run():
        if args.bk == "matmul":
            bench_matmul(args.n, jnp.bfloat16)
        elif args.bk == "matmul-fp8":
            bench_matmul(args.n, jnp.float8_e5m2)
        elif args.bk == "mha":
            bench_mha(args.n)
        elif args.bk == "ffn":
            bench_ffn(args.n)
        elif args.bk == "mem":
            bench_mem(min(args.n, 20))

    if args.trace:
        with jax.profiler.trace(args.trace):
            run()
        print(f"trace written to {args.trace}", file=sys.stderr)
    else:
        run()


if __name__ == "__main__":
    main()
