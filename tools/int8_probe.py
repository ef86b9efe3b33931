"""Decision probe for an int8 KV cache (round-4 perf candidate).

Measures, on the real chip:
  1. read+convert bandwidth of 1-byte dtypes -> bf16/f32 (the VPU convert
     rate that made e4m3 a loser and e5m2 a winner in round 3);
  2. attention-shaped dots with the KV operand in int8, three ways:
       a. bf16 x bf16 (control — what the kernel does after staging),
       b. int8 -> bf16 convert then bf16 dot (staging an int8 cache),
       c. int8 x int8 NATIVE MXU dot, int32 accumulate (skips the convert;
          requires quantizing q once per step, which is free).
Run from /root/repo (no PYTHONPATH): python tools/int8_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

Hk, Gq, D, T = 8, 4, 128, 4096   # Mistral-7B decode attention shapes


def fence(x):
    return np.asarray(jax.tree.leaves(x)[0])


def bench_dispatch(fn, arg, iters=30):
    """Repeated host dispatches of one jitted fn; honest for memory-bound
    reductions (each call re-reads the argument; async dispatch overlaps
    launch cost). Returns seconds/iter."""
    fence(fn(arg))
    t0 = time.perf_counter()
    outs = [fn(arg) for _ in range(iters)]
    fence(outs[-1])
    return (time.perf_counter() - t0) / iters


def convert_bw():
    n = 16384 * 16384  # 256M elements
    base = jax.random.normal(jax.random.PRNGKey(0), (16384, 16384),
                             jnp.bfloat16)
    for dt in (jnp.bfloat16, jnp.int8, jnp.float8_e5m2, jnp.float8_e4m3fn):
        if dt == jnp.int8:
            src = (base * 10).astype(jnp.int8)
        else:
            src = base.astype(dt)
        red = jax.jit(lambda b: jnp.sum(b.astype(jnp.bfloat16)
                                        .astype(jnp.float32)))
        dt_s = bench_dispatch(red, src)
        nb = n * jnp.dtype(dt).itemsize
        print(f"convert {jnp.dtype(dt).name:>13} -> bf16 -> sum: "
              f"{dt_s*1e3:7.2f} ms  {nb/dt_s/1e9:6.0f} GB/s (src bytes)")


def devloop(fn, init, iters, *consts):
    @jax.jit
    def run(consts, carry):
        return jax.lax.fori_loop(0, iters, lambda i, c: fn(i, c, *consts),
                                 carry)
    out = run(consts, init)
    fence(out)
    t0 = time.perf_counter()
    out = run(consts, init)
    fence(out)
    return (time.perf_counter() - t0) / iters


def attn_dots():
    key = jax.random.PRNGKey(0)
    kb = jax.random.normal(key, (Hk, T, D), jnp.bfloat16)
    vb = jax.random.normal(jax.random.fold_in(key, 1), (Hk, T, D),
                           jnp.bfloat16)
    k8 = (kb * 16).astype(jnp.int8)
    v8 = (vb * 16).astype(jnp.int8)
    q0 = jnp.ones((Hk, Gq, D), jnp.bfloat16)
    q8 = (q0 * 16).astype(jnp.int8)
    kv_bytes = 2 * Hk * T * D  # per variant, scaled by itemsize below

    def dot_qk(q, k):  # (Hk,Gq,D) x (Hk,T,D) -> (Hk,Gq,T)
        return jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32 if q.dtype == jnp.int8
            else jnp.float32)

    def dot_pv(p, v):  # (Hk,Gq,T) x (Hk,T,D) -> (Hk,Gq,D)
        return jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32 if p.dtype == jnp.int8
            else jnp.float32)

    def softmaxish(s):
        s = s.astype(jnp.float32)
        return jax.nn.softmax(s, axis=-1)

    def body_bf16(i, carry, kb, vb):
        q, acc = carry
        s = dot_qk(q, kb)
        p = softmaxish(s).astype(jnp.bfloat16)
        o = dot_pv(p, vb)
        return (q0 + o.astype(jnp.bfloat16) * 1e-6, acc + o[0, 0, 0])

    def body_cvt(i, carry, k8, v8):
        q, acc = carry
        kbf = k8.astype(jnp.bfloat16)
        vbf = v8.astype(jnp.bfloat16)
        s = dot_qk(q, kbf)
        p = softmaxish(s).astype(jnp.bfloat16)
        o = dot_pv(p, vbf)
        return (q0 + o.astype(jnp.bfloat16) * 1e-6, acc + o[0, 0, 0])

    def body_i8(i, carry, k8, v8):
        q, acc = carry
        s = dot_qk(q8, k8)                       # int8 x int8 -> int32 MXU
        p = softmaxish(s)
        p8 = (p * 127.0).astype(jnp.int8)        # quantized probs
        o = dot_pv(p8, v8).astype(jnp.float32) / (127.0 * 16.0)
        return (q0 + o.astype(jnp.bfloat16) * 1e-6, acc + o[0, 0, 0])

    def body_i8k(i, carry, k8, vb):
        # int8 k native dot; v converted to bf16 (exact p.v)
        q, acc = carry
        s = dot_qk(q8, k8)
        p = softmaxish(s).astype(jnp.bfloat16)
        o = dot_pv(p, vb.astype(jnp.bfloat16))
        return (q0 + o.astype(jnp.bfloat16) * 1e-6, acc + o[0, 0, 0])

    iters = 200
    for name, body, args, itemsize in (
            ("bf16 k,v  bf16 dots", body_bf16, (kb, vb), 2),
            ("int8 k,v  convert->bf16 dots", body_cvt, (k8, v8), 1),
            ("int8 k,v  NATIVE int8 dots", body_i8, (k8, v8), 1),
            ("int8 k native qk, int8 v->bf16 pv", body_i8k, (k8, v8), 1)):
        dt_s = devloop(body, (q0, jnp.float32(0)), iters, *args)
        nb = kv_bytes * itemsize
        print(f"attn {name:<34}: {dt_s*1e6:7.1f} us  "
              f"{nb/dt_s/1e9:6.0f} GB/s (cache bytes)")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    convert_bw()
    attn_dots()
