"""Parity tests for the fully-fused attention-block kernel (ops/pallas/block.py).

The jnp emulation is the numerics contract (same helpers the other fast-path
kernels emulate through); interpret=True runs the REAL kernel — manual DMA,
phased weight streams, tile-mask-reduce flatten — through the Pallas
interpreter and must match it exactly. Mirrors the reference's CPU-vs-CUDA
kernel parity strategy (src/test.cpp:148-206).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.ops.pallas.block import attn_block_l


def _mk(seed, *, L=3, S=16, Hk=2, qpk=2, dim=256, dtype=jnp.float32,
        bias=False):
    D = 128
    Hq = Hk * qpk
    q_dim = Hq * D
    kv_dim = Hk * D
    rng = np.random.default_rng(seed)

    def r(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    x = r(dim) * 0.5
    norm_w = r(L, dim) * 0.1 + 1.0
    wqkv = (r(L, q_dim + 2 * kv_dim, dim) * 0.1).astype(dtype)
    wo = (r(L, dim, q_dim) * 0.1).astype(dtype)
    k_all = (r(L, S, Hk, D) * 0.3).astype(jnp.bfloat16)
    v_all = (r(L, S, Hk, D) * 0.3).astype(jnp.bfloat16)
    bqkv = (r(L, q_dim + 2 * kv_dim) * 0.2) if bias else None
    return x, norm_w, wqkv, wo, k_all, v_all, bqkv


def _run(interpret, args, scalars, **kw):
    x, norm_w, wqkv, wo, k_all, v_all, bqkv = args
    layer, kv_pos, kv_len, kv_sink, pos = (jnp.int32(s) for s in scalars)
    return attn_block_l(
        x, norm_w, wqkv, wo, k_all, v_all, layer, kv_pos, kv_len, kv_sink,
        pos, n_heads=kw.pop("n_heads"), kv_sinks=2, theta=10000.0,
        rotary_dim=128, norm_eps=1e-5, bqkv_all=bqkv,
        interpret=interpret, **kw)


CASES = [
    # (scalars: layer, kv_pos, kv_len, kv_sink, pos)
    (0, 0, 1, 0, 0),          # very first token
    (1, 5, 6, 0, 5),          # mid-prefill position
    (2, 11, 16, 0, 11),       # window almost full
    (1, 2, 16, 2, 21),        # ring-wrapped: sinks active
]


@pytest.mark.parametrize("scalars", CASES)
@pytest.mark.parametrize("bias", [False, True])
def test_interpret_matches_emulation(scalars, bias):
    args = _mk(7, bias=bias)
    out_e, ke, ve = _run(None, args, scalars, n_heads=4)
    out_i, ki, vi = _run(True, args, scalars, n_heads=4)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(out_e),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(ki, np.float32),
                               np.asarray(ke, np.float32), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(vi, np.float32),
                               np.asarray(ve, np.float32), rtol=1e-2, atol=1e-2)


def test_qkv_clip_applies():
    args = _mk(3)
    tight = _run(None, args, (0, 0, 1, 0, 0), n_heads=4, qkv_clip=0.01)
    loose = _run(None, args, (0, 0, 1, 0, 0), n_heads=4)
    assert not np.allclose(np.asarray(tight[0]), np.asarray(loose[0]))
    ti = _run(True, args, (0, 0, 1, 0, 0), n_heads=4, qkv_clip=0.01)
    np.testing.assert_allclose(np.asarray(ti[0]), np.asarray(tight[0]),
                               rtol=3e-2, atol=3e-2)


def test_single_kv_head_wide_group():
    # Hk=1, qpk=4: padded P=8 rows with 4 valid — exercises the flatten mask
    args = _mk(11, Hk=1, qpk=4)
    scalars = (1, 3, 4, 0, 3)
    out_e, *_ = _run(None, args, scalars, n_heads=4)
    out_i, *_ = _run(True, args, scalars, n_heads=4)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(out_e),
                               rtol=3e-2, atol=3e-2)


def test_fp8_weights():
    args = list(_mk(5, dtype=jnp.float8_e5m2))
    scalars = (2, 7, 8, 0, 7)
    out_e, *_ = _run(None, args, scalars, n_heads=4)
    out_i, *_ = _run(True, args, scalars, n_heads=4)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(out_e),
                               rtol=3e-2, atol=3e-2)
