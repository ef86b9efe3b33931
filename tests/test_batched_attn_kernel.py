"""Interpret-mode parity for the cross-lane-pipelined batched attention
kernel (ops/pallas/attention.py _attn_step_batched_kernel).

One program sweeps all lanes with the next block's fetch always in flight;
this must match the per-lane jnp emulation across mixed per-lane states:
different kv_len/kv_pos, ring + sinks, and write-masked lanes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.ops.pallas.attention import attend_step_batched_l


def _mk(seed, B=4, L=3, S=32, Hk=2, qpk=2, D=128):
    rng = np.random.default_rng(seed)

    def r(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    q = r(B, Hk, qpk, D)
    kn = r(B, Hk, D)
    vn = r(B, Hk, D)
    k_all = (r(B, L, S, Hk, D) * 0.3).astype(jnp.bfloat16)
    v_all = (r(B, L, S, Hk, D) * 0.3).astype(jnp.bfloat16)
    return q, kn, vn, k_all, v_all


CASES = [
    # per-lane (kv_pos, kv_len, kv_sink, pos, write) — mixed regimes
    dict(kv_pos=[0, 5, 31, 2], kv_len=[1, 6, 32, 32], kv_sink=[0, 0, 0, 2],
         pos=[0, 5, 31, 40], write=[1, 1, 1, 1]),
    dict(kv_pos=[9, 2, 17, 25], kv_len=[10, 32, 18, 26],
         kv_sink=[0, 2, 0, 0], pos=[9, 35, 17, 25], write=[1, 0, 1, 0]),
    # multiple blocks per lane (block_s=8) with a lane boundary mid-pipe
    dict(kv_pos=[15, 7, 23, 31], kv_len=[16, 8, 24, 32],
         kv_sink=[0, 0, 0, 0], pos=[15, 7, 23, 31], write=[1, 1, 0, 1]),
]


@pytest.mark.parametrize("case", CASES)
def test_interpret_matches_emulation(case):
    args = _mk(5)
    layer = jnp.int32(1)
    scal = [jnp.asarray(case[k], jnp.int32)
            for k in ("kv_pos", "kv_len", "kv_sink", "pos", "write")]
    kw = dict(kv_sinks=2, theta=1e4, rotary_dim=128, block_s=8)
    oe, ke, ve = attend_step_batched_l(*args, layer, *scal, **kw)
    oi, ki, vi = attend_step_batched_l(*args, layer, *scal, **kw,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(oi), np.asarray(oe),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(ki, np.float32),
                               np.asarray(ke, np.float32), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(vi, np.float32),
                               np.asarray(ve, np.float32), rtol=1e-2, atol=1e-2)
