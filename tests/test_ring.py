"""Sequence-parallel ring-attention prefill (parallel/ring.py).

Invariants: the ring prefill's last-token logits and written K/V rows
match the single-device prefill oracle to bf16 tolerance on a virtual
('sp', 'tp') mesh, and decode continues bit-exactly from the placed
cache. (No reference counterpart: single device, per-token hydration,
src/main.cpp:91-97.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.models import load_weights
from yalm_tpu.models.cache import KVCache
from yalm_tpu.models.fast import FastWeights, prefill_fast, decode_step_fast
from yalm_tpu.parallel.ring import (make_prefill_ring, ring_prefill_cache,
                                    ring_supported, shard_ring_weights)
from yalm_tpu.utils.testing import synth_checkpoint

from test_fast_path import fast_config


def _mesh(sp, tp):
    return jax.make_mesh((sp, tp), ("sp", "tp"),
                         devices=jax.devices()[: sp * tp])


def _setup(tmp_path, seed=91, **over):
    cfg = fast_config(max_seq_len=64, **over)
    path = str(tmp_path / f"r{seed}.yalm")
    synth_checkpoint(path, cfg, seed=seed)
    weights = load_weights(read_yalm(path), cfg)
    return cfg, weights


GEMMA2 = dict(embed_scale=16.0, has_post_norms=True, attn_softcap=50.0,
              final_softcap=30.0, sliding_window=16, layer_sliding=(1, 0),
              act_type="gelu")
GEMMA3 = dict(embed_scale=16.0, has_post_norms=True, has_qk_norm=True,
              sliding_window=16, layer_sliding=(1, 0), act_type="gelu",
              rope_theta=1e6, rope_scale=("gemma3", 2.0, 1e4))


@pytest.mark.parametrize("sp,tp,over", [
    (4, 1, {}), (2, 2, {}), (8, 1, {}), (4, 2, {}),
    (2, 2, dict(embed_scale=8.0)),  # Gemma embedding normalizer
    # full Gemma2/3 stacks through the ring body: sliding masks + softcap
    # + sandwich norms + (g3) dual per-layer rope — T=32 > window=16 so
    # the sliding mask genuinely drops history inside the ring hops
    (2, 2, GEMMA2),
    (2, 2, GEMMA3),
])
def test_ring_prefill_matches_oracle(tmp_path, sp, tp, over):
    cfg, weights = _setup(tmp_path, seed=91 + sp * 10 + tp, **over)
    assert ring_supported(cfg, sp, tp)
    mesh = _mesh(sp, tp)
    T = 32
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, T), jnp.int32)

    fw = FastWeights.from_weights(weights, cfg)
    lane = KVCache.init(cfg, jnp.bfloat16)
    want, lane = prefill_fast(cfg, fw, tokens, jnp.int32(0), jnp.int32(T),
                              lane, logits_mode="last")

    rw = shard_ring_weights(weights, cfg, mesh)
    ring = jax.jit(make_prefill_ring(cfg, mesh))
    logits, ck, cv = ring(rw, tokens)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    assert int(jnp.argmax(logits)) == int(jnp.argmax(want))
    # written K/V rows match the oracle's cache slots [0, T) (later layers
    # see ulp-level activation drift from the online-softmax ordering, so
    # allow one bf16 step at the observed magnitudes)
    np.testing.assert_allclose(
        np.asarray(ck, np.float32), np.asarray(lane.k[:, :T], np.float32),
        rtol=3e-2, atol=4e-2)
    np.testing.assert_allclose(
        np.asarray(cv, np.float32), np.asarray(lane.v[:, :T], np.float32),
        rtol=3e-2, atol=4e-2)


def test_ring_prefill_then_decode_continues(tmp_path):
    """Decode from the ring-placed cache emits the same greedy stream as
    decode from the oracle-prefilled cache."""
    cfg, weights = _setup(tmp_path, seed=97)
    mesh = _mesh(4, 2)
    T = 32
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, T), jnp.int32)

    fw = FastWeights.from_weights(weights, cfg)
    lane = KVCache.init(cfg, jnp.bfloat16)
    want_logits, lane = prefill_fast(cfg, fw, tokens, jnp.int32(0),
                                     jnp.int32(T), lane, logits_mode="last")

    rw = shard_ring_weights(weights, cfg, mesh)
    ring = jax.jit(make_prefill_ring(cfg, mesh))
    logits, ck, cv = ring(rw, tokens)
    cache = ring_prefill_cache(cfg, jax.device_put(ck), jax.device_put(cv),
                               jnp.bfloat16)

    cur_w = int(jnp.argmax(want_logits))
    cur_r = int(jnp.argmax(logits))
    assert cur_w == cur_r
    got, want = [], []
    for step in range(8):
        lw, lane = decode_step_fast(cfg, fw, jnp.int32(cur_w),
                                    jnp.int32(T + step), lane)
        lr, cache = decode_step_fast(cfg, fw, jnp.int32(cur_r),
                                     jnp.int32(T + step), cache)
        cur_w = int(jnp.argmax(lw))
        cur_r = int(jnp.argmax(lr))
        want.append(cur_w)
        got.append(cur_r)
    assert got == want


def test_ring_rejects_moe(tmp_path):
    cfg, _ = _setup(tmp_path, seed=99)
    import dataclasses
    moe = dataclasses.replace(cfg, n_experts=4, n_experts_active=2)
    assert not ring_supported(moe, 4, 1)
