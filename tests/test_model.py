"""Oracle-model tests: fixture parity with the reference's test_attn, plus
cross-validation against an independent numpy simulator (tests/numpy_sim.py),
prefill==decode equivalence, and ring-buffer/sink behavior past the window.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.config import ModelConfig
from yalm_tpu.models import KVCache, decode_step, load_weights, prefill
from yalm_tpu.ops.attention import attend_one
from yalm_tpu.ops.core import apply_rope, moe_gate, rmsnorm
from yalm_tpu.utils.testing import synth_checkpoint, tiny_config

from numpy_sim import NumpySim


def _load(tmp_path, cfg, seed=0):
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=seed)
    yf = read_yalm(path)
    return load_weights(yf, cfg), yf


# ---------------------------------------------------------------------------
# Reference fixture: src/test.cpp:68-126 (one-hot q/k/v with a 1e4 spike)
# ---------------------------------------------------------------------------

def test_attn_reference_fixture():
    head_dim, n_heads, n_kv_heads, seq_len = 3, 2, 1, 4
    q = jnp.array([[0.0, 1e4, 0.0], [0.0, 0.0, 1e4]])  # (n_heads, head_dim)
    kb = jnp.array([[1.0, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0]], jnp.float16)
    kb = kb.reshape(seq_len, n_kv_heads, head_dim)
    vb = kb
    q3 = q.reshape(n_kv_heads, n_heads, head_dim)
    out = attend_one(q3, kb, vb, jnp.ones(seq_len, bool))
    out = np.asarray(out).reshape(n_heads, head_dim)
    # softmax saturates on the spiked key -> exact one-hot mixes
    np.testing.assert_allclose(out[0], [0.0, 1.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(out[1], [0.0, 0.0, 1.0], atol=1e-4)


def test_rope_matches_scalar_reference():
    """apply_rope == the reference's pairwise loop (src/infer.cpp:200-213)."""
    from numpy_sim import rope as rope_ref
    rng = np.random.default_rng(0)
    n_heads, head_dim, rotary_dim, theta, pos = 3, 8, 6, 10000.0, 17
    vec = rng.standard_normal(n_heads * head_dim).astype(np.float32)
    expect = rope_ref(vec, head_dim, pos, theta, rotary_dim)
    got = apply_rope(jnp.asarray(vec).reshape(n_heads, head_dim),
                     jnp.asarray(pos), theta, rotary_dim)
    np.testing.assert_allclose(np.asarray(got).ravel(), expect, rtol=1e-5, atol=1e-5)


def test_rmsnorm_eps_inside_sqrt():
    x = jnp.ones(4) * 2.0
    w = jnp.ones(4)
    eps = 0.5
    got = rmsnorm(x, w, eps)
    expect = 2.0 / math.sqrt(4.0 + eps)  # sqrt(mean(x^2) + eps)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-6)


def test_moe_gate_matches_reference_normalization():
    logits = jnp.array([1.0, 3.0, 2.0, -1.0])
    w, idx = moe_gate(logits, 2)
    assert list(np.asarray(idx)) == [1, 2]
    e = np.exp(np.array([3.0, 2.0]) - 3.0)
    np.testing.assert_allclose(np.asarray(w), e / e.sum(), rtol=1e-5)


# ---------------------------------------------------------------------------
# Cross-validation against the independent numpy simulator
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("moe", [False, True])
def test_decode_matches_numpy_sim(tmp_path, moe):
    cfg = tiny_config(max_seq_len=16, n_layers=2,
                      **({"n_experts": 4, "n_experts_active": 2} if moe else {}))
    weights, yf = _load(tmp_path, cfg)
    sim = NumpySim(cfg, yf.tensors)
    cache = KVCache.init(cfg)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.vocab_size, size=10)
    for pos, tok in enumerate(tokens):
        logits, cache = decode_step(cfg, weights, jnp.int32(tok), jnp.int32(pos), cache)
        expect = sim.forward(int(tok), pos)
        np.testing.assert_allclose(np.asarray(logits), expect, rtol=2e-3, atol=2e-3)


def test_decode_past_window_ring_and_sinks(tmp_path):
    """Positions beyond max_seq_len: ring replacement + sink re-rotation."""
    cfg = tiny_config(max_seq_len=8, n_layers=2, dim=32, hidden_dim=64,
                      head_dim=8, rotary_dim=8, n_heads=4, n_kv_heads=2, vocab_size=64)
    weights, yf = _load(tmp_path, cfg)
    sim = NumpySim(cfg, yf.tensors)
    cache = KVCache.init(cfg)

    rng = np.random.default_rng(2)
    tokens = rng.integers(0, cfg.vocab_size, size=20)  # 20 > 8: exercises wrap twice
    for pos, tok in enumerate(tokens):
        logits, cache = decode_step(cfg, weights, jnp.int32(tok), jnp.int32(pos), cache)
        expect = sim.forward(int(tok), pos)
        np.testing.assert_allclose(np.asarray(logits), expect, rtol=5e-3, atol=5e-3,
                                   err_msg=f"pos={pos}")
    # cache contents agree too (f16 in both)
    np.testing.assert_allclose(
        np.asarray(cache.k[0]).reshape(cfg.max_seq_len, -1).astype(np.float32),
        sim.kcache[0].astype(np.float32), rtol=2e-2, atol=2e-2)


def test_qkv_clip(tmp_path):
    cfg = tiny_config(qkv_clip=0.05)
    weights, yf = _load(tmp_path, cfg)
    sim = NumpySim(cfg, yf.tensors)
    cache = KVCache.init(cfg)
    logits, cache = decode_step(cfg, weights, jnp.int32(5), jnp.int32(0), cache)
    np.testing.assert_allclose(np.asarray(logits), sim.forward(5, 0), rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# Prefill == sequential decode
# ---------------------------------------------------------------------------

def test_prefill_matches_sequential_decode(tmp_path):
    cfg = tiny_config(max_seq_len=32)
    weights, _ = _load(tmp_path, cfg)
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=9), jnp.int32)

    # sequential decode
    cache_a = KVCache.init(cfg)
    for pos in range(len(tokens)):
        logits_a, cache_a = decode_step(cfg, weights, tokens[pos], jnp.int32(pos), cache_a)

    # one padded prefill chunk
    T = 16
    padded = jnp.zeros(T, jnp.int32).at[: len(tokens)].set(tokens)
    cache_b = KVCache.init(cfg)
    logits_b, cache_b = prefill(cfg, weights, padded, jnp.int32(0),
                                jnp.int32(len(tokens)), cache_b, logits_mode="last")

    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b), rtol=1e-4, atol=1e-4)
    # caches identical on the written region; padding region untouched (zeros)
    np.testing.assert_allclose(np.asarray(cache_a.k), np.asarray(cache_b.k), rtol=1e-3, atol=1e-3)
    assert np.all(np.asarray(cache_b.k)[:, len(tokens):] == 0)


def test_prefill_chunked_matches_single_chunk(tmp_path):
    cfg = tiny_config(max_seq_len=32)
    weights, _ = _load(tmp_path, cfg)
    rng = np.random.default_rng(4)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=12), jnp.int32)

    cache_a = KVCache.init(cfg)
    logits_a, cache_a = prefill(cfg, weights, tokens, jnp.int32(0),
                                jnp.int32(12), cache_a, logits_mode="last")

    cache_b = KVCache.init(cfg)
    _, cache_b = prefill(cfg, weights, tokens[:8], jnp.int32(0), jnp.int32(8),
                         cache_b, logits_mode="none")
    logits_b, cache_b = prefill(cfg, weights, tokens[8:], jnp.int32(8), jnp.int32(4),
                                cache_b, logits_mode="last")
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b), rtol=1e-4, atol=1e-4)


def test_prefill_logits_all_matches_decode(tmp_path):
    cfg = tiny_config(max_seq_len=32)
    weights, _ = _load(tmp_path, cfg)
    tokens = jnp.asarray([3, 7, 11, 13], jnp.int32)
    cache = KVCache.init(cfg)
    all_logits, _ = prefill(cfg, weights, tokens, jnp.int32(0), jnp.int32(4),
                            cache, logits_mode="all")
    cache2 = KVCache.init(cfg)
    for pos in range(4):
        step_logits, cache2 = decode_step(cfg, weights, tokens[pos], jnp.int32(pos), cache2)
        np.testing.assert_allclose(np.asarray(all_logits[pos]), np.asarray(step_logits),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dtype", ["fp16", "fp8"])
def test_quantized_weights_run(tmp_path, dtype):
    cfg = tiny_config(weight_dtype=dtype)
    weights, _ = _load(tmp_path, cfg)
    cache = KVCache.init(cfg)
    logits, _ = decode_step(cfg, weights, jnp.int32(1), jnp.int32(0), cache)
    assert np.isfinite(np.asarray(logits)).all()
