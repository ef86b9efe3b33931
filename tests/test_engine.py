"""Engine + sampler tests: prefill/decode equivalence through the engine,
greedy determinism, perplexity math, window-overflow handling."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.engine import Engine
from yalm_tpu.models import KVCache, decode_step
from yalm_tpu.models.weights import load_weights
from yalm_tpu.sampler import logprob_of, sample, sample_argmax, sample_topk
from yalm_tpu.utils.testing import synth_checkpoint, tiny_config


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    cfg = tiny_config(max_seq_len=64)
    path = str(tmp_path_factory.mktemp("ckpt") / "m.yalm")
    synth_checkpoint(path, cfg)
    return Engine.from_checkpoint(path)


def test_sampler_argmax_and_temp_zero():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal(100), jnp.float32)
    a = int(sample_argmax(logits))
    assert a == int(np.argmax(np.asarray(logits)))
    s = sample(logits, jax.random.PRNGKey(0), jnp.float32(0.0))
    assert int(s) == a
    t = sample_topk(logits, jax.random.PRNGKey(0), jnp.float32(0.0), 5)
    assert int(t) == a


def test_sampler_distribution():
    # temperature sampling follows softmax(logits/T)
    logits = jnp.asarray([2.0, 0.0, -2.0])
    keys = jax.random.split(jax.random.PRNGKey(1), 2000)
    samples = jax.vmap(lambda k: sample(logits, k, jnp.float32(1.0)))(keys)
    counts = np.bincount(np.asarray(samples), minlength=3) / 2000
    probs = np.exp([2.0, 0.0, -2.0]) / np.exp([2.0, 0.0, -2.0]).sum()
    np.testing.assert_allclose(counts, probs, atol=0.05)


def test_logprob_of():
    logits = jnp.asarray([1.0, 2.0, 3.0])
    lp = float(logprob_of(logits, jnp.int32(2)))
    expect = 3.0 - math.log(np.exp([1.0, 2.0, 3.0]).sum())
    assert abs(lp - expect) < 1e-5


def test_greedy_generation_deterministic(engine):
    engine.reset()
    toks1 = list(engine.generate([1, 5, 9], max_steps=8, temperature=0.0, seed=0))
    engine.reset()
    toks2 = list(engine.generate([1, 5, 9], max_steps=8, temperature=0.0, seed=123))
    assert toks1 == toks2  # greedy ignores the seed
    assert len(toks1) == 8


def test_engine_prefill_matches_stepwise(engine):
    """Engine chunked prefill == raw sequential decode_step."""
    cfg = engine.cfg
    prompt = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    engine.reset()
    engine.prefill_tokens(prompt, want_logits=True)
    got = np.asarray(engine._last_logits)

    cache = KVCache.init(cfg)
    for pos, tok in enumerate(prompt):
        logits, cache = decode_step(cfg, engine.weights, jnp.int32(tok), jnp.int32(pos), cache)
    np.testing.assert_allclose(got, np.asarray(logits), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(engine.cache.k), np.asarray(cache.k),
                               rtol=1e-3, atol=1e-3)


def test_engine_long_prompt_past_window(tmp_path):
    """Prompts longer than the context window hydrate via the ring buffer."""
    cfg = tiny_config(max_seq_len=16)
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg)
    eng = Engine.from_checkpoint(path)
    prompt = list(np.random.default_rng(0).integers(0, cfg.vocab_size, size=40))
    eng.prefill_tokens(prompt, want_logits=True)
    assert eng.pos == 40
    # logits equal full stepwise hydration
    cache = KVCache.init(cfg)
    for pos, tok in enumerate(prompt):
        logits, cache = decode_step(cfg, eng.weights, jnp.int32(tok), jnp.int32(pos), cache)
    np.testing.assert_allclose(np.asarray(eng._last_logits), np.asarray(logits),
                               rtol=2e-3, atol=2e-3)


def test_perplexity_matches_manual(engine):
    engine.reset()
    toks = [1, 5, 9, 2, 6, 5, 3, 5, 8, 9]
    ppl, err, N = engine.perplexity(toks)
    assert N == len(toks) - 1

    # manual: stepwise logits, log-softmax gather
    cfg = engine.cfg
    cache = KVCache.init(cfg)
    lps = []
    for pos in range(len(toks) - 1):
        logits, cache = decode_step(cfg, engine.weights, jnp.int32(toks[pos]),
                                    jnp.int32(pos), cache)
        lp = np.asarray(jax.nn.log_softmax(logits))[toks[pos + 1]]
        lps.append(lp)
    expect = float(np.exp(-np.mean(lps)))
    assert abs(ppl - expect) / expect < 1e-3
    assert err >= 0


def test_engine_generate_stops_on_stop_token(engine):
    engine.reset()
    out = list(engine.generate([1, 2, 3], max_steps=50, temperature=0.0,
                               stop_tokens=()))
    engine.reset()
    # force every generated token to be a stop token -> stops after 1
    out2 = list(engine.generate([1, 2, 3], max_steps=50, temperature=0.0,
                                stop_tokens={out[0]}))
    assert out2 == [out[0]]
