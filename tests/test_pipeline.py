"""Pipeline-parallel decode tick (parallel/pipeline.py).

Invariant: the pp-sharded, microbatch-pipelined tick computes exactly what
the single-device batched tick computes — same logits, same cache — layer
stages and activation rotation are pure reorderings of the same math.
(No reference counterpart: "the entire model must fit into VRAM",
reference README.md:87.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.models import load_weights
from yalm_tpu.models.cache import KVCache
from yalm_tpu.models.fast import FastWeights, decode_step_fast_batched
from yalm_tpu.parallel.pipeline import (make_tick_pp, pp_supported,
                                        shard_pp_cache, shard_pp_weights)
from yalm_tpu.utils.testing import synth_checkpoint

from test_fast_path import fast_config


def _setup(tmp_path, seed, pp, B, n_layers=4, **over):
    cfg = fast_config(max_seq_len=64, n_layers=n_layers, **over)
    assert pp_supported(cfg, pp, B)
    path = str(tmp_path / f"p{seed}.yalm")
    synth_checkpoint(path, cfg, seed=seed)
    weights = load_weights(read_yalm(path), cfg)
    fw = FastWeights.from_weights(weights, cfg)
    mesh = jax.make_mesh((pp,), ("pp",), devices=jax.devices()[:pp])
    return cfg, fw, mesh


GEMMA2 = dict(embed_scale=16.0, has_post_norms=True, attn_softcap=50.0,
              final_softcap=30.0, sliding_window=16,
              layer_sliding=(1, 0, 1, 0), act_type="gelu")
GEMMA3 = dict(embed_scale=16.0, has_post_norms=True, has_qk_norm=True,
              sliding_window=16, layer_sliding=(1, 0, 1, 0),
              act_type="gelu", rope_theta=1e6,
              rope_scale=("gemma3", 2.0, 1e4))


@pytest.mark.parametrize("pp,B,over", [
    (2, 16, {}), (4, 32, {}),
    (2, 16, dict(embed_scale=8.0)),  # Gemma embedding normalizer
    # Gemma2/3 through the pipeline stages: per-layer windows / dual rope
    # index the static tuples by GLOBAL layer id (stage offset + local i)
    (2, 16, GEMMA2),
    (2, 16, GEMMA3),
])
def test_pp_tick_matches_single_device(tmp_path, pp, B, over):
    cfg, fw, mesh = _setup(tmp_path, seed=101 + pp, pp=pp, B=B, **over)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, B), jnp.int32)
    positions = jnp.asarray(rng.integers(0, 20, B), jnp.int32)
    write = jnp.ones((B,), jnp.int32)

    cache = KVCache.init(cfg, jnp.bfloat16, batch=B)
    # hydrate some history so attention is non-trivial
    h_tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, B), jnp.int32)
    _, cache = decode_step_fast_batched(cfg, fw, h_tokens,
                                        jnp.zeros((B,), jnp.int32), cache,
                                        write)
    want, want_cache = decode_step_fast_batched(cfg, fw, tokens, positions,
                                                cache, write)

    pw = shard_pp_weights(fw, cfg, mesh)
    pcache = shard_pp_cache(cache, mesh)
    tick = jax.jit(make_tick_pp(cfg, mesh, B))
    got, got_cache = tick(pw, tokens, positions, pcache, write)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    assert (np.asarray(got).argmax(-1) == np.asarray(want).argmax(-1)).all()
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(got_cache.k), np.float32),
        np.asarray(want_cache.k, np.float32))


def test_pp_tick_stream_over_ticks(tmp_path):
    """Greedy streams over several pipelined ticks match the single-device
    scheduler-style loop, including masked (non-writing) lanes."""
    B, pp = 16, 4
    cfg, fw, mesh = _setup(tmp_path, seed=111, pp=pp, B=B)
    pw = shard_pp_weights(fw, cfg, mesh)
    tick = jax.jit(make_tick_pp(cfg, mesh, B))

    tokens = jnp.asarray([1 + (i % 5) for i in range(B)], jnp.int32)
    write = jnp.asarray([1] * (B - 2) + [0, 0], jnp.int32)  # 2 idle lanes

    cache_s = KVCache.init(cfg, jnp.bfloat16, batch=B)
    cache_p = shard_pp_cache(KVCache.init(cfg, jnp.bfloat16, batch=B), mesh)
    toks_s = toks_p = tokens
    got, want = [], []
    for step in range(6):
        pos = jnp.full((B,), step, jnp.int32)
        lw, cache_s = decode_step_fast_batched(cfg, fw, toks_s, pos,
                                               cache_s, write)
        lp, cache_p = tick(pw, toks_p, pos, cache_p, write)
        toks_s = jnp.argmax(lw, axis=-1).astype(jnp.int32)
        toks_p = jnp.argmax(lp, axis=-1).astype(jnp.int32)
        want.append(np.asarray(toks_s).tolist())
        got.append(np.asarray(toks_p).tolist())
    assert got == want


def test_pp_rejects_bad_shapes(tmp_path):
    cfg = fast_config(n_layers=3)
    assert not pp_supported(cfg, 2, 16)   # layers don't divide
    cfg2 = fast_config(n_layers=4)
    assert not pp_supported(cfg2, 4, 30)  # batch doesn't divide
    import dataclasses
    moe = dataclasses.replace(cfg2, n_experts=4, n_experts_active=2)
    assert not pp_supported(moe, 2, 16)
