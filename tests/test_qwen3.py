"""Qwen3 family: per-head-dim q/k RMSNorm (post-projection, pre-RoPE).

Cross-framework logit parity vs HF transformers lives in
tests/test_hf_parity.py; here: the fast path matches the oracle with
qk-norm active (including across the window edge), and the scheduler's
batched tick runs it. The fused attention-block kernel is bypassed for
qk-norm models (no norm hook between wqkv and rope).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.engine import Engine
from yalm_tpu.models import load_weights
from yalm_tpu.utils.testing import synth_checkpoint

from test_fast_path import fast_config


def _ckpt(tmp_path, seed=141, **over):
    cfg = fast_config(max_seq_len=64, has_qk_norm=True, **over)
    path = str(tmp_path / f"q3_{seed}.yalm")
    synth_checkpoint(path, cfg, seed=seed)
    return cfg, path


def test_qk_norm_metadata_roundtrip(tmp_path):
    cfg, path = _ckpt(tmp_path)
    yf = read_yalm(path)
    assert yf.metadata["has_qk_norm"] == "1"
    assert "model.layers.0.attn.q_norm.weight" in yf.tensors
    w = load_weights(yf, cfg)
    assert w.layers.qn is not None and w.layers.qn.shape == (
        cfg.n_layers, cfg.head_dim)


def test_qwen3_fast_matches_oracle(tmp_path):
    cfg, path = _ckpt(tmp_path, seed=142)
    oracle = Engine.from_checkpoint(path, fast=False)
    fast = Engine.from_checkpoint(path, fast=True, kv_dtype=jnp.bfloat16)
    assert fast.fast
    prompt = [1, 5, 9, 13]
    want = list(oracle.generate(prompt, max_steps=30, temperature=0.0))
    got = list(fast.generate(prompt, max_steps=30, temperature=0.0))
    assert len(got) == len(want) == 30
    agree = 0
    for a, b in zip(got, want):
        if a != b:
            break
        agree += 1
    assert agree >= 15, (agree, got, want)


def test_qwen3_window_edge_logits(tmp_path):
    """Teacher-forced fast-vs-oracle logits across the ring/sink edge with
    qk-norm active (normed keys feed the lazy sink rotation)."""
    cfg, path = _ckpt(tmp_path, seed=143)
    fast = Engine.from_checkpoint(path, fast=True, kv_dtype=jnp.bfloat16)
    orac = Engine.from_checkpoint(path, fast=False, kv_dtype=jnp.bfloat16,
                                  compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    toks = [1, 7] + list(rng.integers(3, cfg.vocab_size,
                                      cfg.max_seq_len + 8))
    fast.prefill_tokens(toks[:2])
    orac.prefill_tokens(toks[:2])
    import jax
    for i in range(2, len(toks)):
        lf, fast.cache = fast._step_logits(
            fast.weights, jnp.int32(toks[i]), jnp.int32(fast.pos),
            fast.cache)
        lo, orac.cache = orac._step_logits(
            orac.weights, jnp.int32(toks[i]), jnp.int32(orac.pos),
            orac.cache)
        fast.pos += 1
        orac.pos += 1
        a, b = np.asarray(lf), np.asarray(lo)
        assert np.max(np.abs(a - b)) < 0.08, (fast.pos,
                                              np.max(np.abs(a - b)))


def test_qwen3_scheduler_tick(tmp_path):
    from yalm_tpu.scheduler import Request, Scheduler
    cfg, path = _ckpt(tmp_path, seed=144)
    w = load_weights(read_yalm(path), cfg)
    s = Scheduler(cfg, w, batch=8, kv_dtype=jnp.bfloat16)
    assert s.fast
    reqs = [s.submit(Request(prompt_tokens=[1, 4 + i], max_new_tokens=5,
                             temperature=0.0)) for i in range(3)]
    s.run()
    assert all(len(r.generated) == 5 for r in reqs)


def test_qwen3_mesh_scheduler_matches_single_device(tmp_path):
    """qk-norm threaded through the shard_map'd TP tick: same streams."""
    import jax
    from yalm_tpu.parallel.mesh import MeshConfig, make_mesh
    from yalm_tpu.scheduler import Request, Scheduler
    cfg, path = _ckpt(tmp_path, seed=146)
    w = load_weights(read_yalm(path), cfg)

    def reqs():
        return [Request(prompt_tokens=[1, 5 + i, 9], max_new_tokens=6,
                        temperature=0.0, seed=i) for i in range(6)]

    single = Scheduler(cfg, w, batch=8, kv_dtype=jnp.bfloat16)
    want = []
    for r in reqs():
        single.submit(r)
        want.append(r)
    single.run()

    mesh = make_mesh(MeshConfig(dp=4, tp=2), devices=jax.devices())
    sched = Scheduler(cfg, w, batch=8, kv_dtype=jnp.bfloat16, mesh=mesh)
    got = []
    for r in reqs():
        sched.submit(r)
        got.append(r)
    sched.run()
    assert [r.generated for r in got] == [r.generated for r in want]


def test_qwen3_ring_and_pipeline(tmp_path):
    """qk-norm through the sp ring prefill and the pp pipelined tick."""
    import jax
    from yalm_tpu.models.cache import KVCache
    from yalm_tpu.models.fast import (FastWeights, decode_step_fast_batched,
                                      prefill_fast)
    from yalm_tpu.parallel.pipeline import (make_tick_pp, pp_supported,
                                            shard_pp_cache, shard_pp_weights)
    from yalm_tpu.parallel.ring import (make_prefill_ring, ring_supported,
                                        shard_ring_weights)
    cfg, path = _ckpt(tmp_path, seed=147, n_layers=4)
    w = load_weights(read_yalm(path), cfg)
    fw = FastWeights.from_weights(w, cfg)

    assert ring_supported(cfg, 4, 2)
    mesh = jax.make_mesh((4, 2), ("sp", "tp"), devices=jax.devices())
    T = 32
    toks = jnp.asarray(np.random.default_rng(1).integers(
        3, cfg.vocab_size, T), jnp.int32)
    lane = KVCache.init(cfg, jnp.bfloat16)
    want, _ = prefill_fast(cfg, fw, toks, jnp.int32(0), jnp.int32(T), lane,
                           logits_mode="last")
    rw = shard_ring_weights(w, cfg, mesh)
    logits, _, _ = jax.jit(make_prefill_ring(cfg, mesh))(rw, toks)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    assert int(jnp.argmax(logits)) == int(jnp.argmax(want))

    B, pp = 16, 4
    assert pp_supported(cfg, pp, B)
    ppmesh = jax.make_mesh((pp,), ("pp",), devices=jax.devices()[:pp])
    pw = shard_pp_weights(fw, cfg, ppmesh)
    cache = KVCache.init(cfg, jnp.bfloat16, batch=B)
    btoks = jnp.asarray([3 + i for i in range(B)], jnp.int32)
    pos = jnp.zeros((B,), jnp.int32)
    wr = jnp.ones((B,), jnp.int32)
    want_b, _ = decode_step_fast_batched(cfg, fw, btoks, pos, cache, wr)
    pcache = shard_pp_cache(KVCache.init(cfg, jnp.bfloat16, batch=B), ppmesh)
    got_b, _ = jax.jit(make_tick_pp(cfg, ppmesh, B))(pw, btoks, pos,
                                                     pcache, wr)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               rtol=2e-2, atol=2e-2)
