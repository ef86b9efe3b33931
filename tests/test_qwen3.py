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


def test_qwen3_parallel_paths_reject(tmp_path):
    from yalm_tpu.parallel.fast_tp import fast_tp_supported
    from yalm_tpu.parallel.pipeline import pp_supported
    from yalm_tpu.parallel.ring import ring_supported
    cfg, _ = _ckpt(tmp_path, seed=145, n_layers=4)
    assert not fast_tp_supported(cfg, 2)
    assert not ring_supported(cfg, 2, 1)
    assert not pp_supported(cfg, 2, 16)
