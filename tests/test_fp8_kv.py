"""Quantized (fp8) KV cache: kernel parity + end-to-end accuracy.

The cache stores k/v rows in 1 byte/element — halving the decode step's
cache-bound traffic vs bf16; kernels widen each fetched block once to a
bf16 VMEM staging copy (ops/pallas/attention.py `_fused_attn_body`).
PRODUCTION dtype is e5m2 (the "fp8" flag): on v5e it converts at full VPU
rate (908 GB/s measured) while e4m3fn takes a ~170 GB/s software path that
makes the kernel SLOWER than bf16. e4m3 stays supported and parity-tested
(same machinery, better mantissa) for hardware where its convert is fast.
The reference's cache is always f16 (src/model.h:299-300) — this is new
capability, gated by (a) exact emulation/interpret kernel parity and (b)
an accuracy budget vs the bf16 cache at toy scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.engine import Engine
from yalm_tpu.models.weights import load_weights
from yalm_tpu.utils.testing import synth_checkpoint
from yalm_tpu.ops.pallas.attention import (attend_step_batched_l,
                                           attend_step_l,
                                           attend_step_paged_l)

from test_fast_path import fast_config

E4M3 = jnp.float8_e4m3fn
E5M2 = jnp.float8_e5m2
# e5m2 is the production cache dtype ("fp8" flag): on v5e it converts at
# full VPU rate while e4m3 takes a slow software path; both share the
# same kernel machinery (any 1-byte dtype), so parity tests cover both.


def _rand(rng, shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


@pytest.mark.parametrize("fp8", [E4M3, E5M2], ids=["e4m3", "e5m2"])
@pytest.mark.parametrize("kv_pos,kv_len,kv_sink,pos",
                         [(5, 6, 0, 5), (3, 32, 2, 40), (0, 1, 0, 0)])
def test_attend_step_l_fp8_interpret_parity(kv_pos, kv_len, kv_sink, pos, fp8):
    """REAL kernel (Pallas interpreter) vs the jnp emulation with an e4m3
    cache: staged bf16 flash, quantized row write, lazy sink view."""
    L, S, Hk, D, qpk = 2, 32, 2, 128, 2
    rng = np.random.default_rng(11)
    k_all = _rand(rng, (L, S, Hk, D), 0.5).astype(fp8)
    v_all = _rand(rng, (L, S, Hk, D), 0.5).astype(fp8)
    q = _rand(rng, (Hk, qpk, D))
    kn = _rand(rng, (Hk, D))
    vn = _rand(rng, (Hk, D))
    args = (q, kn, vn, k_all, v_all, jnp.int32(1), jnp.int32(kv_pos),
            jnp.int32(kv_len), jnp.int32(kv_sink), jnp.int32(pos))
    kw = dict(kv_sinks=2, theta=1e4, rotary_dim=D)
    oe, ke, ve = attend_step_l(*args, **kw)
    oi, ki, vi = attend_step_l(*args, **kw, interpret=True)
    np.testing.assert_allclose(np.asarray(oi), np.asarray(oe),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(ki, np.float32),
                                  np.asarray(ke, np.float32))
    np.testing.assert_array_equal(np.asarray(vi, np.float32),
                                  np.asarray(ve, np.float32))


def test_attend_step_batched_fp8_interpret_parity():
    B, L, S, Hk, D, qpk = 2, 2, 16, 2, 128, 2
    rng = np.random.default_rng(12)
    k_all = _rand(rng, (B, L, S, Hk, D), 0.5).astype(E4M3)
    v_all = _rand(rng, (B, L, S, Hk, D), 0.5).astype(E4M3)
    q = _rand(rng, (B, Hk, qpk, D))
    kn = _rand(rng, (B, Hk, D))
    vn = _rand(rng, (B, Hk, D))
    args = (q, kn, vn, k_all, v_all, jnp.int32(1),
            jnp.asarray([9, 2], jnp.int32), jnp.asarray([10, 16], jnp.int32),
            jnp.asarray([0, 2], jnp.int32), jnp.asarray([9, 21], jnp.int32),
            jnp.asarray([1, 0], jnp.int32))
    kw = dict(kv_sinks=2, theta=1e4, rotary_dim=D)
    oe, ke, ve = attend_step_batched_l(*args, **kw)
    oi, ki, vi = attend_step_batched_l(*args, **kw, interpret=True)
    np.testing.assert_allclose(np.asarray(oi), np.asarray(oe),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(ki, np.float32),
                                  np.asarray(ke, np.float32))


def test_attend_step_paged_fp8_interpret_parity():
    B, L, bs, Hk, D, qpk = 2, 2, 8, 2, 128, 2
    nblk, window = 2, 16
    n_pages = 1 + B * nblk
    rng = np.random.default_rng(13)
    kp = _rand(rng, (n_pages, L, bs, Hk, D), 0.5).astype(E4M3)
    vp = _rand(rng, (n_pages, L, bs, Hk, D), 0.5).astype(E4M3)
    q = _rand(rng, (B, Hk, qpk, D))
    kn = _rand(rng, (B, Hk, D))
    vn = _rand(rng, (B, Hk, D))
    tables = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    args = (q, kn, vn, kp, vp, tables, jnp.int32(1),
            jnp.asarray([9, 2], jnp.int32), jnp.asarray([10, 16], jnp.int32),
            jnp.asarray([0, 2], jnp.int32), jnp.asarray([9, 21], jnp.int32),
            jnp.asarray([1, 1], jnp.int32))
    kw = dict(kv_sinks=2, theta=1e4, rotary_dim=D, window=window)
    oe, ke, ve = attend_step_paged_l(*args, **kw)
    oi, ki, vi = attend_step_paged_l(*args, **kw, interpret=True)
    np.testing.assert_allclose(np.asarray(oi), np.asarray(oe),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(ki, np.float32),
                                  np.asarray(ke, np.float32))


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = fast_config(max_seq_len=64, n_layers=2)
    path = str(tmp_path_factory.mktemp("fp8kv") / "m.yalm")
    synth_checkpoint(path, cfg, seed=31)
    return cfg, path


def test_fp8_kv_logit_drift_bounded(ckpt):
    """Teacher-forced fast-path decode with the fp8 cache stays close to
    the bf16-cache logits across the window edge (sinks live)."""
    cfg, path = ckpt
    a = Engine.from_checkpoint(path, fast=True, kv_dtype=jnp.bfloat16)
    b = Engine.from_checkpoint(path, fast=True, kv_dtype=E5M2)
    rng = np.random.default_rng(0)
    toks = [1, 7] + list(rng.integers(3, cfg.vocab_size, cfg.max_seq_len + 8))
    a.prefill_tokens(toks[:2])
    b.prefill_tokens(toks[:2])
    worst = 0.0
    for i in range(2, len(toks)):
        la, a.cache = a._step_logits(a.weights, jnp.int32(toks[i]),
                                     jnp.int32(a.pos), a.cache)
        lb, b.cache = b._step_logits(b.weights, jnp.int32(toks[i]),
                                     jnp.int32(b.pos), b.cache)
        a.pos += 1
        b.pos += 1
        scale = float(np.max(np.abs(np.asarray(la)))) + 1e-6
        worst = max(worst, float(np.max(np.abs(np.asarray(la) -
                                               np.asarray(lb)))) / scale)
    # Calibrated at this toy scale: bf16-vs-f32 cache drifts 0.0065 on the
    # same metric; e4m3 observed 0.095, e5m2 (2 mantissa bits, the
    # production dtype) 0.185 — worst SINGLE logit over 70 steps.
    # Perplexity moves <0.6% (test below) — the drift is noise, not bias.
    # Gate at ~1.5x observed.
    assert worst < 0.28, worst


def test_fp8_kv_perplexity_delta(ckpt):
    """Perplexity with the fp8 cache within a small delta of bf16 (the
    BASELINE north-star metric shape, applied to the cache instead of the
    weights)."""
    cfg, path = ckpt
    rng = np.random.default_rng(5)
    # long enough to cross the window edge: the tail runs per-token
    # hydration through the ring + lazy-sink regime on the fp8 cache
    toks = [1] + list(rng.integers(3, cfg.vocab_size, cfg.max_seq_len + 30))
    a = Engine.from_checkpoint(path, fast=True, kv_dtype=jnp.bfloat16)
    ppl_a, _, _ = a.perplexity(toks)
    b = Engine.from_checkpoint(path, fast=True, kv_dtype=E5M2)
    ppl_b, _, _ = b.perplexity(toks)
    # calibrated: 0.015% observed at this scale; 2% headroom
    assert abs(ppl_b - ppl_a) / ppl_a < 0.02, (ppl_a, ppl_b)


def test_fp8_kv_oracle_runs(ckpt):
    """The pure-jnp oracle accepts an e4m3 cache (dus writes + f32 view)."""
    cfg, path = ckpt
    eng = Engine.from_checkpoint(path, fast=False, kv_dtype=E5M2)
    toks = list(eng.generate([1, 7], max_steps=4, temperature=0.0))
    assert len(toks) == 4


def test_fp8_kv_scheduler_stream_parity(ckpt):
    """Batched scheduler with the fp8 cache produces the same streams as
    the single-stream fp8-cache engine (write-masked staging paths)."""
    from yalm_tpu.scheduler import Request, Scheduler
    cfg, path = ckpt
    eng = Engine.from_checkpoint(path, fast=True, kv_dtype=E5M2)
    want = list(eng.generate([1, 5, 9], max_steps=6, temperature=0.0))
    w = load_weights(read_yalm(path), cfg)
    s = Scheduler(cfg, w, batch=8, kv_dtype=E5M2)
    r = s.submit(Request(prompt_tokens=[1, 5, 9], max_new_tokens=6,
                         temperature=0.0))
    s.run()
    assert r.generated == want
