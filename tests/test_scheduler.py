"""Continuous-batching scheduler tests: batched greedy decode matches the
single-stream engine, slot reuse, queue overflow admission."""

import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.engine import Engine
from yalm_tpu.models.weights import load_weights
from yalm_tpu.scheduler import Request, Scheduler
from yalm_tpu.utils.testing import synth_checkpoint, tiny_config


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = tiny_config(max_seq_len=64)
    path = str(tmp_path_factory.mktemp("ckpt") / "m.yalm")
    synth_checkpoint(path, cfg)
    yf = read_yalm(path)
    weights = load_weights(yf, cfg)
    return cfg, weights


def _engine_reference(cfg, weights, prompt, n):
    eng = Engine(cfg, weights)
    return list(eng.generate(prompt, max_steps=n, temperature=0.0))


def test_batched_greedy_matches_engine(setup):
    cfg, weights = setup
    prompts = [[1, 5, 9], [1, 7, 2, 8], [1, 3]]
    n = 6
    refs = [_engine_reference(cfg, weights, p, n) for p in prompts]

    sched = Scheduler(cfg, weights, batch=2)  # 2 slots, 3 requests -> queueing
    reqs = [sched.submit(Request(prompt_tokens=p, max_new_tokens=n, temperature=0.0))
            for p in prompts]
    sched.run()
    for req, ref in zip(reqs, refs):
        assert req.done
        assert req.generated == ref


def test_slot_reuse_and_streaming(setup):
    cfg, weights = setup
    sched = Scheduler(cfg, weights, batch=1)
    streamed = []
    r1 = sched.submit(Request(prompt_tokens=[1, 2], max_new_tokens=3,
                              temperature=0.0, on_token=streamed.append))
    r2 = sched.submit(Request(prompt_tokens=[1, 4], max_new_tokens=3, temperature=0.0))
    sched.run()
    assert r1.done and r2.done
    assert streamed == r1.generated
    assert len(r1.generated) == 3 and len(r2.generated) == 3
    # the single slot served both sequentially and results match single-stream
    assert r2.generated == _engine_reference(cfg, weights, [1, 4], 3)


def test_stop_token_frees_slot(setup):
    cfg, weights = setup
    ref = _engine_reference(cfg, weights, [1, 5, 9], 8)
    stop = ref[2]
    sched = Scheduler(cfg, weights, batch=2)
    req = sched.submit(Request(prompt_tokens=[1, 5, 9], max_new_tokens=8,
                               temperature=0.0, stop_tokens=frozenset({stop})))
    sched.run()
    assert req.done
    assert req.generated == ref[:3]  # stops when the stop token appears


def test_interleaved_admission(setup):
    """A request submitted mid-flight joins without disturbing others."""
    cfg, weights = setup
    refs = {p: _engine_reference(cfg, weights, list(p), 6) for p in ((1, 5), (1, 8))}
    sched = Scheduler(cfg, weights, batch=2)
    r1 = sched.submit(Request(prompt_tokens=[1, 5], max_new_tokens=6, temperature=0.0))
    sched.step()
    sched.step()
    r2 = sched.submit(Request(prompt_tokens=[1, 8], max_new_tokens=6, temperature=0.0))
    sched.run()
    assert r1.generated == refs[(1, 5)]
    assert r2.generated == refs[(1, 8)]


def test_long_prompt_ring_admission(tmp_path):
    """Prompts longer than the context window hydrate through the ring +
    sinks per-token (previously rejected with NotImplementedError)."""
    import numpy as np
    from yalm_tpu.codec.format import read_yalm
    from yalm_tpu.engine import Engine
    from yalm_tpu.models import load_weights
    from yalm_tpu.scheduler import Request, Scheduler
    from yalm_tpu.utils.testing import synth_checkpoint, tiny_config

    cfg = tiny_config(max_seq_len=32)
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=0)
    weights = load_weights(read_yalm(path), cfg)

    prompt = list(np.random.default_rng(0).integers(3, cfg.vocab_size, 50))
    sched = Scheduler(cfg, weights, batch=2)
    req = sched.submit(Request(prompt_tokens=prompt, max_new_tokens=5,
                               temperature=0.0))
    sched.run()
    assert len(req.generated) == 5

    # matches the single-stream engine bit-for-bit (same ring semantics)
    eng = Engine.from_checkpoint(path, fast=False)
    toks = list(eng.generate(prompt, max_steps=5, temperature=0.0))
    assert toks == req.generated, (toks, req.generated)


def test_scheduler_moe_fast_tick(tmp_path):
    """MoE continuous batching: fast batched tick (all-experts gemm_le)."""
    from yalm_tpu.codec.format import read_yalm
    from yalm_tpu.models import load_weights
    from yalm_tpu.scheduler import Request, Scheduler
    from yalm_tpu.utils.testing import synth_checkpoint, tiny_config
    import jax.numpy as jnp

    cfg = tiny_config(dim=256, hidden_dim=512, head_dim=128, n_layers=2,
                      n_heads=4, n_kv_heads=2, vocab_size=512, max_seq_len=64,
                      rotary_dim=128, n_experts=4, n_experts_active=2,
                      weight_dtype="fp8")
    path = str(tmp_path / "moe.yalm")
    synth_checkpoint(path, cfg, seed=0)
    weights = load_weights(read_yalm(path), cfg)
    sched = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16)
    assert sched.fast
    reqs = [sched.submit(Request(prompt_tokens=[1, 5 + i], max_new_tokens=5,
                                 temperature=0.0)) for i in range(4)]
    sched.run()
    assert all(len(r.generated) == 5 for r in reqs)


# ---------------------------------------------------------------------------
# Interleaved admission: long prompts must not stall active decode lanes
# ---------------------------------------------------------------------------

def test_admission_interleaves_with_decode(tmp_path):
    """While a beyond-window prompt admits (chunked prefill + bounded
    ring-regime hydration), an already-active lane receives a token EVERY
    tick, its stream is bit-identical to a solo run, and the long request's
    first token arrives within the chunk-count bound."""
    import math
    from test_fast_path import fast_config

    cfg = fast_config()          # window = 32
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=31)
    weights = load_weights(read_yalm(path), cfg)
    W = cfg.max_seq_len

    def mk_a():
        return Request(prompt_tokens=[1, 2, 3], max_new_tokens=40,
                       temperature=0.0, seed=5)

    # solo reference stream for request A
    solo = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16)
    a_solo = mk_a()
    solo.submit(a_solo)
    solo.run()

    sched = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16)
    a = mk_a()
    sched.submit(a)
    for _ in range(3):
        sched.step()
    assert len(a.generated) >= 3

    long_prompt = [1] + [5] * (W + 20)     # ring regime beyond the window
    b = Request(prompt_tokens=long_prompt, max_new_tokens=4,
                temperature=0.0, seed=7)
    sched.submit(b)

    ticks = 0
    while not b.generated:
        before = len(a.generated)
        sched.step()
        ticks += 1
        if not a.done:
            # the active lane produced a token on THIS tick too
            assert len(a.generated) == before + 1
        assert ticks < 100, "first token of the long request never arrived"

    in_window_chunks = math.ceil(W / 256)   # bucketed prefill chunks
    ring_ticks = math.ceil((len(long_prompt) - W)
                           / Scheduler.RING_HYDRATE_PER_TICK)
    assert ticks <= in_window_chunks + ring_ticks + 1, ticks

    sched.run()
    assert b.done and len(b.generated) == 4
    # concurrent admission did not perturb A's stream
    assert a.generated == a_solo.generated


def test_poisoned_request_isolation(setup):
    """A request whose on_token callback raises fails ALONE: the concurrent
    healthy stream still completes with the exact solo-engine tokens."""
    cfg, weights = setup
    n = 6
    ref = _engine_reference(cfg, weights, [1, 5, 9], n)

    sched = Scheduler(cfg, weights, batch=2)

    def boom(tok):
        raise RuntimeError("poisoned callback")

    bad = Request(prompt_tokens=[1, 7, 2], max_new_tokens=n, temperature=0.0,
                  on_token=boom)
    good = Request(prompt_tokens=[1, 5, 9], max_new_tokens=n, temperature=0.0)
    sched.submit(bad)
    sched.submit(good)
    sched.run()
    assert bad.done and bad.error and "poisoned" in bad.error
    assert good.done and good.error is None
    assert good.generated == ref


def test_recover_fails_active_keeps_queue(setup):
    """Scheduler.recover (the server driver's device-error path) fails only
    ACTIVE requests; queued ones survive and complete on later ticks."""
    cfg, weights = setup
    n = 4
    ref = _engine_reference(cfg, weights, [1, 3], n)

    sched = Scheduler(cfg, weights, batch=2)
    active = Request(prompt_tokens=[1, 5, 9], max_new_tokens=64, temperature=0.0)
    # batch=2 slots filled by `active` + one more; the third stays queued
    active2 = Request(prompt_tokens=[1, 7], max_new_tokens=64, temperature=0.0)
    queued = Request(prompt_tokens=[1, 3], max_new_tokens=n, temperature=0.0)
    for r in (active, active2, queued):
        sched.submit(r)
    sched.step()
    assert sched.n_active == 2 and len(sched.queue) == 1

    sched.recover(RuntimeError("simulated device error"))
    assert active.done and "device error" in active.error
    assert active2.done and active2.error
    assert not queued.done and sched.queue == [queued]

    sched.run()
    assert queued.done and queued.error is None
    assert queued.generated == ref


def test_logprobs_match_oracle(tmp_path):
    """Request.logprobs = log p(tok | prefix) under the model's full
    distribution: cross-checked against the oracle prefill's log-softmax
    at every generated position (first token from admission logits, the
    rest from the batched tick's fused computation)."""
    import jax.numpy as jnp
    from yalm_tpu.models.cache import KVCache
    from yalm_tpu.models.transformer import prefill
    from yalm_tpu.utils.testing import synth_checkpoint
    from test_fast_path import fast_config

    cfg = fast_config(max_seq_len=64)
    path = str(tmp_path / "lp.yalm")
    synth_checkpoint(path, cfg, seed=201)
    weights = load_weights(read_yalm(path), cfg)
    sched = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16)
    req = sched.submit(Request(prompt_tokens=[1, 5, 9], max_new_tokens=10,
                               temperature=0.0))
    sched.run()
    assert len(req.logprobs) == 10
    assert all(np.isfinite(req.logprobs))

    seq = list(req.prompt_tokens) + req.generated
    T = len(seq)
    cache = KVCache.init(cfg, jnp.float32)
    logits, _ = prefill(cfg, weights, jnp.asarray(seq, jnp.int32),
                        jnp.int32(0), jnp.int32(T), cache,
                        logits_mode="all", compute_dtype=jnp.float32)
    lg = np.asarray(logits, np.float32)
    for i, (tok, lp) in enumerate(zip(req.generated, req.logprobs)):
        row = lg[len(req.prompt_tokens) - 1 + i]
        m = row.max()
        want = row[tok] - m - np.log(np.exp(row - m).sum())
        assert abs(lp - want) < 0.08, (i, lp, want)


# ------------------------------------------------- batched admission (TTFT)
def test_prefill_chunk_batched_matches_single(tmp_path):
    """The batched admission sweep's per-lane cache rows and last-valid
    logits track per-lane prefill_fast (bf16 tolerance): one weight sweep
    hydrates every lane."""
    import jax
    from test_fast_path import fast_config
    from yalm_tpu.models.cache import KVCache
    from yalm_tpu.models.fast import (FastWeights, prefill_fast,
                                      prefill_chunk_fast_batched)

    cfg = fast_config(max_seq_len=128)
    path = str(tmp_path / "ba.yalm")
    synth_checkpoint(path, cfg, seed=61)
    fw = FastWeights.from_weights(load_weights(read_yalm(path), cfg), cfg)
    B, T = 4, 16
    rng = np.random.default_rng(2)
    tokens = rng.integers(3, cfg.vocab_size, (B, T)).astype(np.int32)
    pos0 = np.array([0, 8, 16, 0], np.int32)
    vlen = np.array([16, 11, 5, 16], np.int32)
    enable = np.array([1, 1, 1, 0], np.int32)

    cache = KVCache.init(cfg, jnp.bfloat16, batch=B)
    out, cache2 = prefill_chunk_fast_batched(
        cfg, fw, jnp.asarray(tokens), jnp.asarray(pos0), jnp.asarray(vlen),
        jnp.asarray(enable), cache, attend_len=32, logits_mode="lastv")
    out = np.asarray(out)

    for b in range(B):
        if not enable[b]:
            # disabled lane: cache untouched
            np.testing.assert_array_equal(
                np.asarray(cache2.k[b], np.float32), 0.0)
            continue
        lane = KVCache.init(cfg, jnp.bfloat16)
        want, lane = prefill_fast(
            cfg, fw, jnp.asarray(tokens[b]), jnp.int32(pos0[b]),
            jnp.int32(vlen[b]), lane, logits_mode="last", attend_len=32)
        want = np.asarray(want)
        scale = max(1.0, float(np.abs(want).max()))
        assert float(np.abs(out[b] - want).max()) / scale < 0.04, b
        # written rows match; rows beyond valid_len untouched
        lo, hi = int(pos0[b]), int(pos0[b] + vlen[b])
        np.testing.assert_allclose(
            np.asarray(cache2.k[b][:, lo:hi], np.float32),
            np.asarray(lane.k[:, lo:hi], np.float32), rtol=3e-2, atol=3e-2)
        np.testing.assert_array_equal(
            np.asarray(cache2.k[b][:, hi:], np.float32), 0.0)


def test_batched_admission_scheduler(tmp_path):
    """With batched_admission=True, concurrent long-prompt admissions share
    ONE weight sweep per tick (admit_sweeps ~ chunks, not lanes x chunks),
    streams are deterministic, and every request completes."""
    from test_fast_path import fast_config
    cfg = fast_config(max_seq_len=128)
    path = str(tmp_path / "bas.yalm")
    synth_checkpoint(path, cfg, seed=62)
    weights = load_weights(read_yalm(path), cfg)
    long_prompts = [[1] + [3 + i] * 37 for i in range(5)]  # 3 chunks each

    def run_once():
        sched = Scheduler(cfg, weights, batch=8, batched_admission=True)
        reqs = [sched.submit(Request(prompt_tokens=p, max_new_tokens=5,
                                     temperature=0.0, seed=i))
                for i, p in enumerate(long_prompts)]
        sched.run()
        return sched, [r.generated for r in reqs]

    s1, got1 = run_once()
    assert all(len(g) == 5 for g in got1)
    # 5 lanes admitted together: sweeps track CHUNKS (3-ish), not 5 x 3
    assert 1 <= s1.admit_sweeps <= 4, s1.admit_sweeps
    s2, got2 = run_once()
    assert got1 == got2  # deterministic under identical traffic

    # default path unchanged and still produces the same greedy streams
    # (synthetic tiny model: the bf16 bucket-padding drift does not flip
    # argmax here; the guarantee difference is documented, not asserted)
    sd = Scheduler(cfg, weights, batch=8)
    rd = [sd.submit(Request(prompt_tokens=p, max_new_tokens=5,
                            temperature=0.0, seed=i))
          for i, p in enumerate(long_prompts)]
    sd.run()
    assert sd.admit_sweeps == 0
    assert [r.generated for r in rd] == got1


def test_batched_admission_paged_scheduler(tmp_path):
    """Batched admission COMPOSED with the paged pool: one weight sweep
    hydrates every admitting lane's chunk, rows scattering through the
    page tables (chunks straddle page boundaries — page_size 16 under a
    37-token chunk). Streams match the per-slot paged scheduler, prefix
    caching still registers/matches, and admit_sweeps counts chunks."""
    from test_fast_path import fast_config
    cfg = fast_config(max_seq_len=128)
    path = str(tmp_path / "bap.yalm")
    synth_checkpoint(path, cfg, seed=63)
    weights = load_weights(read_yalm(path), cfg)
    long_prompts = [[1] + [3 + i] * 37 for i in range(5)]
    pages = 1 + 8 * (128 // 16)  # sink + full mapping for all lanes

    def run(batched):
        sched = Scheduler(cfg, weights, batch=8, paged_pages=pages,
                          page_size=16, batched_admission=batched)
        reqs = [sched.submit(Request(prompt_tokens=p, max_new_tokens=5,
                                     temperature=0.0, seed=i))
                for i, p in enumerate(long_prompts)]
        sched.run()
        return sched, [r.generated for r in reqs]

    s1, got1 = run(True)
    assert all(len(g) == 5 for g in got1)
    assert 1 <= s1.admit_sweeps <= 4, s1.admit_sweeps
    s2, got2 = run(True)
    assert got1 == got2
    # per-slot paged path emits the same greedy streams (tiny model: the
    # bucket-padding bf16 drift does not flip argmax here)
    s3, got3 = run(False)
    assert s3.admit_sweeps == 0
    assert got3 == got1

    # prefix caching composes: resubmitting a prompt hits cached pages
    r = s1.submit(Request(prompt_tokens=long_prompts[0], max_new_tokens=5,
                          temperature=0.0))
    s1.run()
    assert r.generated == got1[0]
    assert s1.alloc.prefix_stats["hits"] >= 1


def test_batched_admission_paged_preemption_resume(tmp_path):
    """A pool too small for all admissions: batched admission still
    preempts the newest lane cleanly and resumes it with the exact
    stream (re-validation drops preempted lanes from the sweep)."""
    from test_fast_path import fast_config
    cfg = fast_config(max_seq_len=128)
    path = str(tmp_path / "bapp.yalm")
    synth_checkpoint(path, cfg, seed=64)
    weights = load_weights(read_yalm(path), cfg)
    prompts = [[1] + [3 + i] * 37 for i in range(4)]

    def run(pages, batched):
        sched = Scheduler(cfg, weights, batch=8, paged_pages=pages,
                          page_size=16, batched_admission=batched)
        reqs = [sched.submit(Request(prompt_tokens=p, max_new_tokens=6,
                                     temperature=0.0, seed=i))
                for i, p in enumerate(prompts)]
        sched.run()
        return [r.generated for r in reqs]

    full = run(1 + 8 * 8, True)
    tight = run(1 + 10, True)     # forces preemption + resume
    assert tight == full


# ---------------------------------------------------- dense prefix caching
def _dense_prefix_sched(tmp_path, seed=65, **kw):
    from test_fast_path import fast_config
    cfg = fast_config(max_seq_len=128)
    path = str(tmp_path / f"dp{seed}.yalm")
    synth_checkpoint(path, cfg, seed=seed)
    weights = load_weights(read_yalm(path), cfg)
    return cfg, Scheduler(cfg, weights, batch=8, prefix_cache=True, **kw)


def test_dense_prefix_cache_reuses_rows(tmp_path):
    """DENSE prompt reuse (VERDICT item: prefix caching beyond paged):
    a repeated prompt copies the registered lane's rows and skips its
    prefill; the stream matches the cold run exactly (the copied rows
    ARE the cold run's rows)."""
    cfg, sched = _dense_prefix_sched(tmp_path)
    prompt = [1] + [7, 9, 11] * 13            # 40 tokens
    r1 = sched.submit(Request(prompt_tokens=prompt, max_new_tokens=6,
                              temperature=0.0))
    sched.run()
    assert sched.prefix_stats["registered"] == 1
    assert sched.prefix_stats["hits"] == 0
    r2 = sched.submit(Request(prompt_tokens=prompt, max_new_tokens=6,
                              temperature=0.0))
    sched.run()
    assert r2.generated == r1.generated
    st = sched.prefix_stats
    assert st["hits"] == 1
    # all but the last prompt token skipped prefill
    assert st["hit_tokens"] == len(prompt) - 1


def test_dense_prefix_cache_token_granular_partial_match(tmp_path):
    """Matching is TOKEN-granular: a prompt sharing only part of a
    registered prompt reuses exactly the common prefix — finer than the
    paged pool's full-page keys — and the continuation stays correct
    (matches a cold scheduler's stream)."""
    cfg, sched = _dense_prefix_sched(tmp_path, seed=66)
    base = [1] + [5] * 30
    fork = [1] + [5] * 21 + [9] * 9            # diverges at token 22
    r1 = sched.submit(Request(prompt_tokens=base, max_new_tokens=4,
                              temperature=0.0))
    sched.run()
    r2 = sched.submit(Request(prompt_tokens=fork, max_new_tokens=6,
                              temperature=0.0))
    sched.run()
    st = sched.prefix_stats
    assert st["hits"] == 1 and st["hit_tokens"] == 22

    cfg2, cold = _dense_prefix_sched(tmp_path, seed=66)
    rc = cold.submit(Request(prompt_tokens=fork, max_new_tokens=6,
                             temperature=0.0))
    cold.run()
    assert r2.generated == rc.generated


def test_dense_prefix_cache_invalidation_on_lane_reuse(tmp_path):
    """An entry dies when a NEW request starts hydrating its source lane
    (the rows get overwritten) — later identical prompts miss but stay
    correct."""
    cfg, sched = _dense_prefix_sched(tmp_path, seed=67)
    a = [1] + [7] * 24
    r1 = sched.submit(Request(prompt_tokens=a, max_new_tokens=4,
                              temperature=0.0))
    sched.run()
    # fill EVERY lane with other prompts: lane 0's rows get overwritten
    others = [sched.submit(Request(prompt_tokens=[1] + [20 + i] * 10,
                                   max_new_tokens=3, temperature=0.0))
              for i in range(8)]
    sched.run()
    ht_before = sched.prefix_stats["hit_tokens"]
    r2 = sched.submit(Request(prompt_tokens=a, max_new_tokens=4,
                              temperature=0.0))
    sched.run()
    assert r2.generated == r1.generated  # correct either way
    # the original 25-token entry was invalidated: any hit r2 scored can
    # only be the single [1] head token shared with the 'others'
    assert sched.prefix_stats["hit_tokens"] - ht_before <= 1


def test_dense_prefix_cache_ring_regime_opt_out(tmp_path):
    """Requests that could wrap the window never register or match (the
    ring regime rewrites early rows in place)."""
    cfg, sched = _dense_prefix_sched(tmp_path, seed=68)
    long_prompt = [1] + [5] * 100               # 101 + 40 + 1 > 128
    r1 = sched.submit(Request(prompt_tokens=long_prompt, max_new_tokens=40,
                              temperature=0.0))
    sched.run()
    assert sched.prefix_stats["registered"] == 0
    r2 = sched.submit(Request(prompt_tokens=long_prompt, max_new_tokens=40,
                              temperature=0.0))
    sched.run()
    assert sched.prefix_stats["hits"] == 0
    assert r2.generated == r1.generated
