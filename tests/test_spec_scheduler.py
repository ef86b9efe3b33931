"""Scheduler-level speculative decoding: batched verify chunk + draft ticks."""

import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.engine import Engine
from yalm_tpu.models import load_weights
from yalm_tpu.models.cache import KVCache
from yalm_tpu.models.fast import (FastWeights, prefill_fast,
                                  verify_chunk_fast_batched)
from yalm_tpu.utils.testing import synth_checkpoint

from test_fast_path import fast_config


def test_verify_chunk_matches_per_lane_prefill(tmp_path):
    """The batched verify chunk == per-lane prefill_fast(logits_mode=all)
    at each lane's own position, with disabled lanes untouched."""
    cfg = fast_config(max_seq_len=64)
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=55)
    fw = FastWeights.from_weights(load_weights(read_yalm(path), cfg), cfg)

    B, T = 4, 4
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, T)), jnp.int32)
    pos0 = jnp.asarray([0, 5, 17, 30], jnp.int32)
    enable = jnp.asarray([1, 1, 0, 1], jnp.int32)

    cache = KVCache.init(cfg, jnp.bfloat16, batch=B)
    # pre-hydrate each lane's history [0, pos0) with arbitrary tokens
    hist = jnp.asarray(rng.integers(3, cfg.vocab_size, 32), jnp.int32)
    lanes_k, lanes_v = [], []
    for b in range(B):
        lane = KVCache.init(cfg, jnp.bfloat16)
        p = int(pos0[b])
        if p:
            _, lane = prefill_fast(cfg, fw, hist[:32], jnp.int32(0),
                                   jnp.int32(p), lane, logits_mode="none")
        lanes_k.append(lane.k)
        lanes_v.append(lane.v)
    cache = KVCache(k=jnp.stack(lanes_k), v=jnp.stack(lanes_v))

    logits, cache2 = verify_chunk_fast_batched(cfg, fw, tokens, pos0, enable,
                                               cache)
    assert logits.shape == (B, T, cfg.vocab_size)

    for b in range(B):
        lane = KVCache(k=cache.k[b], v=cache.v[b])
        want, lane2 = prefill_fast(cfg, fw, tokens[b], pos0[b], jnp.int32(T),
                                   lane, logits_mode="all")
        if int(enable[b]):
            np.testing.assert_allclose(np.asarray(logits[b]),
                                       np.asarray(want), rtol=2e-2, atol=2e-2)
            assert (np.asarray(logits[b]).argmax(-1)
                    == np.asarray(want).argmax(-1)).all()
            np.testing.assert_array_equal(
                np.asarray(cache2.k[b], np.float32),
                np.asarray(lane2.k, np.float32))
        else:
            # disabled lane's cache is bitwise untouched
            np.testing.assert_array_equal(
                np.asarray(cache2.k[b], np.float32),
                np.asarray(cache.k[b], np.float32))


def _mk_sched(tmp_path, seed=56, spec=True, **kw):
    cfg = fast_config(max_seq_len=64)
    path = str(tmp_path / f"t{seed}.yalm")
    synth_checkpoint(path, cfg, seed=seed)
    weights = load_weights(read_yalm(path), cfg)
    dcfg = fast_config(max_seq_len=64, n_layers=1)
    dpath = str(tmp_path / f"d{seed}.yalm")
    synth_checkpoint(dpath, dcfg, seed=seed + 1)
    dweights = load_weights(read_yalm(dpath), dcfg)
    from yalm_tpu.scheduler import Scheduler
    sd = (dcfg, dweights) if spec else None
    return cfg, weights, Scheduler(cfg, weights, batch=8,
                                   kv_dtype=jnp.bfloat16,
                                   spec_draft=sd, **kw)


def test_spec_scheduler_streams_match_plain(tmp_path):
    """Scheduler speculation emits the target's greedy stream — the draft
    only shortcuts compute (VERDICT item: spec as a scheduler mode).

    The exact comparison target is the stream of the verify program's own
    argmax (prefill-formulation numerics); the plain batched tick computes
    the same math in the fused decode kernels, whose bf16 rounding can flip
    near-ties on synthetic weights. So: (a) streams must agree with the
    plain scheduler until the first verify-vs-tick near-tie, and (b) must
    agree EXACTLY with engine-level speculation, whose verify is the same
    prefill formulation."""
    from yalm_tpu.scheduler import Request, Scheduler
    cfg, weights, spec_sched = _mk_sched(tmp_path)

    def reqs():
        return [Request(prompt_tokens=[1, 5 + i, 9], max_new_tokens=10,
                        temperature=0.0, seed=i) for i in range(10)]

    plain = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16)
    want = []
    for r in reqs():
        plain.submit(r)
        want.append(r)
    plain.run()

    got = []
    for r in reqs():
        spec_sched.submit(r)
        got.append(r)
    spec_sched.run()
    agree = total = 0
    for a, b in zip(got, want):
        assert len(a.generated) == len(b.generated)
        for x, y in zip(a.generated, b.generated):
            total += 1
            if x != y:
                break
            agree += 1
    assert agree / total > 0.8, (agree, total)
    assert spec_sched.spec_stats["rounds"] >= 1


def test_spec_scheduler_matches_engine_speculation(tmp_path):
    """Scheduler-level and engine-level speculation emit the SAME stream
    (both verify with the prefill formulation), regardless of their
    different drafts."""
    from yalm_tpu.scheduler import Request
    cfg, weights, spec_sched = _mk_sched(tmp_path, seed=60)

    target = Engine(cfg, weights, fast=True, kv_dtype=jnp.bfloat16)
    dcfg = spec_sched.draft_cfg
    draft_eng = Engine(dcfg, spec_sched.draft_weights, fast=True,
                       kv_dtype=jnp.bfloat16)
    want = list(target.generate_speculative(
        [1, 5, 9], draft=draft_eng, n_draft=4, max_steps=12))

    r = spec_sched.submit(Request(prompt_tokens=[1, 5, 9],
                                  max_new_tokens=12, temperature=0.0))
    spec_sched.run()
    assert r.generated == want


def test_spec_scheduler_self_draft_high_acceptance(tmp_path):
    """draft == target => near-total acceptance, few target sweeps."""
    from yalm_tpu.scheduler import Request, Scheduler
    cfg = fast_config(max_seq_len=64)
    path = str(tmp_path / "same.yalm")
    synth_checkpoint(path, cfg, seed=57)
    weights = load_weights(read_yalm(path), cfg)
    sched = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      spec_draft=(cfg, weights), spec_k=4)
    r = sched.submit(Request(prompt_tokens=[1, 5, 9], max_new_tokens=20,
                             temperature=0.0))
    sched.run()
    assert len(r.generated) == 20
    st = sched.spec_stats
    acc = st["accepted"] / (st["rounds"] * 4)
    assert acc > 0.7, st


def test_spec_scheduler_window_edge_fallback(tmp_path):
    """A lane whose position nears the window edge leaves the spec path
    and still completes with the exact plain stream."""
    from yalm_tpu.scheduler import Request, Scheduler
    cfg, weights, spec_sched = _mk_sched(tmp_path, seed=58)

    def mk():
        # prompt 40 + 30 new crosses the 64-token window
        return Request(prompt_tokens=[1] + [5] * 39, max_new_tokens=30,
                       temperature=0.0, seed=7)

    plain = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16)
    w = mk()
    plain.submit(w)
    plain.run()

    g = mk()
    spec_sched.submit(g)
    spec_sched.run()
    assert len(g.generated) == len(w.generated) == 30
    # agreement modulo verify-vs-tick near-ties (see streams_match_plain)
    agree = 0
    for x, y in zip(g.generated, w.generated):
        if x != y:
            break
        agree += 1
    assert agree >= 10, (agree, g.generated, w.generated)
    # the lane really did leave the spec path at the edge
    assert spec_sched.spec_stats["rounds"] >= 1


def test_spec_scheduler_serves_topk_topp(tmp_path):
    """top_k/top_p requests are served under speculation: _verify_pack
    applies the per-request envelope to the target distribution before
    the accept/residual math (round-5 closure; every emitted token must
    come from the request's top-k set)."""
    from yalm_tpu.scheduler import Request
    cfg, _, sched = _mk_sched(tmp_path, seed=59)
    r1 = sched.submit(Request(prompt_tokens=[1, 2], temperature=0.7,
                              max_new_tokens=6, top_k=1, seed=7))
    r2 = sched.submit(Request(prompt_tokens=[1, 2], temperature=0.9,
                              max_new_tokens=6, top_p=0.5, seed=8))
    sched.run()
    assert len(r1.generated) == 6 and len(r2.generated) == 6
    # top_k=1 at any temperature IS greedy: must match a greedy request
    g = sched.submit(Request(prompt_tokens=[1, 2], temperature=0.0,
                             max_new_tokens=6))
    sched.run()
    assert r1.generated == g.generated, (r1.generated, g.generated)


def test_server_over_spec_scheduler(tmp_path):
    """HTTP serving with --draft speculation: greedy AND sampled requests
    stream (rejection-sampling verify); a top-k request fails alone."""
    from yalm_tpu.codec.format import read_yalm as ry
    from yalm_tpu.server import ServingEngine
    from yalm_tpu.tokenizer import Tokenizer

    cfg = fast_config(max_seq_len=64)
    path = str(tmp_path / "t.yalm")
    synth_checkpoint(path, cfg, seed=66)
    dcfg = fast_config(max_seq_len=64, n_layers=1)
    dpath = str(tmp_path / "d.yalm")
    synth_checkpoint(dpath, dcfg, seed=67)

    yf = ry(path)
    weights = load_weights(yf, cfg)
    tok = Tokenizer.from_yalm(yf)
    yf.close()
    dyf = ry(dpath)
    dweights = load_weights(dyf, dcfg)
    dyf.close()

    eng = ServingEngine(cfg, weights, tok, batch=8,
                        spec_draft=(dcfg, dweights), spec_k=3)
    try:
        assert eng.sched.spec
        out = eng.complete("hello", max_tokens=8, temperature=0.0)
        assert isinstance(out, str)
        assert eng.sched.spec_stats["rounds"] >= 1
        # sampled requests are served (exact rejection-sampling verify)
        out_s = eng.complete("hi", max_tokens=4, temperature=0.9)
        assert isinstance(out_s, str)
        # top-k/top-p requests are served too (envelope inside verify)
        out_k = eng.complete("hi", max_tokens=4, temperature=0.9, top_k=5)
        assert isinstance(out_k, str)
        out2 = eng.complete("again", max_tokens=4, temperature=0.0)
        assert isinstance(out2, str)
    finally:
        eng.close()


# --------------------------------------------- temperature>0 verify rounds
def test_verify_pack_exact_distribution():
    """Scheduler-level rejection sampling (scheduler._verify_pack + the
    accept walk) emits first tokens distributed EXACTLY as target
    temperature sampling — the batched, on-device counterpart of
    engine.rejection_sample_verify's 40k-trial TV gate. Proposals are
    point masses drawn from a DIFFERENT q (and, separately, a fixed
    adversarial token: the guarantee is per-proposal, not on-average)."""
    import jax
    from yalm_tpu.scheduler import _verify_pack
    from yalm_tpu.engine import _softmax_T

    rng = np.random.default_rng(0)
    V, K, T = 8, 3, 0.9
    t_lg = rng.standard_normal((K + 1, V)).astype(np.float32) * 2.0
    q0 = _softmax_T(rng.standard_normal(V) * 2.0, T)
    p0 = _softmax_T(t_lg[0], T)

    n, BB = 40000, 4000
    counts = np.zeros(V)
    trial = 0
    for rep in range(n // BB):
        props = rng.choice(V, size=(BB, K), p=q0).astype(np.int32)
        chunk = np.concatenate(
            [np.full((BB, 1), 2, np.int32), props], axis=1)
        logits = jnp.asarray(np.broadcast_to(t_lg, (BB, K + 1, V)))
        seeds = jnp.asarray(trial + np.arange(BB), jnp.int32)
        trial += BB
        vp = np.asarray(_verify_pack(
            logits, jnp.asarray(chunk), seeds,
            jnp.zeros(BB, jnp.int32), jnp.full(BB, T, jnp.float32),
            jnp.zeros(BB, jnp.int32), jnp.ones(BB, jnp.float32)))
        acc0 = vp[:, 0, 0] > 0.5
        first = np.where(acc0, chunk[:, 1], vp[:, 0, 2].astype(np.int32))
        np.add.at(counts, first, 1)
    emp = counts / n
    tv = 0.5 * np.abs(emp - p0).sum()
    assert tv < 0.02, (tv, emp, p0)
    assert 0.5 * np.abs(p0 - q0).sum() > 0.1  # q genuinely differs

    # fixed adversarial proposal: always propose p0's LEAST likely token
    worst = int(p0.argmin())
    counts2 = np.zeros(V)
    chunk = np.full((BB, K + 1), 2, np.int32)
    chunk[:, 1] = worst
    logits = jnp.asarray(np.broadcast_to(t_lg, (BB, K + 1, V)))
    for rep in range(n // BB):
        seeds = jnp.asarray(trial + np.arange(BB), jnp.int32)
        trial += BB
        vp = np.asarray(_verify_pack(
            logits, jnp.asarray(chunk), seeds,
            jnp.zeros(BB, jnp.int32), jnp.full(BB, T, jnp.float32),
            jnp.zeros(BB, jnp.int32), jnp.ones(BB, jnp.float32)))
        acc0 = vp[:, 0, 0] > 0.5
        first = np.where(acc0, worst, vp[:, 0, 2].astype(np.int32))
        np.add.at(counts2, first, 1)
    tv2 = 0.5 * np.abs(counts2 / n - p0).sum()
    assert tv2 < 0.02, (tv2, counts2 / n, p0)


def test_verify_pack_envelope_exact_distribution():
    """With a per-request top_k/top_p envelope, the rejection-sampled first
    token is distributed EXACTLY as plain envelope sampling (sample_ext's
    cut applied to the target), and out-of-envelope proposals are always
    rejected — the round-5 TV gate for spec x top_k/top_p."""
    import jax
    from yalm_tpu.scheduler import _verify_pack
    from yalm_tpu.engine import _softmax_T

    rng = np.random.default_rng(3)
    V, K, T = 8, 3, 0.9

    def env_dist(lg, k, p):
        desc = np.sort(lg)[::-1]
        kth = desc[(k if k > 0 else V) - 1]
        probs = _softmax_T(desc, T)
        cut = min(int((np.cumsum(probs) < p).sum()), V - 1)
        pth = desc[cut] if p < 1.0 else desc[-1]
        thresh = max(kth, pth)
        e = np.where(lg >= thresh, lg / T, -np.inf)
        e = np.exp(e - e.max())
        return e / e.sum()

    t_lg = rng.standard_normal((K + 1, V)).astype(np.float32) * 2.0
    q0 = _softmax_T(rng.standard_normal(V) * 2.0, T)   # full-vocab proposals

    n, BB = 40000, 4000
    for topk, topp in ((3, 1.0), (0, 0.6)):
        p_env = env_dist(t_lg[0], topk, topp)
        counts = np.zeros(V)
        trial = 0
        for rep in range(n // BB):
            props = rng.choice(V, size=(BB, K), p=q0).astype(np.int32)
            chunk = np.concatenate(
                [np.full((BB, 1), 2, np.int32), props], axis=1)
            logits = jnp.asarray(np.broadcast_to(t_lg, (BB, K + 1, V)))
            seeds = jnp.asarray(trial + np.arange(BB), jnp.int32)
            trial += BB
            vp = np.asarray(_verify_pack(
                logits, jnp.asarray(chunk), seeds,
                jnp.zeros(BB, jnp.int32), jnp.full(BB, T, jnp.float32),
                jnp.full(BB, topk, jnp.int32),
                jnp.full(BB, topp, jnp.float32)))
            acc0 = vp[:, 0, 0] > 0.5
            # out-of-envelope proposals can never be accepted
            out_of_env = p_env[chunk[:, 1]] == 0.0
            assert not (acc0 & out_of_env).any()
            first = np.where(acc0, chunk[:, 1], vp[:, 0, 2].astype(np.int32))
            np.add.at(counts, first, 1)
        emp = counts / n
        tv = 0.5 * np.abs(emp - p_env).sum()
        assert tv < 0.02, (topk, topp, tv, emp, p_env)
        # every emitted token is inside the envelope
        assert emp[p_env == 0.0].sum() == 0.0


def test_verify_pack_greedy_lanes_bitwise():
    """temperature-0 lanes in a mixed batch keep the exact argmax
    semantics: accept iff proposal == argmax, correction == argmax."""
    from yalm_tpu.scheduler import _verify_pack
    rng = np.random.default_rng(1)
    B, K, V = 4, 3, 16
    logits = jnp.asarray(rng.standard_normal((B, K + 1, V)), jnp.float32)
    t = np.asarray(jnp.argmax(logits, axis=-1))
    chunk = np.zeros((B, K + 1), np.int32)
    chunk[0, 1:] = t[0, :K]          # greedy lane, all proposals agree
    chunk[1, 1:] = (t[1, :K] + 1) % V  # greedy lane, none agree
    chunk[2, 1:] = t[2, :K]          # sampled lane
    chunk[3, 1:] = t[3, :K]
    temps = jnp.asarray([0.0, 0.0, 0.8, 0.0], jnp.float32)
    vp = np.asarray(_verify_pack(
        logits, jnp.asarray(chunk), jnp.arange(B, dtype=jnp.int32),
        jnp.zeros(B, jnp.int32), temps,
        jnp.zeros(B, jnp.int32), jnp.ones(B, jnp.float32)))
    assert (vp[0, :K, 0] > 0.5).all()
    assert (vp[1, :K, 0] < 0.5).all()
    # greedy corrections and bonuses are the argmax rows
    np.testing.assert_array_equal(vp[1, :, 2].astype(np.int32), t[1])
    np.testing.assert_array_equal(vp[0, :, 4].astype(np.int32), t[0])
    np.testing.assert_array_equal(vp[3, :, 2].astype(np.int32), t[3])


def test_spec_scheduler_mixed_batch_greedy_stream_unchanged(tmp_path):
    """A greedy lane sharing verify rounds with sampled lanes emits the
    SAME stream as a spec scheduler serving it alone: sampled lanes ride
    independent rng columns of the same sweep."""
    from yalm_tpu.scheduler import Request
    _, _, solo = _mk_sched(tmp_path, seed=61)
    g1 = solo.submit(Request(prompt_tokens=[1, 7, 3], max_new_tokens=16,
                             temperature=0.0))
    solo.run()

    _, _, mixed = _mk_sched(tmp_path, seed=61)
    g2 = mixed.submit(Request(prompt_tokens=[1, 7, 3], max_new_tokens=16,
                              temperature=0.0))
    s1 = mixed.submit(Request(prompt_tokens=[1, 5], max_new_tokens=16,
                              temperature=0.9, seed=7))
    s2 = mixed.submit(Request(prompt_tokens=[1, 9], max_new_tokens=16,
                              temperature=1.3, seed=8))
    mixed.run()
    assert g2.generated == g1.generated
    assert len(s1.generated) == 16 and len(s2.generated) == 16
    assert mixed.spec_stats["rounds"] >= 1


def test_spec_scheduler_sampled_seed_reproducible(tmp_path):
    """Same seed -> same sampled stream across scheduler instances; a
    different seed diverges (the verify rng is keyed on request seed and
    absolute position, not on batch composition)."""
    from yalm_tpu.scheduler import Request
    outs = []
    for rep in range(2):
        _, _, sched = _mk_sched(tmp_path, seed=62)
        r = sched.submit(Request(prompt_tokens=[1, 4, 4, 4], max_new_tokens=12,
                                 temperature=1.1, seed=123))
        sched.run()
        outs.append(list(r.generated))
        assert all(np.isfinite(r.logprobs))
    assert outs[0] == outs[1]
    _, _, sched = _mk_sched(tmp_path, seed=62)
    r2 = sched.submit(Request(prompt_tokens=[1, 4, 4, 4], max_new_tokens=12,
                              temperature=1.1, seed=124))
    sched.run()
    assert len(r2.generated) == 12


def test_spec_scheduler_top_logprobs(tmp_path):
    """top_logprobs composes with speculation: every emitted token (accepted
    OR correction) carries N alternatives from its own verify row, sorted
    descending, and the emitted token's logprob never beats the top-1."""
    from yalm_tpu.scheduler import Request
    _, _, sched = _mk_sched(tmp_path, seed=63, top_logprobs=3)
    r = sched.submit(Request(prompt_tokens=[1, 7, 3], max_new_tokens=10,
                             temperature=0.0))
    rs = sched.submit(Request(prompt_tokens=[1, 5], max_new_tokens=10,
                              temperature=0.9, seed=3))
    sched.run()
    assert sched.spec_stats["rounds"] >= 1
    for req in (r, rs):
        assert len(req.top_logprobs) == 10
        for tok, lp, top in zip(req.generated, req.logprobs,
                                req.top_logprobs):
            assert len(top) == 3
            lps = [p for _, p in top]
            assert lps == sorted(lps, reverse=True)
            assert lp <= lps[0] + 1e-4
            # greedy emissions: the emitted token IS the top-1
            if req is r:
                assert top[0][0] == tok


# ----------------------------------------------------------- spec x MoE
def test_spec_scheduler_moe_self_draft(tmp_path):
    """spec x MoE (round-5 closure): the verify sweep routes each chunk row
    through the all-expert batched FFN. Self-draft (draft == target) on a
    MoE model: high acceptance, full streams, and agreement with the plain
    MoE scheduler until the first verify-vs-tick bf16 near-tie."""
    from yalm_tpu.scheduler import Request, Scheduler
    cfg = fast_config(n_experts=2, n_experts_active=1, max_seq_len=64)
    path = str(tmp_path / "moe.yalm")
    synth_checkpoint(path, cfg, seed=71)
    weights = load_weights(read_yalm(path), cfg)
    w2 = load_weights(read_yalm(path), cfg)

    def reqs():
        return [Request(prompt_tokens=[1, 5 + i, 9], max_new_tokens=12,
                        temperature=0.0, seed=i) for i in range(4)]

    plain = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16)
    want = []
    for r in reqs():
        plain.submit(r)
        want.append(r)
    plain.run()

    spec = Scheduler(cfg, w2, batch=8, kv_dtype=jnp.bfloat16,
                     spec_draft=(cfg, load_weights(read_yalm(path), cfg)),
                     spec_k=3)
    got = reqs()
    for r in got:
        spec.submit(r)
    spec.run()
    assert all(len(r.generated) == 12 for r in got)
    st = spec.spec_stats
    assert st["accepted"] / max(st["proposed"], 1) > 0.7, st
    agree = total = 0
    for a, b in zip(got, want):
        for x, y in zip(a.generated, b.generated):
            total += 1
            if x != y:
                break
            agree += 1
    assert agree / total > 0.7, (agree, total)


def test_spec_scheduler_moe_lookup_paged(tmp_path):
    """lookup-spec x paged x MoE: the paged verify sweep scatters MoE chunk
    rows through page tables; repetitive prompts give real acceptance."""
    from yalm_tpu.scheduler import Request, Scheduler
    cfg = fast_config(n_experts=2, n_experts_active=1, max_seq_len=64)
    path = str(tmp_path / "moe2.yalm")
    synth_checkpoint(path, cfg, seed=72)
    weights = load_weights(read_yalm(path), cfg)

    def run(**kw):
        sched = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                          spec_lookup=True, spec_k=3, **kw)
        rs = [Request(prompt_tokens=[1, 5 + i, 9, 5 + i, 9],
                      max_new_tokens=10, temperature=0.0, seed=i)
              for i in range(4)]
        for r in rs:
            sched.submit(r)
        sched.run()
        assert sched.spec_stats["rounds"] >= 1
        return [r.generated for r in rs]

    dense = run()
    paged = run(paged_pages=1 + 8 * 4, page_size=16)
    assert dense == paged
