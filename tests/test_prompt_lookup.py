"""Prompt-lookup (n-gram) speculative decoding — draft-model-free.

Invariants: at T=0 the emitted stream is EXACTLY the plain greedy stream
(lookup may only shortcut compute); at T>0 the point-mass rejection math
emits tokens distributed exactly as target-only sampling. (No reference
counterpart: the reference emits one token per full pass,
src/main.cpp:102-112.)
"""

import numpy as np
import pytest

from yalm_tpu.engine import Engine
from yalm_tpu.spec import NgramHistory, ngram_propose, pointmass_rejection_verify
from yalm_tpu.utils.testing import synth_checkpoint, tiny_config


# ---------------------------------------------------------------- proposals
def test_ngram_propose_basic():
    # trailing bigram (2, 3) occurred earlier at offset 1 -> continues 4, 5
    ctx = [1, 2, 3, 4, 5, 9, 2, 3]
    assert ngram_propose(ctx, 2) == [4, 5]
    assert ngram_propose(ctx, 4) == [4, 5, 9, 2]


def test_ngram_propose_prefers_longest_and_most_recent():
    # trailing trigram (7, 2, 3) matches offset 4 (-> 8); the bigram (2, 3)
    # alone would match offset 1 (-> 4) — longest n-gram wins
    ctx = [1, 2, 3, 4, 7, 2, 3, 8, 0, 7, 2, 3]
    assert ngram_propose(ctx, 1, max_ngram=3) == [8]
    # most recent earlier occurrence wins among same-size matches
    ctx2 = [5, 6, 1, 0, 5, 6, 2, 0, 5, 6]
    assert ngram_propose(ctx2, 1, max_ngram=3) == [2]


def test_ngram_propose_no_match():
    assert ngram_propose([1, 2, 3, 4], 3) == []
    assert ngram_propose([], 3) == []
    assert ngram_propose([7], 3) == []


def test_ngram_history_matches_scan():
    """The incremental index must agree with the reference O(n) scan on a
    random-but-repetitive stream, at every step."""
    rng = np.random.default_rng(0)
    toks = [int(t) for t in rng.integers(0, 5, size=200)]  # tiny alphabet
    hist = NgramHistory(toks[:10])
    for i in range(10, len(toks)):
        for k in (1, 3, 5):
            assert hist.propose(k) == ngram_propose(toks[:i], k), (i, k)
        hist.extend([toks[i]])


# ---------------------------------------------------------------- engine T=0
def _mk(tmp_path, name, cfg, seed):
    path = str(tmp_path / name)
    synth_checkpoint(path, cfg, seed=seed)
    return Engine.from_checkpoint(path)


@pytest.mark.parametrize("n_draft", [1, 4])
def test_prompt_lookup_equals_greedy(tmp_path, n_draft):
    cfg = tiny_config(max_seq_len=96)
    target = _mk(tmp_path, "t.yalm", cfg, seed=11)
    ref = _mk(tmp_path, "r.yalm", cfg, seed=11)
    # repetitive prompt: gives the lookup something to match
    prompt = [1, 5, 9, 2, 5, 9, 2, 5, 9]
    want = list(ref.generate(prompt, max_steps=30, temperature=0.0))
    got = list(target.generate_speculative(prompt, n_draft=n_draft,
                                           max_steps=30))
    assert got == want
    st = target._spec_stats
    assert st["rounds"] + st["plain"] > 0


def test_prompt_lookup_crosses_window_edge(tmp_path):
    cfg = tiny_config(max_seq_len=32)
    target = _mk(tmp_path, "t.yalm", cfg, seed=12)
    ref = _mk(tmp_path, "r.yalm", cfg, seed=12)
    prompt = [1, 2, 3, 1, 2, 3]
    n = 40  # well past the 32-token window
    want = list(ref.generate(prompt, max_steps=n, temperature=0.0))
    got = list(target.generate_speculative(prompt, n_draft=4, max_steps=n))
    assert got == want


def test_prompt_lookup_stop_token(tmp_path):
    cfg = tiny_config(max_seq_len=96)
    target = _mk(tmp_path, "t.yalm", cfg, seed=13)
    ref = _mk(tmp_path, "r.yalm", cfg, seed=13)
    prompt = [1, 3, 1, 3]
    want = list(ref.generate(prompt, max_steps=30, temperature=0.0))
    stop = want[5]
    want_stop = want[: want.index(stop) + 1]
    got = list(target.generate_speculative(prompt, n_draft=3, max_steps=30,
                                           stop_tokens=[stop]))
    assert got == want_stop


def test_prompt_lookup_accepts_on_cyclic_stream(tmp_path):
    """Tiny random models fall into greedy cycles; once the stream repeats,
    prompt lookup must start accepting (the perf rationale). If this seed's
    stream happens not to cycle within the horizon, the equality test above
    still holds and we skip the acceptance assert."""
    cfg = tiny_config(max_seq_len=256)
    target = _mk(tmp_path, "t.yalm", cfg, seed=14)
    ref = _mk(tmp_path, "r.yalm", cfg, seed=14)
    prompt = [1, 2]
    want = list(ref.generate(prompt, max_steps=80, temperature=0.0))
    got = list(target.generate_speculative(prompt, n_draft=4, max_steps=80))
    assert got == want
    # detect a repeated trigram in the stream (cycle)
    s = prompt + want
    tris = {tuple(s[i:i + 3]) for i in range(len(s) - 3)}
    if len(tris) < len(s) - 3:  # some trigram repeats
        assert target._spec_stats["accepted"] > 0, target._spec_stats


# ---------------------------------------------------------------- T>0 math
def test_pointmass_rejection_exact_distribution():
    """40k trials: the first emitted token's marginal equals the exact
    target distribution p regardless of what the lookup proposed."""
    rng = np.random.default_rng(0)
    V, K, T = 8, 3, 0.9
    t_lg = rng.standard_normal((K + 1, V)) * 2.0

    def softmax_T(z):
        z = z.astype(np.float64) / T
        z = z - z.max()
        e = np.exp(z)
        return e / e.sum()

    p0 = softmax_T(t_lg[0])
    counts = np.zeros(V)
    n = 40000
    for _ in range(n):
        d = [int(rng.integers(0, V)) for _ in range(K)]  # arbitrary proposals
        emitted, a = pointmass_rejection_verify(rng, T, t_lg, d)
        counts[emitted[0]] += 1
    emp = counts / n
    tv = 0.5 * np.abs(emp - p0).sum()
    assert tv < 0.02, (tv, emp, p0)


def test_prompt_lookup_sampling_runs(tmp_path):
    cfg = tiny_config(max_seq_len=128)
    target = _mk(tmp_path, "t.yalm", cfg, seed=15)
    toks = list(target.generate_speculative(
        [1, 7, 3, 7, 3], n_draft=4, max_steps=24, temperature=0.9, seed=5))
    assert len(toks) == 24
    assert all(0 <= t < cfg.vocab_size for t in toks)


# ------------------------------------------------------------- scheduler mode
def _mk_sched(tmp_path, seed, **kw):
    import jax.numpy as jnp
    from yalm_tpu.codec.format import read_yalm
    from yalm_tpu.models import load_weights
    from yalm_tpu.scheduler import Scheduler
    from test_fast_path import fast_config
    cfg = fast_config(max_seq_len=64)
    path = str(tmp_path / f"s{seed}.yalm")
    synth_checkpoint(path, cfg, seed=seed)
    weights = load_weights(read_yalm(path), cfg)
    return cfg, weights, Scheduler(cfg, weights, batch=8,
                                   kv_dtype=jnp.bfloat16, **kw)


def test_sched_lookup_streams_match_plain(tmp_path):
    """spec_lookup streams agree with the plain scheduler until the first
    verify-vs-tick near-tie (same caveat as the draft-model spec tests:
    the verify chunk uses the prefill formulation, the plain tick the fused
    decode kernel — bf16 rounding can flip near-ties on synthetic
    weights). Repetitive prompts so the lookup actually fires."""
    import jax.numpy as jnp
    from yalm_tpu.scheduler import Request, Scheduler

    def reqs():
        return [Request(prompt_tokens=[1, 5 + i, 9, 5 + i, 9], max_new_tokens=12,
                        temperature=0.0, seed=i) for i in range(10)]

    cfg, weights, look = _mk_sched(tmp_path, seed=70, spec_lookup=True,
                                   spec_k=4)
    plain = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16)
    want = []
    for r in reqs():
        plain.submit(r)
        want.append(r)
    plain.run()

    got = []
    for r in reqs():
        look.submit(r)
        got.append(r)
    look.run()
    agree = total = 0
    for a, b in zip(got, want):
        assert len(a.generated) == len(b.generated) == 12
        for x, y in zip(a.generated, b.generated):
            total += 1
            if x != y:
                break
            agree += 1
    assert agree / total > 0.8, (agree, total)
    st = look.spec_stats
    # tiny models cycle fast: across 10 repetitive-prompt requests the
    # lookup must have proposed and had some acceptances
    assert st["rounds"] >= 1 and st["proposed"] >= 1, st
    assert st["accepted"] >= 1, st


def test_sched_lookup_window_edge_fallback(tmp_path):
    """Edge lanes leave the lookup path and still complete (exact length,
    agreeing prefix vs plain)."""
    import jax.numpy as jnp
    from yalm_tpu.scheduler import Request, Scheduler

    def mk():
        return Request(prompt_tokens=[1] + [5, 9] * 20, max_new_tokens=30,
                       temperature=0.0, seed=3)

    cfg, weights, look = _mk_sched(tmp_path, seed=71, spec_lookup=True,
                                   spec_k=4)
    plain = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16)
    w = mk()
    plain.submit(w)
    plain.run()
    g = mk()
    look.submit(g)
    look.run()
    assert len(g.generated) == len(w.generated) == 30
    agree = 0
    for x, y in zip(g.generated, w.generated):
        if x != y:
            break
        agree += 1
    assert agree >= 10, (agree, g.generated, w.generated)


def test_sched_lookup_serves_topk_topp_rejects_combo(tmp_path):
    """Spec mode serves ANY sampling envelope (round-5: _verify_pack
    applies per-request top_k/top_p to the target before the accept math);
    proposal sources stay mutually exclusive."""
    import pytest
    from yalm_tpu.scheduler import Request, Scheduler
    cfg, weights, sched = _mk_sched(tmp_path, seed=72, spec_lookup=True)
    r1 = sched.submit(Request(prompt_tokens=[1, 2], temperature=0.7,
                              max_new_tokens=2))
    r2 = sched.submit(Request(prompt_tokens=[1, 2], temperature=0.7,
                              top_k=5, max_new_tokens=2))
    r3 = sched.submit(Request(prompt_tokens=[1, 2], top_p=0.9,
                              max_new_tokens=2))
    with pytest.raises(ValueError, match="mutually exclusive"):
        Scheduler(cfg, weights, batch=8, spec_lookup=True,
                  spec_draft=(cfg, weights))
    sched.run()  # every envelope completes through verify rounds
    assert all(len(r.generated) == 2 for r in (r1, r2, r3))


def test_server_over_lookup_scheduler(tmp_path):
    """--spec-lookup serving: greedy requests stream, no draft checkpoint
    needed."""
    from yalm_tpu.codec.format import read_yalm
    from yalm_tpu.models import load_weights
    from yalm_tpu.server import ServingEngine
    from yalm_tpu.tokenizer import Tokenizer
    from test_fast_path import fast_config

    cfg = fast_config(max_seq_len=64)
    path = str(tmp_path / "srv.yalm")
    synth_checkpoint(path, cfg, seed=73)
    yf = read_yalm(path)
    weights = load_weights(yf, cfg)
    tok = Tokenizer.from_yalm(yf)
    yf.close()
    eng = ServingEngine(cfg, weights, tok, batch=8, spec_lookup=True,
                        spec_k=3)
    try:
        assert eng.sched.spec and eng.sched.spec_lookup
        out = eng.complete("ababab", max_tokens=8, temperature=0.0)
        assert isinstance(out, str)
        assert eng.sched.spec_stats["rounds"] + 1 >= 1
    finally:
        eng.close()
