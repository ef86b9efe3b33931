"""OpenAI logit_bias: per-request {token_id: bias} added to the logits
before sampling — the sample, the reported logprob, and top-N all reflect
the biased (i.e. actually sampled) distribution."""

import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.models import load_weights
from yalm_tpu.scheduler import _NBIAS, Request, Scheduler
from yalm_tpu.utils.testing import synth_checkpoint

from test_fast_path import fast_config


def _sched(tmp_path, seed=91, **kw):
    cfg = fast_config(max_seq_len=64)
    path = str(tmp_path / f"lb{seed}.yalm")
    synth_checkpoint(path, cfg, seed=seed)
    weights = load_weights(read_yalm(path), cfg)
    return cfg, weights, Scheduler(cfg, weights, batch=8,
                                   kv_dtype=jnp.bfloat16, **kw)


def test_strong_bias_forces_token(tmp_path):
    cfg, _, sched = _sched(tmp_path)
    forced = 123
    r = sched.submit(Request(prompt_tokens=[1, 7, 9], max_new_tokens=6,
                             temperature=0.0, logit_bias={forced: 100.0}))
    sched.run()
    assert r.generated == [forced] * 6
    # the reported logprob is under the BIASED distribution: ~0 for a
    # +100-bias token that dominates the softmax
    assert all(lp > -1e-2 for lp in r.logprobs), r.logprobs


def test_negative_bias_suppresses_argmax(tmp_path):
    cfg, _, sched = _sched(tmp_path, seed=92)
    plain = sched.submit(Request(prompt_tokens=[1, 7, 9], max_new_tokens=1,
                                 temperature=0.0))
    sched.run()
    nat = plain.generated[0]
    biased = sched.submit(Request(prompt_tokens=[1, 7, 9], max_new_tokens=1,
                                  temperature=0.0,
                                  logit_bias={nat: -100.0}))
    sched.run()
    assert biased.generated[0] != nat


def test_bias_mixed_batch_isolated(tmp_path):
    """A biased lane must not perturb its neighbors: unbiased co-batched
    requests emit exactly their solo streams."""
    cfg, weights, sched = _sched(tmp_path, seed=93)
    solo = sched.submit(Request(prompt_tokens=[1, 5, 9], max_new_tokens=6,
                                temperature=0.0))
    sched.run()
    want = list(solo.generated)

    r1 = sched.submit(Request(prompt_tokens=[1, 5, 9], max_new_tokens=6,
                              temperature=0.0))
    r2 = sched.submit(Request(prompt_tokens=[1, 5, 9], max_new_tokens=6,
                              temperature=0.0, logit_bias={7: 100.0}))
    sched.run()
    assert r1.generated == want
    assert r2.generated == [7] * 6


def test_bias_first_token_and_validation(tmp_path):
    cfg, weights, sched = _sched(tmp_path, seed=94)
    # the FIRST generated token comes from the admission sample path
    # (_sample1_pack) — the bias must apply there too
    r = sched.submit(Request(prompt_tokens=[1, 7, 9], max_new_tokens=1,
                             temperature=0.0, logit_bias={200: 100.0}))
    sched.run()
    assert r.generated == [200]
    with pytest.raises(ValueError, match="at most"):
        sched.submit(Request(prompt_tokens=[1, 2],
                             logit_bias={i: 1.0 for i in range(_NBIAS + 1)}))
    spec = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                     spec_lookup=True)
    with pytest.raises(ValueError, match="speculative"):
        spec.submit(Request(prompt_tokens=[1, 2], logit_bias={3: 1.0}))


def test_bias_paged_matches_dense(tmp_path):
    cfg, weights, _ = _sched(tmp_path, seed=95)

    def run(**kw):
        sched = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16, **kw)
        r = sched.submit(Request(prompt_tokens=[1, 7, 9], max_new_tokens=6,
                                 temperature=0.0,
                                 logit_bias={55: 3.0, 77: -5.0}))
        sched.run()
        return list(r.generated)

    dense = run()
    paged = run(paged_pages=1 + 8 * 4, page_size=16)
    assert dense == paged


def test_bias_sampled_distribution_shift(tmp_path):
    """temperature>0: a large positive bias makes the token dominate the
    sampled stream; seeds keep it reproducible."""
    cfg, _, sched = _sched(tmp_path, seed=96)
    outs = []
    for rep in range(2):
        r = sched.submit(Request(prompt_tokens=[1, 7, 9], max_new_tokens=8,
                                 temperature=1.0, seed=13,
                                 logit_bias={42: 50.0}))
        sched.run()
        outs.append(list(r.generated))
    assert outs[0] == outs[1]
    assert outs[0].count(42) >= 7, outs[0]


def test_server_logit_bias(tmp_path):
    from yalm_tpu.server import ServingEngine
    from yalm_tpu.tokenizer import Tokenizer
    cfg = fast_config(max_seq_len=64)
    path = str(tmp_path / "srv.yalm")
    synth_checkpoint(path, cfg, seed=97)
    yf = read_yalm(path)
    weights = load_weights(yf, cfg)
    tok = Tokenizer.from_yalm(yf)
    yf.close()
    eng = ServingEngine(cfg, weights, tok, batch=8)
    try:
        req, q = eng.submit_prompt("hello", max_tokens=4, temperature=0.0,
                                   logit_bias={99: 100.0})
        while q.get() is not None and not req.done:
            pass
        assert req.error is None, req.error
        assert req.generated == [99] * 4
    finally:
        eng.close()
