"""Medusa self-drafting speculation (yalm_tpu/medusa.py + engine
generate_medusa): proposals are argmax point masses, so the emitted
stream must EXACTLY match plain decoding regardless of head quality —
heads only change the acceptance rate."""

import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.config import ModelConfig
from yalm_tpu.engine import Engine
from yalm_tpu.utils.testing import synth_checkpoint

from test_fast_path import fast_config


def _mk(tmp_path, name, heads, seed=70, **over):
    # seed 70's greedy stream repeats tokens consecutively, so identity
    # heads (propose "same again") get accepted proposals
    over.setdefault("max_seq_len", 128)
    cfg = fast_config(**over)
    path = str(tmp_path / f"{name}.yalm")
    synth_checkpoint(path, cfg, seed=seed, medusa_heads=heads)
    return path


def test_medusa_metadata_and_loading(tmp_path):
    path = _mk(tmp_path, "m", heads=3)
    yf = read_yalm(path)
    assert yf.metadata["medusa_heads"] == "3"
    eng = Engine.from_checkpoint(path)
    assert eng.medusa is not None and eng.medusa.w1.shape[0] == 3

    from yalm_tpu.medusa import medusa_propose
    props = medusa_propose(eng.medusa, jnp.ones((eng.cfg.dim,), jnp.float32))
    assert props.shape == (3,)


def test_medusa_greedy_head_independence(tmp_path):
    """THE correctness invariant: proposals are verified point masses, so
    the emitted stream is BIT-IDENTICAL no matter what the heads propose
    (random garbage heads vs identity heads) — heads only change the
    acceptance rate. (Vs the plain per-token engine the stream agrees up
    to the chunk-vs-step program's bf16 rounding at near-ties — the same
    property every chunked verify round has.)"""
    p_rand = _mk(tmp_path, "rand", 4)
    p_ident = _mk(tmp_path, "ident", -4)
    e_rand = Engine.from_checkpoint(p_rand)
    e_ident = Engine.from_checkpoint(p_ident)
    rand = list(e_rand.generate_medusa([1, 7, 42], max_steps=24,
                                       temperature=0.0))
    ident = list(e_ident.generate_medusa([1, 7, 42], max_steps=24,
                                         temperature=0.0))
    assert rand == ident
    assert e_rand._spec_stats["rounds"] >= 1
    # identity heads repeat the model's own argmax: synthetic greedy
    # streams settle into repetition, so SOME proposals land
    assert e_ident._spec_stats["accepted"] >= 1, e_ident._spec_stats
    # sanity vs the plain engine: same stream until a bf16 near-tie
    plain = list(Engine.from_checkpoint(p_rand).generate(
        [1, 7, 42], max_steps=24, temperature=0.0))
    assert rand[:8] == plain[:8]


def test_medusa_window_edge_fallback(tmp_path):
    """Speculation stops at the window edge (ring regime can't roll back);
    the head-independent stream continues across the boundary."""
    pa = _mk(tmp_path, "edge_a", heads=3, max_seq_len=64)
    pb = _mk(tmp_path, "edge_b", heads=-3, max_seq_len=64)
    prompt = [1] + list(np.random.default_rng(0).integers(3, 500, 40))
    a = list(Engine.from_checkpoint(pa).generate_medusa(
        prompt, max_steps=40, temperature=0.0))
    b = list(Engine.from_checkpoint(pb).generate_medusa(
        prompt, max_steps=40, temperature=0.0))
    assert a == b and len(a) == 40


def test_medusa_sampled_stream_valid(tmp_path):
    """T>0 point-mass rejection: deterministic per seed, valid tokens
    (the exact-distribution statistics are pinned for the shared
    pointmass_rejection_verify in test_prompt_lookup)."""
    path = _mk(tmp_path, "samp", heads=-4)
    eng = Engine.from_checkpoint(path)
    got1 = list(eng.generate_medusa([1, 7], max_steps=12, temperature=0.8,
                                    seed=5))
    eng2 = Engine.from_checkpoint(path)
    got2 = list(eng2.generate_medusa([1, 7], max_steps=12, temperature=0.8,
                                     seed=5))
    assert got1 == got2 and len(got1) == 12
    assert all(0 <= t < eng.cfg.vocab_size for t in got1)


def test_medusa_requires_heads(tmp_path):
    path = _mk(tmp_path, "none", heads=0)
    eng = Engine.from_checkpoint(path)
    with pytest.raises(ValueError, match="medusa"):
        list(eng.generate_medusa([1, 7], max_steps=4))


def test_medusa_rejects_mesh(tmp_path):
    import jax
    from yalm_tpu.parallel.mesh import MeshConfig, make_mesh
    path = _mk(tmp_path, "mesh", heads=3)
    mesh = make_mesh(MeshConfig(tp=2), devices=jax.devices()[:2])
    eng = Engine.from_checkpoint(path, mesh=mesh, kv_dtype=jnp.bfloat16)
    assert eng.medusa is not None
    with pytest.raises(ValueError, match="mesh"):
        list(eng.generate_medusa([1, 7], max_steps=4))


# ------------------------------------------- medusa as a SCHEDULER source
def _mk_sched(path, **kw):
    from yalm_tpu.medusa import load_medusa_weights
    from yalm_tpu.models import load_weights
    from yalm_tpu.scheduler import Scheduler
    yf = read_yalm(path)
    from yalm_tpu.config import ModelConfig
    cfg = ModelConfig.from_metadata(yf.metadata)
    weights = load_weights(yf, cfg)
    mw = load_medusa_weights(yf, cfg)
    yf.close()
    return cfg, weights, Scheduler(cfg, weights, batch=8,
                                   kv_dtype=jnp.bfloat16, spec_medusa=mw,
                                   **kw)


def test_medusa_scheduler_head_independence(tmp_path):
    """Scheduler-level Medusa: the emitted stream is IDENTICAL whatever
    the heads propose (point-mass verify) — and agrees with the plain
    scheduler until the first chunk-vs-tick bf16 near-tie."""
    from yalm_tpu.models import load_weights
    from yalm_tpu.scheduler import Request, Scheduler
    p_rand = _mk(tmp_path, "srand", 4)
    p_ident = _mk(tmp_path, "sident", -4)
    streams = {}
    stats = {}
    for name, p in (("rand", p_rand), ("ident", p_ident)):
        cfg, w, sched = _mk_sched(p)
        rs = [Request(prompt_tokens=[1, 7, 42], max_new_tokens=24,
                      temperature=0.0, seed=i) for i in range(3)]
        for r in rs:
            sched.submit(r)
        sched.run()
        streams[name] = [r.generated for r in rs]
        stats[name] = dict(sched.spec_stats)
    assert streams["rand"] == streams["ident"]
    assert stats["rand"]["rounds"] >= 1
    assert stats["ident"]["accepted"] >= 1, stats["ident"]

    # vs plain scheduler: agreement until a verify-vs-tick near-tie
    yf = read_yalm(p_rand)
    from yalm_tpu.config import ModelConfig
    cfg = ModelConfig.from_metadata(yf.metadata)
    w = load_weights(yf, cfg)
    yf.close()
    plain = Scheduler(cfg, w, batch=8, kv_dtype=jnp.bfloat16)
    pr = [Request(prompt_tokens=[1, 7, 42], max_new_tokens=24,
                  temperature=0.0, seed=i) for i in range(3)]
    for r in pr:
        plain.submit(r)
    plain.run()
    agree = total = 0
    for got, want in zip(streams["rand"], [r.generated for r in pr]):
        for x, y in zip(got, want):
            total += 1
            if x != y:
                break
            agree += 1
    assert agree / total > 0.7, (agree, total, streams["rand"])


def test_medusa_scheduler_paged_matches_dense(tmp_path):
    """medusa x paged: the verify sweep scatters through page tables AND
    returns the hidden rows; streams match the dense medusa scheduler."""
    from yalm_tpu.scheduler import Request
    p = _mk(tmp_path, "pgd", -4)

    def run(**kw):
        _, _, sched = _mk_sched(p, **kw)
        rs = [Request(prompt_tokens=[1, 7, 42], max_new_tokens=16,
                      temperature=0.0, seed=i) for i in range(4)]
        for r in rs:
            sched.submit(r)
        sched.run()
        return [r.generated for r in rs], dict(sched.spec_stats)

    dense, dst = run()
    paged, pst = run(paged_pages=1 + 8 * 9, page_size=16)
    assert dense == paged
    assert pst["rounds"] >= 1 and pst["accepted"] >= 1


def test_medusa_scheduler_sampled(tmp_path):
    """T>0 medusa scheduling: exact rejection sampling over head
    proposals — seed-reproducible, finite logprobs, full length."""
    from yalm_tpu.scheduler import Request
    p = _mk(tmp_path, "smp", -4)
    outs = []
    for rep in range(2):
        _, _, sched = _mk_sched(p)
        r = sched.submit(Request(prompt_tokens=[1, 7, 42], max_new_tokens=12,
                                 temperature=0.9, seed=11))
        sched.run()
        outs.append(list(r.generated))
        assert all(np.isfinite(r.logprobs))
    assert outs[0] == outs[1] and len(outs[0]) == 12


def test_medusa_scheduler_exclusive(tmp_path):
    from yalm_tpu.models import load_weights
    from yalm_tpu.medusa import load_medusa_weights
    from yalm_tpu.scheduler import Scheduler
    p = _mk(tmp_path, "exc", 2)
    yf = read_yalm(p)
    cfg = ModelConfig.from_metadata(yf.metadata)
    w = load_weights(yf, cfg)
    mw = load_medusa_weights(yf, cfg)
    yf.close()
    with pytest.raises(ValueError, match="mutually exclusive"):
        Scheduler(cfg, w, batch=8, spec_medusa=mw, spec_lookup=True)


def test_medusa_scheduler_mesh_matches_dense(tmp_path):
    """medusa x mesh (round-5 closure): the sharded verify sweep exposes
    the post-final-norm hidden rows (with_hidden), so the dp x tp
    scheduler serves Medusa proposals — streams match the single-device
    medusa scheduler at T=0."""
    import jax
    from yalm_tpu.parallel import MeshConfig, make_mesh
    from yalm_tpu.scheduler import Request
    p = _mk(tmp_path, "msh", -4)

    def run(**kw):
        _, _, sched = _mk_sched(p, **kw)
        rs = [Request(prompt_tokens=[1, 7, 42], max_new_tokens=12,
                      temperature=0.0, seed=i) for i in range(4)]
        for r in rs:
            sched.submit(r)
        sched.run()
        return [r.generated for r in rs], dict(sched.spec_stats)

    dense, dst = run()
    mesh = make_mesh(MeshConfig(dp=2, tp=2), devices=jax.devices()[:4])
    sharded, sst = run(mesh=mesh)
    assert dense == sharded
    assert sst["rounds"] >= 1 and sst["accepted"] >= 1, sst


def test_server_medusa(tmp_path):
    """--medusa serving: heads load from the SAME checkpoint; greedy and
    sampled completions stream."""
    from yalm_tpu.server import ServingEngine
    p = _mk(tmp_path, "srv", -4)
    eng = ServingEngine.from_checkpoint(p, batch=8, medusa=True)
    try:
        assert eng.sched.spec and eng.sched.spec_medusa is not None
        out = eng.complete("hello", max_tokens=8, temperature=0.0)
        assert isinstance(out, str)
        assert eng.sched.spec_stats["rounds"] >= 1
        out2 = eng.complete("hello", max_tokens=6, temperature=0.8)
        assert isinstance(out2, str)
    finally:
        eng.close()


# -------------------------------------------------- TREE-attention medusa
def test_medusa_tree_head_independence(tmp_path):
    """Tree verification emits the target's greedy stream whatever the
    head candidates propose — exact up to PATH near-ties: a tree row
    attends its ancestors at chunk indices rather than cache slots, so
    different accept patterns regroup the f32 softmax reduction and can
    flip a rare near-tie (the chain, which writes rows through the cache
    in slot order, is bitwise path-independent). Random heads vs identity
    heads must agree until the first such near-tie and both complete."""
    from yalm_tpu.scheduler import Request
    p_rand = _mk(tmp_path, "trand", 4)
    p_ident = _mk(tmp_path, "tident", -4)
    streams, stats = {}, {}
    for name, p in (("rand", p_rand), ("ident", p_ident)):
        cfg, w, sched = _mk_sched(p, spec_tree=(3, 2))
        assert sched.spec_tree == (3, 2)
        rs = [Request(prompt_tokens=[1, 7, 42], max_new_tokens=24,
                      temperature=0.0, seed=i) for i in range(3)]
        for r in rs:
            sched.submit(r)
        sched.run()
        streams[name] = [r.generated for r in rs]
        stats[name] = dict(sched.spec_stats)
    agree = total = 0
    for a, b in zip(streams["rand"], streams["ident"]):
        assert len(a) == len(b) == 24
        for x, y in zip(a, b):
            total += 1
            if x != y:
                break
            agree += 1
    assert agree / total > 0.7, (agree, total, streams)
    assert stats["rand"]["rounds"] >= 1
    assert stats["ident"]["accepted"] >= 1, stats["ident"]


def test_medusa_tree_agrees_with_plain(tmp_path):
    """Tree streams agree with the plain scheduler until the first
    verify-vs-tick bf16 near-tie (the chain test's invariant), and every
    request completes at full length with finite logprobs."""
    from yalm_tpu.models import load_weights
    from yalm_tpu.scheduler import Request, Scheduler
    p = _mk(tmp_path, "tpl", -4)
    cfg, w, sched = _mk_sched(p, spec_tree=(3, 2), top_logprobs=2)
    rs = [Request(prompt_tokens=[1, 7, 42], max_new_tokens=20,
                  temperature=0.0, seed=i) for i in range(3)]
    for r in rs:
        sched.submit(r)
    sched.run()
    assert all(len(r.generated) == 20 for r in rs)
    for r in rs:
        assert all(np.isfinite(r.logprobs))
        assert all(len(t) == 2 for t in r.top_logprobs)

    yf = read_yalm(p)
    cfg2 = ModelConfig.from_metadata(yf.metadata)
    w2 = load_weights(yf, cfg2)
    yf.close()
    plain = Scheduler(cfg2, w2, batch=8, kv_dtype=jnp.bfloat16)
    pr = [Request(prompt_tokens=[1, 7, 42], max_new_tokens=20,
                  temperature=0.0, seed=i) for i in range(3)]
    for r in pr:
        plain.submit(r)
    plain.run()
    agree = total = 0
    for got, want in zip([r.generated for r in rs],
                         [r.generated for r in pr]):
        for x, y in zip(got, want):
            total += 1
            if x != y:
                break
            agree += 1
    assert agree / total > 0.7, (agree, total)


def test_medusa_tree_beats_chain_on_rank2_candidates(tmp_path):
    """The tree's raison d'etre: when the correct token is the head's
    SECOND choice, a k=2 tree still advances while the linear chain
    rejects every round. Candidates are injected after each round:
    rank 1 deliberately wrong, rank 2 = the true next token."""
    from yalm_tpu.scheduler import Request
    p = _mk(tmp_path, "trk", -4)

    # reference greedy stream from an uninjected tree run
    cfg, w, sched0 = _mk_sched(p, spec_tree=(2,))
    r0 = sched0.submit(Request(prompt_tokens=[1, 7, 42], max_new_tokens=16,
                               temperature=0.0))
    sched0.run()
    stream = list(r0.generated)
    V = cfg.vocab_size

    def drive(sched, r, bank):
        while sched.queue or sched.n_active:
            sched.step()
            for s in sched.slots:
                if s.request is not r or not s.med_props:
                    continue
                n = len(r.generated)
                if 0 < n < len(stream):
                    s.med_props = bank(stream[n])
        return list(r.generated), dict(sched.spec_stats)

    # tree, rank2-correct candidates: advances via the second child
    _, _, tree = _mk_sched(p, spec_tree=(2,))
    rt = tree.submit(Request(prompt_tokens=[1, 7, 42], max_new_tokens=16,
                             temperature=0.0))
    got_t, st_t = drive(tree, rt,
                        lambda right: [[(right + 1) % V, right]])

    # chain (K=1), same wrong rank-1 proposals: never advances
    _, _, chain = _mk_sched(p, spec_k=1)
    rc = chain.submit(Request(prompt_tokens=[1, 7, 42], max_new_tokens=16,
                              temperature=0.0))
    got_c, st_c = drive(chain, rc, lambda right: [(right + 1) % V])

    assert got_t == stream and got_c == stream  # exactness either way
    assert st_t["accepted"] > st_c["accepted"], (st_t, st_c)
    assert st_t["rounds"] < st_c["rounds"], (st_t, st_c)


def test_medusa_tree_rejections(tmp_path):
    import jax
    from yalm_tpu.models import load_weights
    from yalm_tpu.medusa import load_medusa_weights
    from yalm_tpu.scheduler import Scheduler
    from yalm_tpu.parallel import MeshConfig, make_mesh
    p = _mk(tmp_path, "trj", 2)
    yf = read_yalm(p)
    cfg = ModelConfig.from_metadata(yf.metadata)
    w = load_weights(yf, cfg)
    mw = load_medusa_weights(yf, cfg)
    yf.close()
    with pytest.raises(ValueError, match="spec_medusa"):
        Scheduler(cfg, w, batch=8, spec_tree=(2, 2),
                  kv_dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match="heads"):
        Scheduler(cfg, w, batch=8, spec_medusa=mw, spec_tree=(2, 2, 2),
                  kv_dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match="dense single-device"):
        Scheduler(cfg, w, batch=8, spec_medusa=mw, spec_tree=(2,),
                  paged_pages=16, page_size=16, kv_dtype=jnp.bfloat16)
