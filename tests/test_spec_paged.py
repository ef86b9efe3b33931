"""Speculative decoding COMPOSED with the paged KV pool.

Invariants: the paged verify chunk computes exactly what the dense verify
chunk computes (same math, rows routed through page tables instead of lane
offsets); spec schedulers over a paged pool emit the same streams as over
a dense cache; and pool-pressure preemption resumes a speculating lane
exactly. (No reference counterpart: the reference is single-stream with one
static cache and no speculation, src/main.cpp:102-112.)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.models import load_weights
from yalm_tpu.models.cache import KVCache
from yalm_tpu.models.fast import (FastWeights, prefill_fast,
                                  verify_chunk_fast_batched,
                                  verify_chunk_fast_batched_paged)
from yalm_tpu.models.paged import PagedKVPool
from yalm_tpu.scheduler import Request, Scheduler
from yalm_tpu.utils.testing import synth_checkpoint

from test_fast_path import fast_config

PAGE = 16  # window 32 -> 2 blocks per lane


def _weights(tmp_path, seed=81, **over):
    cfg = fast_config(**over)
    path = str(tmp_path / f"m{seed}.yalm")
    synth_checkpoint(path, cfg, seed=seed)
    return cfg, load_weights(read_yalm(path), cfg)


def test_paged_verify_chunk_matches_dense(tmp_path):
    """Same lane histories, one routed through page tables: logits must
    match the dense verify bitwise, and written rows must land on the
    mapped pages (disabled lanes' pages untouched)."""
    cfg, weights = _weights(tmp_path)
    fw = FastWeights.from_weights(weights, cfg)
    S, nblk = cfg.max_seq_len, cfg.max_seq_len // PAGE

    B, T = 4, 4
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, (B, T)), jnp.int32)
    pos0 = jnp.asarray([0, 5, 17, 28], jnp.int32)   # lane 3 straddles pages
    enable = jnp.asarray([1, 1, 0, 1], jnp.int32)

    # hydrate per-lane dense histories
    hist = jnp.asarray(rng.integers(3, cfg.vocab_size, S), jnp.int32)
    lanes = []
    for b in range(B):
        lane = KVCache.init(cfg, jnp.bfloat16)
        p = int(pos0[b])
        if p:
            _, lane = prefill_fast(cfg, fw, hist[:S], jnp.int32(0),
                                   jnp.int32(p), lane, logits_mode="none")
        lanes.append(lane)
    dense = KVCache(k=jnp.stack([l.k for l in lanes]),
                    v=jnp.stack([l.v for l in lanes]))

    # mirror the same rows into a page pool (page 0 reserved as sink)
    tables = np.arange(1, 1 + B * nblk, dtype=np.int32).reshape(B, nblk)
    pool = PagedKVPool.init(cfg, jnp.bfloat16, 1 + B * nblk, PAGE)
    pk, pv = np.array(pool.k), np.array(pool.v)
    for b in range(B):
        for blk in range(nblk):
            # lane layout (L, S, Hk, D) -> page layout (L, PAGE, Hk, D)
            pk[tables[b, blk]] = np.asarray(
                lanes[b].k[:, blk * PAGE:(blk + 1) * PAGE])
            pv[tables[b, blk]] = np.asarray(
                lanes[b].v[:, blk * PAGE:(blk + 1) * PAGE])
    pool = PagedKVPool(k=jnp.asarray(pk), v=jnp.asarray(pv))

    want, dense2 = verify_chunk_fast_batched(cfg, fw, tokens, pos0, enable,
                                             dense)
    got, pool2 = verify_chunk_fast_batched_paged(
        cfg, fw, tokens, pos0, enable, pool, jnp.asarray(tables),
        page_size=PAGE)
    for b in range(B):
        if int(enable[b]):
            np.testing.assert_array_equal(
                np.asarray(got[b], np.float32), np.asarray(want[b], np.float32))
    # written rows: map the paged pool back to lane views and compare
    for b in range(B):
        lane_k = jnp.concatenate(
            [pool2.k[tables[b, blk]] for blk in range(nblk)], axis=1)
        np.testing.assert_array_equal(
            np.asarray(lane_k, np.float32),
            np.asarray(dense2.k[b], np.float32))


def _reqs(n, max_new=10, seed0=0, prompt=None):
    return [Request(prompt_tokens=prompt or [1, 5 + i, 9, 5 + i, 9],
                    max_new_tokens=max_new, temperature=0.0, seed=seed0 + i)
            for i in range(n)]


def _run(sched, reqs):
    for r in reqs:
        sched.submit(r)
    sched.run()
    return [r.generated for r in reqs]


def test_paged_lookup_matches_dense_lookup(tmp_path):
    cfg, weights = _weights(tmp_path, seed=82)
    dense = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      spec_lookup=True, spec_k=3)
    want = _run(dense, _reqs(10))

    paged = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      spec_lookup=True, spec_k=3,
                      paged_pages=1 + 8 * (cfg.max_seq_len // PAGE),
                      page_size=PAGE)
    assert paged.paged and paged.spec and paged.spec_lookup
    got = _run(paged, _reqs(10))
    assert got == want
    assert paged.spec_stats["rounds"] >= 1
    assert paged.spec_stats["accepted"] >= 1, paged.spec_stats
    assert paged.alloc.n_free == 8 * (cfg.max_seq_len // PAGE)


def test_paged_draft_spec_matches_dense_draft_spec(tmp_path):
    cfg, weights = _weights(tmp_path, seed=83)
    dcfg = fast_config(n_layers=1)
    dpath = str(tmp_path / "d.yalm")
    synth_checkpoint(dpath, dcfg, seed=84)
    dweights = load_weights(read_yalm(dpath), dcfg)

    dense = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      spec_draft=(dcfg, dweights), spec_k=3)
    want = _run(dense, _reqs(8))

    paged = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      spec_draft=(dcfg, dweights), spec_k=3,
                      paged_pages=1 + 8 * (cfg.max_seq_len // PAGE),
                      page_size=PAGE)
    got = _run(paged, _reqs(8))
    assert got == want
    assert paged.spec_stats["rounds"] >= 1


def test_paged_lookup_pool_pressure_preempts_and_resumes(tmp_path):
    """A speculating lane preempted by pool exhaustion resumes its exact
    stream (hist and position re-hydrated), matching the unpressured run."""
    cfg, weights = _weights(tmp_path, seed=85)
    assert cfg.max_seq_len == 2 * PAGE
    reqs_a = _reqs(2, max_new=20)
    roomy = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      spec_lookup=True, spec_k=3,
                      paged_pages=1 + 8 * 2, page_size=PAGE)
    want = _run(roomy, reqs_a)

    tight = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      spec_lookup=True, spec_k=3,
                      paged_pages=4, page_size=PAGE)  # 3 usable pages
    reqs = _reqs(2, max_new=20)
    for r in reqs:
        tight.submit(r)
    saw_preempt = False
    for _ in range(300):
        if not tight.queue and tight.n_active == 0:
            break
        tight.step()
        if any(r._resume is not None for r in reqs) or \
                any(r in tight.queue for r in reqs):
            saw_preempt = True
    assert [r.generated for r in reqs] == want
    assert saw_preempt
    assert tight.alloc.n_free == 3


def test_paged_lookup_on_mesh_matches_single_device(tmp_path):
    """The FULL composition (speculation x paged pool x dp x tp mesh): the
    sharded paged verify sweep (make_verify_chunk_paged_fast_tp) scatters
    each dp group's chunk rows through its group-local page tables and
    must reproduce the plain single-device lookup scheduler's streams."""
    import jax
    from yalm_tpu.parallel.mesh import MeshConfig, make_mesh
    cfg, weights = _weights(tmp_path, seed=86)

    single = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                       spec_lookup=True, spec_k=3)
    want = _run(single, _reqs(10))

    mesh = make_mesh(MeshConfig(dp=2, tp=2), devices=jax.devices()[:4])
    nblk = cfg.max_seq_len // PAGE
    sched = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      spec_lookup=True, spec_k=3, mesh=mesh,
                      paged_pages=2 * (1 + 4 * nblk), page_size=PAGE)
    assert sched.paged and sched.spec_lookup and sched.mesh is not None
    got = _run(sched, _reqs(10))
    assert got == want
    assert sched.spec_stats["rounds"] >= 1
    assert sched.spec_stats["accepted"] >= 1, sched.spec_stats
    assert sched.alloc.n_free == 2 * 4 * nblk


# ------------------------------------------------------------- spec x mesh
def test_mesh_lookup_matches_single_device(tmp_path):
    """Lookup speculation over a dp x tp mesh: the sharded verify sweep
    (parallel/fast_tp.make_verify_chunk_fast_tp) must reproduce the
    single-device lookup scheduler's streams exactly."""
    import jax
    from yalm_tpu.parallel.mesh import MeshConfig, make_mesh
    cfg, weights = _weights(tmp_path, seed=87)

    single = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                       spec_lookup=True, spec_k=3)
    want = _run(single, _reqs(10))

    mesh = make_mesh(MeshConfig(dp=4, tp=2), devices=jax.devices())
    sched = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      spec_lookup=True, spec_k=3, mesh=mesh)
    assert sched.fast and sched.spec_lookup and sched.mesh is not None
    got = _run(sched, _reqs(10))
    assert got == want
    assert sched.spec_stats["rounds"] >= 1
    assert sched.spec_stats["accepted"] >= 1, sched.spec_stats


def test_mesh_accepts_draft_spec(tmp_path):
    """Round-5: draft x mesh works (the draft shards over the same mesh);
    test_scheduler_mesh.py pins the streams — here just the construction."""
    import jax
    import jax.numpy as jnp
    from yalm_tpu.parallel.mesh import MeshConfig, make_mesh
    cfg, weights = _weights(tmp_path, seed=88)
    cfg2, weights2 = _weights(tmp_path, seed=89)
    mesh = make_mesh(MeshConfig(dp=2, tp=2), devices=jax.devices()[:4])
    sched = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      spec_draft=(cfg2, weights2), mesh=mesh)
    assert sched.spec and sched.mesh is mesh
