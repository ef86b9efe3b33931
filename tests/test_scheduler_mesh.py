"""Continuous batching composed with the mesh (SURVEY §2.6 north star).

A tp x dp sharded Scheduler must produce the SAME token streams as the
single-device scheduler: lanes shard over dp, heads/hidden/kv-heads over
tp, MoE experts over ep. Runs on the virtual 8-device CPU mesh (conftest);
kernels take their jnp emulation inside shard_map, so what's validated is
the sharded-tick collective structure + scheduler plumbing. The reference
has neither batching nor a distributed layer (src/main.cpp:102-112,
src/model.cpp:385-386).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.models import load_weights
from yalm_tpu.parallel.mesh import MeshConfig, make_mesh
from yalm_tpu.scheduler import Request, Scheduler
from yalm_tpu.utils.testing import synth_checkpoint

from test_fast_path import fast_config


def _reqs(n, seed0=0):
    return [Request(prompt_tokens=[1, 5 + i, 9], max_new_tokens=6,
                    temperature=0.0, seed=seed0 + i) for i in range(n)]


def _run(sched, reqs):
    for r in reqs:
        sched.submit(r)
    sched.run()
    return [r.generated for r in reqs]


def test_scheduler_tp_dp_matches_single_device(tmp_path):
    cfg = fast_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=21)
    weights = load_weights(read_yalm(path), cfg)

    ref = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16)
    got_ref = _run(ref, _reqs(10))

    mesh = make_mesh(MeshConfig(dp=4, tp=2), devices=jax.devices())
    sched = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16, mesh=mesh)
    assert sched.fast
    got = _run(sched, _reqs(10))

    for i, (a, b) in enumerate(zip(got, got_ref)):
        assert a == b, f"request {i}: mesh={a} single={b}"


def test_moe_ep_batched_tick_matches_single_device(tmp_path):
    """Batched MoE expert parallelism: experts shard over ep in the batched
    tick (each shard streams only its LOCAL experts; psum over (ep, tp)).

    Compares one tick's logits directly — greedy STREAMS can legitimately
    diverge on router near-ties at psum-reordering (1e-3) numerics, so the
    strong assertion is per-tick logits + argmax parity."""
    from yalm_tpu.models import KVCache
    from yalm_tpu.models.fast import FastWeights, decode_step_fast_batched
    from yalm_tpu.parallel.fast_tp import (make_tick_fast_tp,
                                           shard_fast_tp_weights)
    from yalm_tpu.parallel.sharding import shard_cache

    cfg = fast_config(n_experts=4, n_experts_active=2)
    path = str(tmp_path / "moe.yalm")
    synth_checkpoint(path, cfg, seed=22)
    weights = load_weights(read_yalm(path), cfg)

    B = 8
    toks = jnp.arange(2, 2 + B, dtype=jnp.int32)
    pos = jnp.asarray([3, 0, 1, 5, 2, 0, 4, 1], jnp.int32)
    fw1 = FastWeights.from_weights(weights, cfg)
    l1, _ = decode_step_fast_batched(
        cfg, fw1, toks, pos, KVCache.init(cfg, jnp.bfloat16, batch=B))

    mesh = make_mesh(MeshConfig(dp=2, ep=2, tp=2), devices=jax.devices())
    fw2 = shard_fast_tp_weights(weights, cfg, mesh)
    cache2 = shard_cache(KVCache.init(cfg, jnp.bfloat16, batch=B), cfg, mesh,
                         batched=True)
    l2, _ = jax.jit(make_tick_fast_tp(cfg, mesh))(
        fw2, toks, pos, cache2, jnp.ones((B,), jnp.int32))

    l1, l2 = np.asarray(l1), np.asarray(l2)
    np.testing.assert_allclose(l2, l1, rtol=2e-2, atol=2e-2)
    assert (l1.argmax(-1) == l2.argmax(-1)).all()


def test_scheduler_moe_ep_end_to_end(tmp_path):
    """The ep x dp x tp MoE scheduler completes full requests."""
    cfg = fast_config(n_experts=4, n_experts_active=2)
    path = str(tmp_path / "moe.yalm")
    synth_checkpoint(path, cfg, seed=22)
    weights = load_weights(read_yalm(path), cfg)
    mesh = make_mesh(MeshConfig(dp=2, ep=2, tp=2), devices=jax.devices())
    sched = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16, mesh=mesh)
    got = _run(sched, _reqs(6, seed0=40))
    assert all(len(g) == 6 for g in got)
    # deterministic per seed: resubmitting reproduces the same streams
    sched2 = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16, mesh=mesh)
    got2 = _run(sched2, _reqs(6, seed0=40))
    assert got == got2


def test_scheduler_mesh_rejects_bad_batch(tmp_path):
    cfg = fast_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=23)
    weights = load_weights(read_yalm(path), cfg)
    mesh = make_mesh(MeshConfig(dp=4, tp=2), devices=jax.devices())
    with pytest.raises(ValueError):
        Scheduler(cfg, weights, batch=6, kv_dtype=jnp.bfloat16, mesh=mesh)


def test_paged_scheduler_on_mesh_matches_single_device(tmp_path):
    """Paged KV COMPOSED with the mesh: pool pages shard over dp (per-group
    allocators, group-local page ids), kv-heads over tp. Streams must match
    the plain single-device scheduler token for token."""
    cfg = fast_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=23)
    weights = load_weights(read_yalm(path), cfg)

    ref = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16)
    want = _run(ref, _reqs(10))

    mesh = make_mesh(MeshConfig(dp=2, ep=1, tp=2), devices=jax.devices()[:4])
    PAGE = 16
    sched = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      mesh=mesh, paged_pages=2 * (1 + 4 * 2),
                      page_size=PAGE)
    assert sched.paged and sched.mesh is mesh
    got = _run(sched, _reqs(10))
    for i, (a, b) in enumerate(zip(got, want)):
        assert a == b, f"request {i}: paged-mesh={a} single={b}"
    # all pages released at the end, per group
    assert all(g.n_free == 8 for g in sched.alloc.groups)


def test_paged_mesh_pool_pressure(tmp_path):
    """Per-group pools under pressure: lazy growth + same-group preemption
    still complete every stream identically to the dense run."""
    cfg = fast_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=24)
    weights = load_weights(read_yalm(path), cfg)

    def mk():
        return [Request(prompt_tokens=[1, 8 + i, 9], max_new_tokens=20,
                        temperature=0.0, seed=3 + i) for i in range(6)]

    ref = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16)
    want = _run(ref, mk())

    mesh = make_mesh(MeshConfig(dp=2, ep=1, tp=2), devices=jax.devices()[:4])
    # 3 usable pages per group with 4 lanes each: admission waves inside
    # groups; max_new=20 gives a 2-page worst case, so block-boundary
    # growth and same-group preemption both fire
    sched = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      mesh=mesh, paged_pages=8, page_size=16)
    reqs = mk()
    for r in reqs:
        sched.submit(r)
    sched.run()
    for i, (r, b) in enumerate(zip(reqs, want)):
        assert r.generated == b, f"request {i}"


def test_spec_draft_scheduler_on_mesh_matches_plain(tmp_path):
    """draft x mesh (round-5 closure): the draft model shards over the
    SAME dp x tp mesh (its K+1 greedy ticks are fast-TP batched ticks).
    T=0 rejection is exact, so the spec-draft mesh scheduler's streams
    equal the PLAIN mesh scheduler's — whatever the draft proposes."""
    cfg = fast_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=31)
    weights = load_weights(read_yalm(path), cfg)
    import dataclasses
    dcfg = dataclasses.replace(cfg, n_layers=1)
    dpath = str(tmp_path / "d.yalm")
    synth_checkpoint(dpath, dcfg, seed=32)
    dweights = load_weights(read_yalm(dpath), dcfg)

    mesh = make_mesh(MeshConfig(dp=2, tp=2), devices=jax.devices()[:4])
    plain = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      mesh=mesh)
    want = _run(plain, _reqs(6))

    spec = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                     mesh=mesh, spec_draft=(dcfg, dweights), spec_k=3)
    assert spec.spec and spec.mesh is mesh
    got = _run(spec, _reqs(6))
    for i, (a, b) in enumerate(zip(got, want)):
        assert a == b, f"request {i}: spec-draft-mesh={a} plain-mesh={b}"
    assert spec.spec_stats["rounds"] >= 1


def test_spec_draft_scheduler_mesh_self_draft_accepts(tmp_path):
    """draft == target on the mesh: proposals must be accepted (the
    sharded draft tick and the sharded verify sweep agree numerically),
    so tokens-per-round exceeds 1."""
    cfg = fast_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=33)
    weights = load_weights(read_yalm(path), cfg)
    w2 = load_weights(read_yalm(path), cfg)

    mesh = make_mesh(MeshConfig(dp=2, tp=2), devices=jax.devices()[:4])
    spec = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                     mesh=mesh, spec_draft=(cfg, w2), spec_k=3)
    rs = [Request(prompt_tokens=[1, 5 + i, 9], max_new_tokens=12,
                  temperature=0.0, seed=i) for i in range(4)]
    for r in rs:
        spec.submit(r)
    spec.run()
    assert all(len(r.generated) == 12 for r in rs)
    st = spec.spec_stats
    assert st["accepted"] / max(st["proposed"], 1) > 0.7, st
