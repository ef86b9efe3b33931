"""Paged KV cache: page-table attention, page-capped admission, occupancy.

The invariant: a paged scheduler (cache = shared page pool + per-lane block
tables, models/paged.py) produces EXACTLY the same token streams as the
dense-cache scheduler, while its HBM footprint scales with tokens in flight
— including under pool pressure, where admission waits for completions to
release pages instead of deadlocking.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.models import load_weights
from yalm_tpu.models.paged import PageAllocator
from yalm_tpu.scheduler import Request, Scheduler
from yalm_tpu.utils.testing import synth_checkpoint

from test_fast_path import fast_config


PAGE = 16  # window 32 -> 2 blocks per lane


def _weights(tmp_path, seed=41, **over):
    cfg = fast_config(**over)
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=seed)
    return cfg, load_weights(read_yalm(path), cfg)


def _reqs(n, max_new=6, seed0=0):
    return [Request(prompt_tokens=[1, 5 + i, 9], max_new_tokens=max_new,
                    temperature=0.0, seed=seed0 + i) for i in range(n)]


def _run(sched, reqs):
    for r in reqs:
        sched.submit(r)
    sched.run()
    return [r.generated for r in reqs]


def test_allocator_reserve_release():
    cfg = fast_config()
    al = PageAllocator(cfg, n_pages=9, batch=4, page_size=PAGE)
    assert al.n_free == 8  # page 0 reserved
    al.grow(0, 17)         # 2 pages
    al.grow(1, 16)         # 1 page
    assert al.n_free == 5
    assert al.tables[0, 0] != 0 and al.tables[0, 1] != 0
    assert al.tables[1, 1] == 0
    assert not al.can_grow(2, 100 * PAGE)
    al.release(0)
    assert al.n_free == 7
    with pytest.raises(ValueError):
        PageAllocator(cfg, 4, 2, page_size=7)  # doesn't divide window


def test_paged_matches_dense_scheduler(tmp_path):
    cfg, weights = _weights(tmp_path)
    dense = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16)
    want = _run(dense, _reqs(10))

    paged = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      paged_pages=1 + 8 * (cfg.max_seq_len // PAGE),
                      page_size=PAGE)
    assert paged.paged
    got = _run(paged, _reqs(10))
    assert got == want


def test_paged_pool_pressure_completes_in_waves(tmp_path):
    """Pool sized for ~3 concurrent lanes with 8 slots: requests queue until
    releases free pages, and every stream still matches the dense run."""
    cfg, weights = _weights(tmp_path)
    dense = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16)
    want = _run(dense, _reqs(8))

    # each request reserves ONE page (prompt 3 + max_new 6 + 1 <= 16);
    # a pool of 3 usable pages throttles 8 requests into waves
    paged = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      paged_pages=4, page_size=PAGE)
    reqs = _reqs(8)
    for r in reqs:
        paged.submit(r)
    paged.step()
    assert paged.alloc.n_free == 0
    assert len(paged.queue) == 5
    paged.run()
    assert [r.generated for r in reqs] == want
    # everything released at the end
    assert paged.alloc.n_free == 3


def test_paged_lazy_growth_concurrent_occupancy(tmp_path):
    """Lazy allocation admits lanes whose WORST-CASE footprint exceeds the
    pool: two requests with a 2-page worst case (prompt 3 + max_new 20 + 1)
    run CONCURRENTLY in a 3-usable-page pool (worst-case reservation would
    have serialized them: 4 > 3). When lane B's block-boundary growth finds
    the pool dry, the newest lane is preempted and resumed exactly — final
    streams still match the dense scheduler token for token."""
    cfg, weights = _weights(tmp_path)
    assert cfg.max_seq_len == 2 * PAGE  # 2 blocks per lane
    reqs_d = _reqs(2, max_new=20)
    dense = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16)
    want = _run(dense, reqs_d)

    paged = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      paged_pages=4, page_size=PAGE)
    reqs = _reqs(2, max_new=20)
    for r in reqs:
        paged.submit(r)
    paged.step()
    # both admitted concurrently despite 2+2 worst-case pages > 3 usable
    assert paged.n_active == 2
    saw_preempt = False
    for _ in range(200):
        if not paged.queue and paged.n_active == 0:
            break
        before = {id(s.request) for s in paged.slots if s.request}
        paged.step()
        if any(r._resume is not None for r in reqs) or \
                any(r in paged.queue for r in reqs):
            saw_preempt = True
    assert [r.generated for r in reqs] == want
    assert saw_preempt  # the pool really was too small without preemption
    assert paged.alloc.n_free == 3


def test_paged_request_larger_than_pool_fails_cleanly(tmp_path):
    """A request whose worst case exceeds the WHOLE pool can never finish;
    it must fail with an error instead of livelocking on self-preemption."""
    cfg, weights = _weights(tmp_path)
    paged = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                      paged_pages=2, page_size=PAGE)  # 1 usable page
    bad = Request(prompt_tokens=[1] * 3, max_new_tokens=20, temperature=0.0)
    ok = Request(prompt_tokens=[1, 5, 9], max_new_tokens=6, temperature=0.0)
    paged.submit(bad)
    paged.submit(ok)
    paged.run()
    assert bad.done and bad.error and "pages" in bad.error
    assert ok.done and ok.error is None and len(ok.generated) == 6


def test_paged_ring_regime_long_prompt(tmp_path):
    """A beyond-window prompt drives the paged lane through ring+sink
    hydration (masked-tick path) and still matches the dense scheduler."""
    cfg, weights = _weights(tmp_path)
    W = cfg.max_seq_len
    long_prompt = [1] + [5] * (W + 9)

    def run_one(**kw):
        s = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16, **kw)
        r = Request(prompt_tokens=long_prompt, max_new_tokens=5,
                    temperature=0.0, seed=3)
        s.submit(r)
        s.run()
        return r.generated

    want = run_one()
    got = run_one(paged_pages=1 + 8 * (W // PAGE), page_size=PAGE)
    assert got == want


def test_paged_rejects_bad_configs(tmp_path):
    cfg, weights = _weights(tmp_path)
    with pytest.raises(ValueError):
        Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                  paged_pages=8, page_size=7)


def test_paged_moe_matches_dense(tmp_path):
    """paged x MoE (round-5 closure): the paged tick/prefill route each
    row through the all-expert batched FFN — streams match the dense MoE
    scheduler exactly (page tables are orthogonal to expert routing)."""
    mcfg, mweights = _weights(tmp_path, seed=42, n_experts=2,
                              n_experts_active=1)

    def run(**kw):
        sched = Scheduler(mcfg, mweights, batch=8, kv_dtype=jnp.bfloat16,
                          **kw)
        rs = _reqs(6, max_new=8)
        for r in rs:
            sched.submit(r)
        sched.run()
        return [r.generated for r in rs]

    dense = run()
    W = mcfg.max_seq_len
    paged = run(paged_pages=1 + 8 * (W // PAGE), page_size=PAGE)
    assert dense == paged


def test_paged_moe_pool_pressure(tmp_path):
    """paged x MoE under pool pressure: lazy growth + preemption complete
    every MoE stream identically to the dense run."""
    mcfg, mweights = _weights(tmp_path, seed=43, n_experts=2,
                              n_experts_active=1)

    def mk():
        return _reqs(6, max_new=16, seed0=3)

    dense = Scheduler(mcfg, mweights, batch=8, kv_dtype=jnp.bfloat16)
    want = []
    for r in mk():
        dense.submit(r)
        want.append(r)
    dense.run()

    sched = Scheduler(mcfg, mweights, batch=8, kv_dtype=jnp.bfloat16,
                      paged_pages=7, page_size=8)
    reqs = mk()
    for r in reqs:
        sched.submit(r)
    sched.run()
    for i, (r, b) in enumerate(zip(reqs, want)):
        assert r.generated == b.generated, f"request {i}"


def test_paged_kernel_interpret_parity():
    """The REAL paged kernel (Pallas interpreter) vs the jnp emulation:
    page-table DMA targets, masked writes, sink rotation."""
    import jax
    from yalm_tpu.ops.pallas.attention import attend_step_paged_l

    B, L, bs, Hk, D, qpk = 2, 3, 8, 2, 128, 2
    nblk, window = 2, 16
    n_pages = 1 + B * nblk
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((B, Hk, qpk, D)).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal((B, Hk, D)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((B, Hk, D)).astype(np.float32))
    kp = jnp.asarray((rng.standard_normal((n_pages, L, bs, Hk, D)) * 0.3)
                     .astype(np.float32)).astype(jnp.bfloat16)
    vp = jnp.asarray((rng.standard_normal((n_pages, L, bs, Hk, D)) * 0.3)
                     .astype(np.float32)).astype(jnp.bfloat16)
    tables = jnp.asarray([[1, 2], [3, 4]], jnp.int32)

    for scal in [
        dict(kv_pos=[0, 5], kv_len=[1, 6], kv_sink=[0, 0], pos=[0, 5],
             write=[1, 1]),
        dict(kv_pos=[9, 2], kv_len=[10, 16], kv_sink=[0, 2], pos=[9, 21],
             write=[1, 0]),
    ]:
        args = (q, kn, vn, kp, vp, tables, jnp.int32(1),
                jnp.asarray(scal["kv_pos"], jnp.int32),
                jnp.asarray(scal["kv_len"], jnp.int32),
                jnp.asarray(scal["kv_sink"], jnp.int32),
                jnp.asarray(scal["pos"], jnp.int32),
                jnp.asarray(scal["write"], jnp.int32))
        kw = dict(kv_sinks=2, theta=1e4, rotary_dim=128, window=window)
        oe, ke, ve = attend_step_paged_l(*args, **kw)
        oi, ki, vi = attend_step_paged_l(*args, **kw, interpret=True)
        np.testing.assert_allclose(np.asarray(oi), np.asarray(oe),
                                   rtol=3e-2, atol=3e-2)
        np.testing.assert_allclose(np.asarray(ki, np.float32),
                                   np.asarray(ke, np.float32),
                                   rtol=1e-2, atol=1e-2)
        np.testing.assert_allclose(np.asarray(vi, np.float32),
                                   np.asarray(ve, np.float32),
                                   rtol=1e-2, atol=1e-2)


def test_server_paged(tmp_path):
    """End-to-end HTTP serving over the PAGED scheduler."""
    import json
    import threading
    import urllib.request
    from yalm_tpu.convert import convert
    from yalm_tpu.server import ServingEngine, serve
    from yalm_tpu.utils.testing import synth_hf_dir

    cfg = fast_config()
    hf = str(tmp_path / "hf")
    synth_hf_dir(hf, cfg, seed=51)
    p = str(tmp_path / "m.yalm")
    convert(hf, p, "fp8")
    engine = ServingEngine.from_checkpoint(p, batch=8,
                                           paged_pages=1 + 8 * 2,
                                           page_size=PAGE)
    assert engine.sched.paged
    httpd = serve(engine, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt": "hello", "max_tokens": 5,
                             "temperature": 0.0}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["usage"]["completion_tokens"] >= 1
    finally:
        httpd.shutdown()
        engine.close()


# ---------------------------------------------------- automatic prefix cache
def _pf_sched(cfg, weights, pages, B=8):
    return Scheduler(cfg, weights, batch=B, kv_dtype=jnp.bfloat16,
                     paged_pages=pages, page_size=PAGE)


def test_prefix_cache_reuses_pages_bitexact(tmp_path):
    """A second identical prompt maps the first's pages read-only: its
    prefill skips the cached full pages, and the stream is BIT-IDENTICAL
    (the pages hold exactly the rows the lane would have written)."""
    cfg, weights = _weights(tmp_path, seed=121, max_seq_len=64)
    nblk = cfg.max_seq_len // PAGE
    prompt = ([1] + [5, 9, 11] * 13)[: 2 * PAGE + 8]  # 2 full pages + tail
    sched = _pf_sched(cfg, weights, 1 + 8 * nblk)

    r1 = sched.submit(Request(prompt_tokens=prompt, max_new_tokens=6,
                              temperature=0.0, seed=3))
    sched.run()
    st = sched.alloc.prefix_stats
    assert st["registered"] >= 2 and st["hits"] == 0

    r2 = sched.submit(Request(prompt_tokens=prompt, max_new_tokens=6,
                              temperature=0.0, seed=3))
    sched.run()
    assert r2.generated == r1.generated
    st = sched.alloc.prefix_stats
    assert st["hits"] == 1 and st["hit_tokens"] >= 2 * PAGE

    # shared-prefix, different tails: the common pages serve both
    tail_a = prompt + [7, 7, 7]
    tail_b = prompt + [9, 2]
    ra = sched.submit(Request(prompt_tokens=tail_a, max_new_tokens=4,
                              temperature=0.0, seed=0))
    rb = sched.submit(Request(prompt_tokens=tail_b, max_new_tokens=4,
                              temperature=0.0, seed=0))
    sched.run()
    assert sched.alloc.prefix_stats["hits"] == 3
    # baseline without any cache: fresh scheduler
    base = _pf_sched(cfg, weights, 1 + 8 * nblk)
    ba = base.submit(Request(prompt_tokens=tail_a, max_new_tokens=4,
                             temperature=0.0, seed=0))
    bb = base.submit(Request(prompt_tokens=tail_b, max_new_tokens=4,
                             temperature=0.0, seed=0))
    base.run()
    assert ra.generated == ba.generated
    assert rb.generated == bb.generated


def test_prefix_cache_eviction_under_pressure(tmp_path):
    """Unreferenced cached pages are evicted (LRU) before preempting or
    stalling anyone; pool accounting stays exact."""
    cfg, weights = _weights(tmp_path, seed=122, max_seq_len=64)
    total = 1 + 4                      # 4 usable pages; lanes need 2 each
    sched = _pf_sched(cfg, weights, total, B=8)
    rng = np.random.default_rng(0)
    for i in range(4):                 # distinct prompts > 1 page each
        p = [1] + list(rng.integers(3, cfg.vocab_size, PAGE + 3))
        sched.submit(Request(prompt_tokens=p, max_new_tokens=4,
                             temperature=0.0, seed=i))
        sched.run()
    st = sched.alloc.prefix_stats
    assert st["evicted"] >= 1, st
    # nothing leaks: all pages back in free + cache, refs all zero
    assert sched.alloc.n_free == total - 1
    assert all(r == 0 for r in sched.alloc.ref.values())


def test_prefix_cache_ring_regime_opt_out(tmp_path):
    """Requests that can enter the ring regime (which rewrites early pages)
    neither map nor publish shared pages — and still stream correctly."""
    cfg, weights = _weights(tmp_path, seed=123, max_seq_len=64)
    nblk = cfg.max_seq_len // PAGE
    sched = _pf_sched(cfg, weights, 1 + 8 * nblk)
    prompt = [1] + [5, 9] * PAGE       # 2+ pages
    # max_new pushes past the window -> ring regime possible
    big = cfg.max_seq_len
    r = sched.submit(Request(prompt_tokens=prompt, max_new_tokens=big,
                             temperature=0.0, seed=1))
    sched.run()
    assert len(r.generated) == big
    assert sched.alloc.prefix_stats["registered"] == 0
    assert sched.alloc.prefix_stats["hits"] == 0


def test_prefix_cache_admission_rollback_when_match_consumes_evictables(
        tmp_path):
    """can_grow's precheck may count evictable cached pages that the prefix
    match itself re-references; admission must then UN-ADMIT cleanly (back
    to the queue) instead of raising mid-admission — and the request must
    still complete once pages free up."""
    cfg, weights = _weights(tmp_path, seed=124, max_seq_len=64)
    sched = _pf_sched(cfg, weights, 1 + 3, B=8)      # 3 usable pages
    p1 = [1] + [5, 9] * 9                            # 19 toks: 2 pages
    r1 = sched.submit(Request(prompt_tokens=p1, max_new_tokens=3,
                              temperature=0.0, seed=0))
    sched.run()
    # state: 1 full page cached (ref 0, evictable), rest free
    assert len(sched.alloc.lru) == 1 and len(sched.alloc.free) == 2

    p3 = [1] + [7, 11] * 9                           # different prefix
    r3 = sched.submit(Request(prompt_tokens=p3, max_new_tokens=20,
                              temperature=0.0, seed=1))  # 3 pages worst case
    for _ in range(10):                              # admit p3 (2 pages)
        sched.step()
        if sched.n_active == 1 and not any(s.admitting for s in sched.slots):
            break
    assert not sched.queue and sched.n_active == 1
    assert len(sched.alloc.free) == 0                # both free pages taken

    r1b = sched.submit(Request(prompt_tokens=p1, max_new_tokens=3,
                               temperature=0.0, seed=0))
    sched.step()   # match maps the lru page, grow can't get a tail page ->
    sched.step()   # clean rollback to the queue, NOT a RuntimeError
    assert not r1b.done and not r1b.error
    sched.run()    # p3 finishes, pages free, r1b completes
    assert r1b.generated == r1.generated
    assert all(r == 0 for r in sched.alloc.ref.values())
