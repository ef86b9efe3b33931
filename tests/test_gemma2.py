"""Gemma2 features on the FAST path: sandwich norms, score/logit softcaps,
and alternating sliding-window attention (per-layer window as a traced
scalar through the fused kernels' scalar-prefetch channel). The oracle is
pinned against HF transformers in test_hf_parity; these tests pin every
fast formulation against the oracle — including ring-regime positions HF
has no equivalent for — and the REAL kernels via the Pallas interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.engine import Engine
from yalm_tpu.models.cache import KVCache
from yalm_tpu.models.fast import (FastWeights, decode_step_fast,
                                  decode_step_fast_batched, fast_supported,
                                  prefill_fast, verify_chunk_fast_batched)
from yalm_tpu.models.transformer import decode_step, prefill
from yalm_tpu.models.weights import load_weights
from yalm_tpu.ops.pallas.attention import attend_step_l
from yalm_tpu.utils.testing import synth_checkpoint

from test_fast_path import fast_config


def g2_config(**over):
    """Gemma2-shaped config at kernel-supported tiling (head_dim 128):
    sandwich norms + both softcaps + sliding layer 0 (window 16 < L=32,
    so the mask genuinely removes history)."""
    d = dict(embed_scale=16.0, has_post_norms=True, attn_softcap=50.0,
             final_softcap=30.0, sliding_window=16, layer_sliding=(1, 0),
             act_type="gelu")
    d.update(over)
    return fast_config(**d)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = g2_config()
    path = str(tmp_path_factory.mktemp("g2") / "m.yalm")
    synth_checkpoint(path, cfg, seed=33)
    return cfg, path


def test_fast_supported_and_gates(ckpt):
    cfg, _ = ckpt
    assert fast_supported(cfg)
    from yalm_tpu.parallel.fast_tp import fast_tp_supported
    from yalm_tpu.parallel.pipeline import pp_supported
    from yalm_tpu.parallel.ring import ring_supported
    assert fast_tp_supported(cfg, 2)
    # every parallel axis carries the Gemma2 features now
    assert ring_supported(cfg, 2)
    assert pp_supported(cfg, 2, 16)


def test_fast_tp_matches_oracle(ckpt):
    """Gemma2 through tensor parallelism: sharded decode (win/softcap via
    the kernels, sandwich norms on the post-psum deltas, capped gathered
    logits) tracks the oracle across the window edge."""
    from yalm_tpu.parallel.fast_tp import (make_decode_step_fast_tp,
                                           shard_fast_tp_weights)
    from yalm_tpu.parallel.mesh import MeshConfig, make_mesh
    from yalm_tpu.parallel.sharding import shard_cache

    cfg, path = ckpt
    weights = load_weights(read_yalm(path), cfg)
    mesh = make_mesh(MeshConfig(tp=2), devices=jax.devices()[:2])
    sweights = shard_fast_tp_weights(weights, cfg, mesh)
    scache = shard_cache(KVCache.init(cfg, jnp.bfloat16), cfg, mesh)
    tp_step = jax.jit(make_decode_step_fast_tp(cfg, mesh),
                      donate_argnums=(3,))
    cache_o = KVCache.init(cfg, jnp.bfloat16)

    tok = jnp.int32(5)
    for pos in range(cfg.max_seq_len + 4):
        lo, cache_o = decode_step(cfg, weights, tok, jnp.int32(pos), cache_o,
                                  compute_dtype=jnp.bfloat16)
        lt, scache = tp_step(sweights, tok, jnp.int32(pos), scache)
        lo, lt = np.asarray(lo), np.asarray(lt)
        scale = max(1.0, float(np.abs(lo).max()))
        assert float(np.abs(lo - lt).max()) / scale < 0.05, f"pos {pos}"
        assert lo[np.argmax(lt)] >= lo.max() - 0.02 * scale, f"pos {pos}"
        tok = jnp.int32(int(np.argmax(lo)))


def test_decode_fast_matches_oracle_through_ring(ckpt):
    """Token-by-token fast decode vs the oracle across the window edge —
    the AGE-based sliding mask must agree with the oracle's in BOTH the
    linear and ring+sink regimes."""
    cfg, path = ckpt
    weights = load_weights(read_yalm(path), cfg)
    fw = FastWeights.from_weights(weights, cfg)
    cache_o = KVCache.init(cfg, jnp.bfloat16)
    cache_f = KVCache.init(cfg, jnp.bfloat16)

    tok = jnp.int32(5)
    for pos in range(cfg.max_seq_len + 6):
        lo, cache_o = decode_step(cfg, weights, tok, jnp.int32(pos), cache_o,
                                  compute_dtype=jnp.bfloat16)
        lf, cache_f = decode_step_fast(cfg, fw, tok, jnp.int32(pos), cache_f)
        lo, lf = np.asarray(lo), np.asarray(lf)
        scale = max(1.0, float(np.abs(lo).max()))
        assert float(np.abs(lo - lf).max()) / scale < 0.05, f"pos {pos}"
        # final_softcap saturates synthetic logits near +-cap, so bf16 noise
        # can flip ties: require the fast argmax to be within noise of the
        # oracle's max rather than bitwise-equal ranking
        assert lo[np.argmax(lf)] >= lo.max() - 0.02 * scale, f"pos {pos}"
        tok = jnp.int32(int(np.argmax(lo)))


def test_batched_tick_matches_oracle(ckpt):
    """One batched tick at mixed per-lane positions (incl. ring regime)
    equals the oracle step per lane."""
    cfg, path = ckpt
    weights = load_weights(read_yalm(path), cfg)
    fw = FastWeights.from_weights(weights, cfg)
    B = 8
    rng = np.random.default_rng(0)
    positions = np.array([0, 3, 15, 16, 17, 31, 33, 40], np.int32)
    tokens = rng.integers(3, cfg.vocab_size, B).astype(np.int32)
    k0 = rng.standard_normal(
        (B, cfg.n_layers, cfg.max_seq_len, cfg.n_kv_heads, cfg.head_dim)
    ).astype(np.float32) * 0.3
    v0 = rng.standard_normal(k0.shape).astype(np.float32) * 0.3
    cache_b = KVCache(k=jnp.asarray(k0, jnp.bfloat16),
                      v=jnp.asarray(v0, jnp.bfloat16))

    logits_b, _ = decode_step_fast_batched(
        cfg, fw, jnp.asarray(tokens), jnp.asarray(positions), cache_b,
        jnp.ones((B,), jnp.int32))
    logits_b = np.asarray(logits_b)
    for b in range(B):
        lane = KVCache(k=jnp.asarray(k0[b], jnp.bfloat16),
                       v=jnp.asarray(v0[b], jnp.bfloat16))
        lo, _ = decode_step(cfg, weights, jnp.int32(tokens[b]),
                            jnp.int32(positions[b]), lane,
                            compute_dtype=jnp.bfloat16)
        lo = np.asarray(lo)
        assert np.argmax(lo) == np.argmax(logits_b[b]), b
        scale = max(1.0, float(np.abs(lo).max()))
        assert float(np.abs(lo - logits_b[b]).max()) / scale < 0.05, b


def test_prefill_fast_matches_oracle(ckpt):
    """Chunked fast prefill (bf16 attends, sliding masks) vs the oracle's
    all-position logits; T=24 > window=16 so sliding layers genuinely
    drop history inside the chunk."""
    cfg, path = ckpt
    weights = load_weights(read_yalm(path), cfg)
    fw = FastWeights.from_weights(weights, cfg)
    T = 24
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, T), jnp.int32)

    want, _ = prefill(cfg, weights, ids, jnp.int32(0), jnp.int32(T),
                      KVCache.init(cfg, jnp.float32), logits_mode="all",
                      compute_dtype=jnp.float32)
    got, _ = prefill_fast(cfg, fw, ids, jnp.int32(0), jnp.int32(T),
                          KVCache.init(cfg, jnp.bfloat16), logits_mode="all")
    want, got = np.asarray(want), np.asarray(got)
    assert (want.argmax(-1) == got.argmax(-1)).all()
    scale = max(1.0, float(np.abs(want).max()))
    assert float(np.abs(want - got).max()) / scale < 0.06


def test_verify_chunk_matches_prefill(ckpt):
    """Spec-mode verify sweep: logits row (b, i) == prefill's logits at
    position i (same caps/masks/post-norms)."""
    cfg, path = ckpt
    fw = FastWeights.from_weights(load_weights(read_yalm(path), cfg), cfg)
    T = 8
    rng = np.random.default_rng(9)
    ids = rng.integers(3, cfg.vocab_size, T).astype(np.int32)
    B = 2
    toks = np.zeros((B, T), np.int32)
    toks[0] = ids
    cache = KVCache.init(cfg, jnp.bfloat16, batch=B)
    logits, _ = verify_chunk_fast_batched(
        cfg, fw, jnp.asarray(toks), jnp.zeros(B, jnp.int32),
        jnp.asarray([1, 0], jnp.int32), cache)
    want, _ = prefill_fast(cfg, fw, jnp.asarray(ids), jnp.int32(0),
                           jnp.int32(T), KVCache.init(cfg, jnp.bfloat16),
                           logits_mode="all")
    np.testing.assert_allclose(np.asarray(logits)[0], np.asarray(want),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("kv_pos,kv_len,kv_sink,pos",
                         [(5, 6, 0, 5), (3, 32, 2, 40), (17, 32, 2, 33),
                          # linear regime, kv_len >> window: the kernel's
                          # fetch loop STARTS mid-buffer (block skipping)
                          (31, 32, 0, 31)])
def test_attend_step_l_softcap_sliding_interpret(kv_pos, kv_len, kv_sink, pos):
    """REAL kernel (Pallas interpreter) vs emulation with softcap + a
    sliding window NARROWER than live history — covers the in-kernel
    age-mod mask in linear and ring regimes, and the linear-regime block
    skipping (small block_s so the first live block is > 0)."""
    L, S, Hk, D, qpk = 2, 32, 2, 128, 2
    rng = np.random.default_rng(21)

    def r(shape, s=1.0):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)

    k_all = r((L, S, Hk, D), 0.5).astype(jnp.bfloat16)
    v_all = r((L, S, Hk, D), 0.5).astype(jnp.bfloat16)
    args = (r((Hk, qpk, D)), r((Hk, D)), r((Hk, D)), k_all, v_all,
            jnp.int32(1), jnp.int32(kv_pos), jnp.int32(kv_len),
            jnp.int32(kv_sink), jnp.int32(pos), jnp.int32(12))
    kw = dict(kv_sinks=2, theta=1e4, rotary_dim=D, softcap=30.0)
    oe, ke, ve = attend_step_l(*args, **kw)
    oi, ki, vi = attend_step_l(*args, **kw, interpret=True, block_s=8)
    np.testing.assert_allclose(np.asarray(oi), np.asarray(oe),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(ki, np.float32),
                                  np.asarray(ke, np.float32))
    np.testing.assert_array_equal(np.asarray(vi, np.float32),
                                  np.asarray(ve, np.float32))

    if kv_len > 12:
        # the window must MATTER: widening it changes the output
        wide = attend_step_l(*args[:-1], jnp.int32(S), **kw)[0]
        assert float(jnp.abs(wide - oe).max()) > 1e-4


def test_attend_batched_paged_sliding_interpret():
    """Batched + paged kernels through the interpreter with sliding
    windows: per-lane block skipping (linear lanes start mid-stream, ring
    lanes stream everything) against the emulation."""
    from yalm_tpu.ops.pallas.attention import (attend_step_batched_l,
                                               attend_step_paged_l)
    B, L, S, Hk, D, qpk = 2, 2, 32, 2, 128, 2
    rng = np.random.default_rng(22)

    def r(shape, s=1.0):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)

    # lane 0: linear, kv_len 32 >> win 12 (skips blocks); lane 1: ring
    kv_pos = jnp.asarray([31, 3], jnp.int32)
    kv_len = jnp.asarray([32, 32], jnp.int32)
    kv_sink = jnp.asarray([0, 2], jnp.int32)
    pos = jnp.asarray([31, 40], jnp.int32)
    write = jnp.asarray([1, 1], jnp.int32)
    win = jnp.int32(12)
    kw = dict(kv_sinks=2, theta=1e4, rotary_dim=D, softcap=30.0)

    k_all = r((B, L, S, Hk, D), 0.5).astype(jnp.bfloat16)
    v_all = r((B, L, S, Hk, D), 0.5).astype(jnp.bfloat16)
    args = (r((B, Hk, qpk, D)), r((B, Hk, D)), r((B, Hk, D)), k_all, v_all,
            jnp.int32(1), kv_pos, kv_len, kv_sink, pos, write, win)
    oe, ke, _ = attend_step_batched_l(*args, **kw)
    oi, ki, _ = attend_step_batched_l(*args, **kw, interpret=True, block_s=8)
    np.testing.assert_allclose(np.asarray(oi), np.asarray(oe),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(ki, np.float32),
                                  np.asarray(ke, np.float32))

    bs, nblk = 8, 4
    n_pages = 1 + B * nblk
    kp = r((n_pages, L, bs, Hk, D), 0.5).astype(jnp.bfloat16)
    vp = r((n_pages, L, bs, Hk, D), 0.5).astype(jnp.bfloat16)
    tables = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    pargs = (r((B, Hk, qpk, D)), r((B, Hk, D)), r((B, Hk, D)), kp, vp,
             tables, jnp.int32(1), kv_pos, kv_len, kv_sink, pos, write, win)
    pkw = dict(kv_sinks=2, theta=1e4, rotary_dim=D, window=S, softcap=30.0)
    oe, ke, _ = attend_step_paged_l(*pargs, **pkw)
    oi, ki, _ = attend_step_paged_l(*pargs, **pkw, interpret=True)
    np.testing.assert_allclose(np.asarray(oi), np.asarray(oe),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(ki, np.float32),
                                  np.asarray(ke, np.float32))


def test_engine_generates_fast_auto(ckpt):
    """Engine picks the fast path automatically and matches the oracle
    engine's greedy stream."""
    cfg, path = ckpt
    eng = Engine.from_checkpoint(path, kv_dtype=jnp.bfloat16)
    assert eng.fast
    eng_o = Engine.from_checkpoint(path, fast=False, kv_dtype=jnp.bfloat16,
                                   compute_dtype=jnp.bfloat16)
    t_f = list(eng.generate([1, 7, 42], max_steps=10, temperature=0.0, seed=0))
    t_o = list(eng_o.generate([1, 7, 42], max_steps=10, temperature=0.0, seed=0))
    agree = sum(a == b for a, b in zip(t_f, t_o))
    assert agree >= len(t_o) - 1, (t_f, t_o)


def test_paged_tick_matches_dense_batched(ckpt):
    """Gemma2 through the paged pool: a paged tick equals the dense batched
    tick when the tables lay pages out contiguously."""
    cfg, path = ckpt
    fw = FastWeights.from_weights(load_weights(read_yalm(path), cfg), cfg)
    from yalm_tpu.models.paged import PagedKVPool
    B, ps = 8, 8
    nblk = cfg.max_seq_len // ps
    pool = PagedKVPool.init(cfg, jnp.bfloat16, 1 + B * nblk, ps)
    tables = jnp.asarray(
        [[1 + b * nblk + j for j in range(nblk)] for b in range(B)],
        jnp.int32)
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, B), jnp.int32)
    positions = jnp.asarray([0, 1, 5, 15, 16, 17, 20, 30], jnp.int32)

    from yalm_tpu.models.fast import decode_step_fast_batched_paged
    lp, _ = decode_step_fast_batched_paged(
        cfg, fw, tokens, positions, pool, tables,
        jnp.ones((B,), jnp.int32), page_size=ps)
    cache = KVCache.init(cfg, jnp.bfloat16, batch=B)
    ld, _ = decode_step_fast_batched(cfg, fw, tokens, positions, cache,
                                     jnp.ones((B,), jnp.int32))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ld),
                               rtol=3e-2, atol=3e-2)


def test_oracle_mesh_shards_gemma_weights(ckpt):
    """The oracle Megatron pspecs carry the sandwich-norm (and qk-norm)
    fields, so Weights-level mesh sharding works for Gemma2/3."""
    from yalm_tpu.parallel.mesh import MeshConfig, make_mesh
    from yalm_tpu.parallel.sharding import shard_weights
    cfg, path = ckpt
    w = load_weights(read_yalm(path), cfg)
    mesh = make_mesh(MeshConfig(tp=2), devices=jax.devices()[:2])
    sw = shard_weights(w, cfg, mesh)
    assert sw.layers.pa is not None and sw.layers.pf is not None


def test_scheduler_lookup_spec_gemma2(ckpt):
    """Scheduler-level prompt-lookup speculation on a Gemma2 config: the
    verify sweep carries softcaps/sliding/sandwich norms, so spec streams
    must equal the plain scheduler's."""
    from yalm_tpu.scheduler import Request, Scheduler
    cfg, path = ckpt
    weights = load_weights(read_yalm(path), cfg)

    def run(**kw):
        s = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16, **kw)
        reqs = [s.submit(Request(prompt_tokens=[1, 5 + i, 9, 5 + i, 9],
                                 max_new_tokens=8, temperature=0.0, seed=i))
                for i in range(6)]
        s.run()
        return s, [r.generated for r in reqs]

    _, want = run()
    s2, got = run(spec_lookup=True, spec_k=3)
    assert got == want
    assert s2.spec_stats["rounds"] >= 1
