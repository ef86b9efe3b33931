"""Fast-path parity: Pallas kernels (interpret mode on CPU) vs the jnp oracle.

The reference's pattern: CPU implementations are golden, device kernels are
parity-tested elementwise against them (src/test.cpp:148-206). Here the
oracle is models/transformer.decode_step and the device path is
models/fast.decode_step_fast; kernels run through the Pallas interpreter so
the same tests gate TPU behavior from the CPU test mesh.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.models import KVCache, decode_step, load_weights
from yalm_tpu.models.fast import FastWeights, decode_step_fast, fast_supported
from yalm_tpu.ops.attention import attend_one
from yalm_tpu.ops.pallas.gemv import gemv, gemv_l, gemv_supported, pick_blocks
from yalm_tpu.ops.pallas.attention import attend_one_l, attend_step_l
from yalm_tpu.ops.core import rope_rotate_cached
from yalm_tpu.utils.testing import synth_checkpoint, tiny_config



def fast_config(**overrides):
    """Smallest config satisfying the kernels' tiling rules (head_dim 128)."""
    defaults = dict(dim=256, hidden_dim=512, head_dim=128, n_layers=2,
                    n_heads=4, n_kv_heads=2, vocab_size=512, max_seq_len=32,
                    rotary_dim=128, qkv_clip=30.0)
    defaults.update(overrides)
    return tiny_config(**defaults)


# ---------------------------------------------------------------------------
# GEMV kernels
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16, jnp.float8_e5m2])
@pytest.mark.parametrize("shape", [(16, 128), (512, 256), (24, 384)])
def test_gemv_matches_dot(dtype, shape):
    N, K = shape
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((N, K), np.float32) * 0.1, dtype)
    x = jnp.asarray(rng.standard_normal(K, np.float32))
    got = np.asarray(gemv(x, w, interpret=True))
    want = np.asarray(x) @ np.asarray(w.astype(jnp.float32)).T
    # kernel computes in bf16 -> f32 accumulate
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_gemv_l_selects_layer():
    L, N, K = 3, 32, 256
    rng = np.random.default_rng(1)
    w_all = jnp.asarray(rng.standard_normal((L, N, K), np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal(K, np.float32))
    for l in range(L):
        got = np.asarray(gemv_l(x, w_all, jnp.int32(l), interpret=True))
        want = np.asarray(x) @ np.asarray(w_all[l]).T
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_gemv_l_inside_fori_loop():
    """The intended usage: traced layer index inside a device loop."""
    L, N, K = 4, 16, 128
    rng = np.random.default_rng(2)
    w_all = jnp.asarray(rng.standard_normal((L, K, K), np.float32) * 0.05)
    x0 = jnp.asarray(rng.standard_normal(K, np.float32))

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, L, lambda i, x: gemv_l(x, w_all, i, interpret=True), x)

    got = np.asarray(run(x0))
    want = np.asarray(x0)
    for l in range(L):
        want = want @ np.asarray(w_all[l]).T
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_pick_blocks_divides():
    for n, k in [(14336, 4096), (32000, 4096), (6144, 4096), (24, 384)]:
        bn, bk = pick_blocks(n, k, 1)
        assert n % bn == 0 and k % bk == 0
        # Mosaic: output lane dim must be 128-aligned or the full dimension
        assert bn % 128 == 0 or bn == n
        assert bk % 128 == 0
    assert gemv_supported(32000, 4096)   # 32000 = 250 * 128
    assert gemv_supported(100, 4096)     # full-N block fallback
    assert not gemv_supported(32000, 100)


# ---------------------------------------------------------------------------
# Flash decode attention
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kv_len", [1, 7, 32])
@pytest.mark.parametrize("qpk", [1, 2])
def test_attend_one_l_matches_oracle(kv_len, qpk):
    L, S, Hk, D = 2, 32, 2, 128
    rng = np.random.default_rng(3)
    k_all = jnp.asarray(rng.standard_normal((L, S, Hk, D), np.float32), jnp.bfloat16)
    v_all = jnp.asarray(rng.standard_normal((L, S, Hk, D), np.float32), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((Hk, qpk, D), np.float32))
    for layer in range(L):
        got = np.asarray(attend_one_l(q, k_all, v_all, jnp.int32(layer),
                                      jnp.int32(kv_len), interpret=True))
        want = np.asarray(attend_one(q, k_all[layer], v_all[layer],
                                     jnp.arange(S) < kv_len))
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


# ---------------------------------------------------------------------------
# Fused attention step (cache write + sink rotation + flash, aliased cache)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("interpret", [None, True],
                         ids=["emulation", "pallas-interpret"])
@pytest.mark.parametrize("kv_pos,kv_len,kv_sink,pos",
                         [(5, 6, 0, 5), (3, 32, 2, 35), (0, 1, 0, 0)])
def test_attend_step_l_matches_composition(interpret, kv_pos, kv_len,
                                           kv_sink, pos):
    L, S, Hk, D, qpk = 2, 32, 2, 128, 2
    theta = 1e4
    rng = np.random.default_rng(7)
    k_all = jnp.asarray(rng.standard_normal((L, S, Hk, D), np.float32), jnp.bfloat16)
    v_all = jnp.asarray(rng.standard_normal((L, S, Hk, D), np.float32), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((Hk, qpk, D), np.float32))
    kn = jnp.asarray(rng.standard_normal((Hk, D), np.float32))
    vn = jnp.asarray(rng.standard_normal((Hk, D), np.float32))

    # reference composition: rope on q/k + dus row write + standalone
    # attention kernel over the LAZY sink view (first kv_sink rows rotated
    # forward by max(0, pos - S + 1); the cache itself keeps them as
    # written — reference semantics src/infer.cpp:303-317, applied lazily)
    from yalm_tpu.ops.core import apply_rope
    layer = 0
    q_rot = apply_rope(q.reshape(Hk * qpk, D), jnp.int32(pos), theta, D
                       ).reshape(Hk, qpk, D)
    kn_rot = apply_rope(kn, jnp.int32(pos), theta, D)
    k2 = k_all.at[layer, kv_pos].set(kn_rot.astype(k_all.dtype))
    v2 = v_all.at[layer, kv_pos].set(vn.astype(v_all.dtype))
    rows = k2[layer, 0:2].astype(jnp.float32)
    rot = rope_rotate_cached(rows, theta, D, max(0, pos - S + 1)).astype(k2.dtype)
    mask = (jnp.arange(2) < kv_sink)[:, None, None]
    k_view = k2.at[layer, 0:2].set(jnp.where(mask, rot, rows.astype(k2.dtype)))
    want = attend_one_l(q_rot, k_view, v2, jnp.int32(layer), jnp.int32(kv_len))

    got, gk, gv = attend_step_l(
        q, kn, vn, k_all, v_all, jnp.int32(layer), jnp.int32(kv_pos),
        jnp.int32(kv_len), jnp.int32(kv_sink), jnp.int32(pos),
        kv_sinks=2, theta=theta, rotary_dim=D, interpret=interpret)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)
    # the cache holds the new row but NEVER a rotated sink
    np.testing.assert_allclose(np.asarray(gk, np.float32),
                               np.asarray(k2, np.float32), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(gv, np.float32),
                               np.asarray(v2, np.float32), rtol=1e-2, atol=1e-2)


# ---------------------------------------------------------------------------
# Whole-step parity: fast path vs oracle across the ring boundary
# ---------------------------------------------------------------------------

def test_decode_step_fast_matches_oracle(tmp_path):
    cfg = fast_config()
    assert fast_supported(cfg)
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=0)
    weights = load_weights(read_yalm(path), cfg)
    fw = FastWeights.from_weights(weights, cfg)

    cache_o = KVCache.init(cfg, jnp.bfloat16)
    cache_f = KVCache.init(cfg, jnp.bfloat16)
    tok = jnp.int32(5)
    # run past max_seq_len (32) to exercise the ring buffer + sink rotation
    for pos in range(cfg.max_seq_len + 8):
        lo, cache_o = decode_step(cfg, weights, tok, jnp.int32(pos), cache_o,
                                  output_logits=True, compute_dtype=jnp.bfloat16)
        lf, cache_f = decode_step_fast(cfg, fw, tok, jnp.int32(pos), cache_f,
                                       output_logits=True)
        lo, lf = np.asarray(lo), np.asarray(lf)
        assert np.argmax(lo) == np.argmax(lf), f"argmax diverged at pos {pos}"
        scale = max(1.0, float(np.abs(lo).max()))
        assert float(np.abs(lo - lf).max()) / scale < 0.05, f"logits diverged at pos {pos}"
        tok = jnp.int32(int(np.argmax(lo)))

    # caches agree too (both bf16, same writes/rotations)
    np.testing.assert_allclose(np.asarray(cache_o.k, np.float32),
                               np.asarray(cache_f.k, np.float32), rtol=3e-2, atol=3e-2)


def test_decode_step_fast_hydrate_mode(tmp_path):
    cfg = fast_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=1)
    weights = load_weights(read_yalm(path), cfg)
    fw = FastWeights.from_weights(weights, cfg)
    cache = KVCache.init(cfg, jnp.bfloat16)
    out, cache = decode_step_fast(cfg, fw, jnp.int32(3), jnp.int32(0), cache,
                                  output_logits=False)
    assert out is None
    assert float(jnp.abs(cache.k[:, 0]).max()) > 0  # slot 0 was written


def test_fast_supported_gates():
    from yalm_tpu.models.fast import fast_batched_supported
    assert not fast_supported(tiny_config())          # head_dim 16
    assert fast_supported(fast_config(n_experts=2, n_experts_active=1))
    assert fast_supported(fast_config())
    assert fast_batched_supported(fast_config(n_experts=2, n_experts_active=1))
    assert fast_batched_supported(fast_config())


# ---------------------------------------------------------------------------
# MoE fast path
# ---------------------------------------------------------------------------

def test_gemv_le_selects_layer_and_expert():
    from yalm_tpu.ops.pallas.gemv import gemv_le
    L, E, N, K = 2, 3, 16, 128
    rng = np.random.default_rng(8)
    w_all = jnp.asarray(rng.standard_normal((L, E, N, K), np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal(K, np.float32))
    for l in range(L):
        for e in range(E):
            got = np.asarray(gemv_le(x, w_all, jnp.int32(l), jnp.int32(e),
                                     interpret=True))
            want = np.asarray(x) @ np.asarray(w_all[l, e]).T
            np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def moe_fast_config(**overrides):
    defaults = dict(n_experts=4, n_experts_active=2)
    defaults.update(overrides)
    return fast_config(**defaults)


def test_decode_step_fast_moe_matches_oracle(tmp_path):
    cfg = moe_fast_config()
    assert fast_supported(cfg)
    path = str(tmp_path / "moe.yalm")
    synth_checkpoint(path, cfg, seed=6)
    weights = load_weights(read_yalm(path), cfg)
    fw = FastWeights.from_weights(weights, cfg)
    assert fw.moegate is not None and fw.w13.ndim == 4

    cache_o = KVCache.init(cfg, jnp.bfloat16)
    cache_f = KVCache.init(cfg, jnp.bfloat16)
    tok = jnp.int32(5)
    for pos in range(16):
        lo, cache_o = decode_step(cfg, weights, tok, jnp.int32(pos), cache_o,
                                  output_logits=True, compute_dtype=jnp.bfloat16)
        lf, cache_f = decode_step_fast(cfg, fw, tok, jnp.int32(pos), cache_f,
                                       output_logits=True)
        lo, lf = np.asarray(lo), np.asarray(lf)
        assert np.argmax(lo) == np.argmax(lf), f"argmax diverged at pos {pos}"
        tok = jnp.int32(int(np.argmax(lo)))


def test_engine_fast_moe_from_checkpoint(tmp_path):
    from yalm_tpu.engine import Engine

    cfg = moe_fast_config()
    path = str(tmp_path / "moe.yalm")
    synth_checkpoint(path, cfg, seed=7)
    eng = Engine.from_checkpoint(path, fast=True, kv_dtype=jnp.bfloat16)
    assert eng.fast
    toks = list(eng.generate([1, 7, 42], max_steps=8, temperature=0.0, seed=0))
    assert len(toks) == 8


# ---------------------------------------------------------------------------
# Batched decode tick
# ---------------------------------------------------------------------------

def test_batched_decode_matches_per_lane(tmp_path):
    """decode_step_fast_batched == B independent decode_step_fast lanes."""
    from yalm_tpu.models.fast import decode_step_fast_batched

    cfg = fast_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=4)
    weights = load_weights(read_yalm(path), cfg)
    fw = FastWeights.from_weights(weights, cfg)

    B = 8
    rng = np.random.default_rng(0)
    bcache = KVCache.init(cfg, jnp.bfloat16, batch=B)
    lanes = [KVCache.init(cfg, jnp.bfloat16) for _ in range(B)]
    # different positions per lane, including past the window (ring+sinks)
    positions = np.array([0, 1, 5, 17, 31, 33, 40, 36], np.int32)
    # hydrate each lane (and the batched cache) to its position first
    for step in range(int(positions.max())):
        toks = rng.integers(3, cfg.vocab_size, B).astype(np.int32)
        live = step < positions
        pos_now = np.minimum(step, positions - 1).astype(np.int32)
        _, bcache2 = decode_step_fast_batched(cfg, fw, jnp.asarray(toks),
                                              jnp.asarray(pos_now), bcache)
        # only advance lanes that are still hydrating
        bcache = KVCache(
            k=jnp.where(live[:, None, None, None, None], bcache2.k, bcache.k),
            v=jnp.where(live[:, None, None, None, None], bcache2.v, bcache.v))
        for b in range(B):
            if live[b]:
                _, lanes[b] = decode_step_fast(cfg, fw, jnp.int32(toks[b]),
                                               jnp.int32(step), lanes[b],
                                               output_logits=False)

    toks = rng.integers(3, cfg.vocab_size, B).astype(np.int32)
    blogits, bcache = decode_step_fast_batched(
        cfg, fw, jnp.asarray(toks), jnp.asarray(positions), bcache)
    for b in range(B):
        lf, lanes[b] = decode_step_fast(cfg, fw, jnp.int32(toks[b]),
                                        jnp.int32(positions[b]), lanes[b])
        np.testing.assert_allclose(np.asarray(blogits[b]), np.asarray(lf),
                                   rtol=2e-2, atol=2e-2)


def test_batched_moe_matches_per_lane(tmp_path):
    """Batched MoE tick (all-experts stream, per-lane gate masks) == B
    independent single-lane MoE fast steps."""
    from yalm_tpu.models.fast import decode_step_fast_batched

    cfg = fast_config(n_experts=4, n_experts_active=2)
    path = str(tmp_path / "moe.yalm")
    synth_checkpoint(path, cfg, seed=12)
    weights = load_weights(read_yalm(path), cfg)
    fw = FastWeights.from_weights(weights, cfg)

    B = 8
    rng = np.random.default_rng(1)
    bcache = KVCache.init(cfg, jnp.bfloat16, batch=B)
    lanes = [KVCache.init(cfg, jnp.bfloat16) for _ in range(B)]
    # mixed per-lane positions, including past the window (ring + sinks)
    positions = np.array([0, 1, 7, 15, 31, 33, 40, 36], np.int32)
    for step in range(int(positions.max())):
        toks = rng.integers(3, cfg.vocab_size, B).astype(np.int32)
        live = step < positions
        pos_now = np.minimum(step, positions - 1).astype(np.int32)
        _, bcache2 = decode_step_fast_batched(cfg, fw, jnp.asarray(toks),
                                              jnp.asarray(pos_now), bcache)
        bcache = KVCache(
            k=jnp.where(live[:, None, None, None, None], bcache2.k, bcache.k),
            v=jnp.where(live[:, None, None, None, None], bcache2.v, bcache.v))
        for b in range(B):
            if live[b]:
                _, lanes[b] = decode_step_fast(cfg, fw, jnp.int32(toks[b]),
                                               jnp.int32(step), lanes[b],
                                               output_logits=False)
    toks = rng.integers(3, cfg.vocab_size, B).astype(np.int32)
    blogits, bcache = decode_step_fast_batched(
        cfg, fw, jnp.asarray(toks), jnp.asarray(positions), bcache)
    for b in range(B):
        lf, lanes[b] = decode_step_fast(cfg, fw, jnp.int32(toks[b]),
                                        jnp.int32(positions[b]), lanes[b])
        np.testing.assert_allclose(np.asarray(blogits[b]), np.asarray(lf),
                                   rtol=2e-2, atol=2e-2)


def test_scheduler_fast_matches_oracle_scheduler(tmp_path):
    from yalm_tpu.scheduler import Request, Scheduler

    cfg = fast_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=5)
    weights = load_weights(read_yalm(path), cfg)

    def run(fast):
        sched = Scheduler(cfg, weights, batch=8, kv_dtype=jnp.bfloat16,
                          compute_dtype=jnp.bfloat16, fast=fast)
        assert sched.fast == fast
        reqs = [Request(prompt_tokens=[1, 5 + i, 9], max_new_tokens=6,
                        temperature=0.0) for i in range(4)]
        for r in reqs:
            sched.submit(r)
        sched.run()
        return [r.generated for r in reqs]

    fast_out = run(True)
    oracle_out = run(False)
    assert all(len(g) == 6 for g in fast_out)
    # greedy decode: token streams agree modulo rare bf16 logit near-ties
    agree = sum(a == b for f, o in zip(fast_out, oracle_out)
                for a, b in zip(f, o))
    assert agree >= 4 * 6 - 2, (fast_out, oracle_out)


# ---------------------------------------------------------------------------
# Engine integration
# ---------------------------------------------------------------------------

def test_engine_fast_matches_oracle_engine(tmp_path):
    from yalm_tpu.engine import Engine

    cfg = fast_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=2)

    eng_f = Engine.from_checkpoint(path, fast=True, kv_dtype=jnp.bfloat16)
    assert eng_f.fast and isinstance(eng_f.weights, FastWeights)
    eng_o = Engine.from_checkpoint(path, fast=False, kv_dtype=jnp.bfloat16,
                                   compute_dtype=jnp.bfloat16)
    assert not eng_o.fast

    prompt = [1, 7, 42, 9]
    toks_f = list(eng_f.generate(prompt, max_steps=12, temperature=0.0, seed=0))
    toks_o = list(eng_o.generate(prompt, max_steps=12, temperature=0.0, seed=0))
    # greedy decode: identical token streams modulo rare logit near-ties
    agree = sum(a == b for a, b in zip(toks_f, toks_o))
    assert agree >= len(toks_f) - 1, (toks_f, toks_o)


def test_engine_fast_perplexity(tmp_path):
    from yalm_tpu.engine import Engine

    cfg = fast_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=3)
    toks = list(np.random.default_rng(0).integers(3, cfg.vocab_size, 50))

    eng_f = Engine.from_checkpoint(path, fast=True, kv_dtype=jnp.bfloat16)
    ppl_f, _, n_f = eng_f.perplexity(toks)
    eng_o = Engine.from_checkpoint(path, fast=False, kv_dtype=jnp.bfloat16,
                                   compute_dtype=jnp.bfloat16)
    ppl_o, _, n_o = eng_o.perplexity(toks)
    assert n_f == n_o == len(toks) - 1
    assert abs(ppl_f - ppl_o) / ppl_o < 0.02, (ppl_f, ppl_o)


def test_prefill_attend_len_parity(tmp_path):
    """Prefix-bounded prefill (static attend_len) matches the full-window
    prefill exactly: early chunks only ever attend live history."""
    import numpy as np
    from yalm_tpu.codec.format import read_yalm
    from yalm_tpu.models import load_weights
    from yalm_tpu.models.cache import KVCache
    from yalm_tpu.models.fast import FastWeights, prefill_fast
    from yalm_tpu.utils.testing import synth_checkpoint

    cfg = fast_config(max_seq_len=512)
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=81)
    fw = FastWeights.from_weights(load_weights(read_yalm(path), cfg), cfg)

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(3, cfg.vocab_size, 16), jnp.int32)
    for pos0, al in [(0, 16), (0, 256), (100, 128), (300, 512)]:
        ca = KVCache.init(cfg, jnp.bfloat16)
        cb = KVCache.init(cfg, jnp.bfloat16)
        la, ca = prefill_fast(cfg, fw, toks, jnp.int32(pos0), jnp.int32(16),
                              ca, logits_mode="all")
        lb, cb = prefill_fast(cfg, fw, toks, jnp.int32(pos0), jnp.int32(16),
                              cb, logits_mode="all", attend_len=al)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        np.testing.assert_array_equal(np.asarray(ca.k, np.float32),
                                      np.asarray(cb.k, np.float32))


def test_engine_long_prompt_uses_buckets(tmp_path):
    """Engine streams are unchanged by the bucketed attend_len plumbing
    (window-scale prompt crosses several pow2 buckets)."""
    import numpy as np
    from yalm_tpu.engine import Engine, attend_bucket
    from yalm_tpu.utils.testing import synth_checkpoint

    assert attend_bucket(1, 4096) == 256
    assert attend_bucket(257, 4096) == 512
    assert attend_bucket(5000, 4096) == 4096

    cfg = fast_config(max_seq_len=1024)
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=82)
    rng = np.random.default_rng(1)
    prompt = [1] + list(rng.integers(3, cfg.vocab_size, 700))

    fast = Engine.from_checkpoint(path, fast=True)
    got = list(fast.generate(prompt, max_steps=4, temperature=0.0))
    oracle = Engine.from_checkpoint(path, fast=False,
                                    kv_dtype=jnp.bfloat16,
                                    compute_dtype=jnp.bfloat16)
    want = list(oracle.generate(prompt, max_steps=4, temperature=0.0))
    assert got == want
