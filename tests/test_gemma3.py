"""Gemma3 on the fast paths: per-layer DUAL rope (local theta on sliding
layers — a traced selector over two statically-built freq tables), plus
the Gemma2 machinery (sandwich norms, sliding masks) without softcaps.
HF logit parity lives in test_hf_parity; here every fast formulation is
pinned against the oracle (incl. ring-regime positions) and the real
kernels via the Pallas interpreter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.models.cache import KVCache
from yalm_tpu.models.fast import (FastWeights, decode_step_fast,
                                  decode_step_fast_batched, fast_supported,
                                  prefill_fast)
from yalm_tpu.models.transformer import decode_step, prefill
from yalm_tpu.models.weights import load_weights
from yalm_tpu.ops.pallas.attention import attend_step_l
from yalm_tpu.utils.testing import synth_checkpoint

from test_fast_path import fast_config


def g3_config(**over):
    """Gemma3-shaped: dual rope (global theta 1e6 w/ linear factor 2,
    local theta 1e4 on sliding layers), sandwich norms, qk-norm, sliding
    window 16 < L=32, no softcaps."""
    d = dict(embed_scale=16.0, has_post_norms=True, has_qk_norm=True,
             sliding_window=16, layer_sliding=(1, 0), act_type="gelu",
             rope_theta=1e6, rope_scale=("gemma3", 2.0, 1e4))
    d.update(over)
    return fast_config(**d)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = g3_config()
    path = str(tmp_path_factory.mktemp("g3") / "m.yalm")
    synth_checkpoint(path, cfg, seed=44)
    return cfg, path


def test_decode_fast_matches_oracle_through_ring(ckpt):
    cfg, path = ckpt
    assert fast_supported(cfg)
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
        assert lo[np.argmax(lf)] >= lo.max() - 0.02 * scale, f"pos {pos}"
        tok = jnp.int32(int(np.argmax(lo)))


def test_prefill_and_batched_match_oracle(ckpt):
    cfg, path = ckpt
    weights = load_weights(read_yalm(path), cfg)
    fw = FastWeights.from_weights(weights, cfg)
    T = 24
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, T), jnp.int32)
    want, _ = prefill(cfg, weights, ids, jnp.int32(0), jnp.int32(T),
                      KVCache.init(cfg, jnp.float32), logits_mode="all",
                      compute_dtype=jnp.float32)
    got, _ = prefill_fast(cfg, fw, ids, jnp.int32(0), jnp.int32(T),
                          KVCache.init(cfg, jnp.bfloat16), logits_mode="all")
    want, got = np.asarray(want), np.asarray(got)
    scale = max(1.0, float(np.abs(want).max()))
    assert float(np.abs(want - got).max()) / scale < 0.06

    B = 8
    positions = np.array([0, 3, 15, 16, 17, 31, 33, 40], np.int32)
    tokens = rng.integers(3, cfg.vocab_size, B).astype(np.int32)
    cache_b = KVCache.init(cfg, jnp.bfloat16, batch=B)
    logits_b, _ = decode_step_fast_batched(
        cfg, fw, jnp.asarray(tokens), jnp.asarray(positions), cache_b,
        jnp.ones((B,), jnp.int32))
    logits_b = np.asarray(logits_b)
    for b in range(B):
        lo, _ = decode_step(cfg, weights, jnp.int32(tokens[b]),
                            jnp.int32(positions[b]),
                            KVCache.init(cfg, jnp.bfloat16),
                            compute_dtype=jnp.bfloat16)
        lo = np.asarray(lo)
        scale = max(1.0, float(np.abs(lo).max()))
        assert float(np.abs(lo - logits_b[b]).max()) / scale < 0.05, b


def test_attend_step_l_dual_rope_interpret():
    """REAL kernel (interpreter) vs emulation with the gemma3 packed rope:
    the alt scalar must steer the in-kernel rotation (q/k AND the lazy
    sink view) to the local table — and flipping it must matter."""
    L, S, Hk, D, qpk = 2, 32, 2, 128, 2
    theta = ("gemma3", 1e6, 2.0, 1e4)
    rng = np.random.default_rng(31)

    def r(shape, s=1.0):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)

    k_all = r((L, S, Hk, D), 0.5).astype(jnp.bfloat16)
    v_all = r((L, S, Hk, D), 0.5).astype(jnp.bfloat16)
    args = (r((Hk, qpk, D)), r((Hk, D)), r((Hk, D)), k_all, v_all,
            jnp.int32(1), jnp.int32(3), jnp.int32(32), jnp.int32(2),
            jnp.int32(40), None)
    kw = dict(kv_sinks=2, theta=theta, rotary_dim=D)
    for alt in (jnp.int32(0), jnp.int32(1)):
        oe, ke, ve = attend_step_l(*args, alt, **kw)
        oi, ki, vi = attend_step_l(*args, alt, **kw, interpret=True)
        np.testing.assert_allclose(np.asarray(oi), np.asarray(oe),
                                   rtol=5e-2, atol=5e-2)
        np.testing.assert_array_equal(np.asarray(ki, np.float32),
                                      np.asarray(ke, np.float32))
    o0 = attend_step_l(*args, jnp.int32(0), **kw)[0]
    o1 = attend_step_l(*args, jnp.int32(1), **kw)[0]
    assert float(jnp.abs(o1 - o0).max()) > 1e-3  # the selector matters


def test_fast_tp_matches_oracle(ckpt):
    from yalm_tpu.parallel.fast_tp import (fast_tp_supported,
                                           make_decode_step_fast_tp,
                                           shard_fast_tp_weights)
    from yalm_tpu.parallel.mesh import MeshConfig, make_mesh
    from yalm_tpu.parallel.sharding import shard_cache

    cfg, path = ckpt
    assert fast_tp_supported(cfg, 2)
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
        tok = jnp.int32(int(np.argmax(lo)))
