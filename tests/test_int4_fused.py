"""Parity tests for the FUSED packed-int4 kernels (round-5 SoL work):
ffn4_l (norm + w13 + GLU + w2 + residual) and attn_block4_l (norm + wqkv +
attention + wo + residual), which give int4 the same 2-launches-per-layer
fusion level as the fp8/int8 path at half the weight bytes.

The jnp emulation (rmsnorm + _gemm4_ref composition) is the numerics
contract; interpret=True runs the REAL kernels — manual double-buffered
DMA, per-group dequant dots, scale slabs — through the Pallas interpreter.
Mirrors the reference's CPU-vs-CUDA kernel parity strategy
(src/test.cpp:148-206).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.ops.pallas.block import attn_block4_l, attn_block4_supported
from yalm_tpu.ops.pallas.ffn import ffn4_l, ffn4_supported
from yalm_tpu.ops.pallas.gemv import int4_group, pack_int4


def _pack(rng, L, n, k, scale=0.1):
    w = rng.standard_normal((L, n, k)).astype(np.float32) * scale
    packed, scales = pack_int4(w)
    return jnp.asarray(packed), jnp.asarray(scales)


# --------------------------------------------------------------------- ffn4
def _ffn_args(seed, *, L=3, dim=1024, hidden=1536):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(dim).astype(np.float32)) * 0.5
    norm_w = jnp.asarray(rng.standard_normal((L, dim)).astype(np.float32)
                         * 0.1 + 1.0)
    w13, s13 = _pack(rng, L, 2 * hidden, dim)
    w2, s2 = _pack(rng, L, dim, hidden)
    return x, norm_w, w13, w2, s13, s2


@pytest.mark.parametrize("act", ["silu", "gelu"])
@pytest.mark.parametrize("layer", [0, 2])
def test_ffn4_interpret_matches_emulation(act, layer):
    assert ffn4_supported(1024, 1536, 1024)
    # dim 1024 -> G13 = 2 groups; hidden 1536 -> G2 = 3 (multi-group both)
    x, norm_w, w13, w2, s13, s2 = _ffn_args(3)
    li = jnp.int32(layer)
    out_e = ffn4_l(x, norm_w, w13, w2, li, s13, s2,
                   norm_eps=1e-5, act=act)
    out_i = ffn4_l(x, norm_w, w13, w2, li, s13, s2,
                   norm_eps=1e-5, act=act, interpret=True)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(out_e),
                               rtol=3e-2, atol=3e-2)


def test_ffn4_batched_rows_and_no_residual():
    x, norm_w, w13, w2, s13, s2 = _ffn_args(5)
    xb = jnp.stack([x, x * 0.3, -x, x + 0.1])            # (4, dim)
    for add_res in (True, False):
        out_e = ffn4_l(xb, norm_w, w13, w2, jnp.int32(1), s13, s2,
                       norm_eps=1e-5, act="silu", add_residual=add_res)
        out_i = ffn4_l(xb, norm_w, w13, w2, jnp.int32(1), s13, s2,
                       norm_eps=1e-5, act="silu", add_residual=add_res,
                       interpret=True)
        assert out_e.shape == (4, 1024)
        np.testing.assert_allclose(np.asarray(out_i), np.asarray(out_e),
                                   rtol=3e-2, atol=3e-2)
    # residual actually differs from the bare product
    with_r = ffn4_l(xb, norm_w, w13, w2, jnp.int32(1), s13, s2,
                    norm_eps=1e-5, act="silu", add_residual=True)
    no_r = ffn4_l(xb, norm_w, w13, w2, jnp.int32(1), s13, s2,
                  norm_eps=1e-5, act="silu", add_residual=False)
    np.testing.assert_allclose(np.asarray(with_r), np.asarray(no_r + xb),
                               rtol=1e-5, atol=1e-5)


def test_ffn4_matches_dequantized_ffn():
    # composed against the plain fused ffn_l on DEQUANTIZED weights: the
    # int4 path's only approximation is the 4-bit quantization itself
    from yalm_tpu.ops.pallas.ffn import ffn_l
    from yalm_tpu.ops.pallas.gemv import unpack_int4
    x, norm_w, w13, w2, s13, s2 = _ffn_args(7)
    deq13 = jnp.asarray(unpack_int4(np.asarray(w13), np.asarray(s13)))
    deq2 = jnp.asarray(unpack_int4(np.asarray(w2), np.asarray(s2)))
    a = ffn4_l(x, norm_w, w13, w2, jnp.int32(0), s13, s2,
               norm_eps=1e-5, act="silu")
    b = ffn_l(x, norm_w, deq13, deq2, jnp.int32(0),
              norm_eps=1e-5, act="silu")
    # loose: the two paths round differently (bf16-cast dequant weights vs
    # exact int nibbles + f32 group-scale partials) and the GLU amplifies
    # it; a scale/layout wiring bug would be off by x7+, not 1%
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-1, atol=5e-1)


# -------------------------------------------------------------- attn block4
def _blk_args(seed, *, L=3, S=16, Hk=2, qpk=2, dim=256, bias=False,
              cache_dtype=jnp.bfloat16):
    D = 128
    Hq = Hk * qpk
    q_dim = Hq * D
    kv_dim = Hk * D
    rng = np.random.default_rng(seed)

    def r(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    x = r(dim) * 0.5
    norm_w = r(L, dim) * 0.1 + 1.0
    wqkv, sq = _pack(rng, L, q_dim + 2 * kv_dim, dim)
    wo, so = _pack(rng, L, dim, q_dim)
    k_all = (r(L, S, Hk, D) * 0.3).astype(cache_dtype)
    v_all = (r(L, S, Hk, D) * 0.3).astype(cache_dtype)
    bqkv = (r(L, q_dim + 2 * kv_dim) * 0.2) if bias else None
    return x, norm_w, wqkv, wo, sq, so, k_all, v_all, bqkv


def _run4(interpret, args, scalars, **kw):
    x, norm_w, wqkv, wo, sq, so, k_all, v_all, bqkv = args
    layer, kv_pos, kv_len, kv_sink, pos = (jnp.int32(s) for s in scalars)
    return attn_block4_l(
        x, norm_w, wqkv, wo, k_all, v_all, layer, kv_pos, kv_len, kv_sink,
        pos, scale_qkv=sq, scale_o=so, n_heads=kw.pop("n_heads"), kv_sinks=2,
        theta=10000.0, rotary_dim=128, norm_eps=1e-5, bqkv_all=bqkv,
        interpret=interpret, **kw)


CASES = [
    # (scalars: layer, kv_pos, kv_len, kv_sink, pos)
    (0, 0, 1, 0, 0),          # very first token
    (1, 5, 6, 0, 5),          # mid-prefill position
    (2, 11, 16, 0, 11),       # window almost full
    (1, 2, 16, 2, 21),        # ring-wrapped: sinks active
]


@pytest.mark.parametrize("scalars", CASES)
@pytest.mark.parametrize("bias", [False, True])
def test_block4_interpret_matches_emulation(scalars, bias):
    args = _blk_args(7, bias=bias)
    out_e, ke, ve = _run4(None, args, scalars, n_heads=4)
    out_i, ki, vi = _run4(True, args, scalars, n_heads=4)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(out_e),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(ki, np.float32),
                               np.asarray(ke, np.float32), rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(vi, np.float32),
                               np.asarray(ve, np.float32), rtol=1e-2, atol=1e-2)


def test_block4_qkv_clip_applies():
    args = _blk_args(3)
    tight = _run4(None, args, (0, 0, 1, 0, 0), n_heads=4, qkv_clip=0.01)
    loose = _run4(None, args, (0, 0, 1, 0, 0), n_heads=4)
    assert not np.allclose(np.asarray(tight[0]), np.asarray(loose[0]))
    ti = _run4(True, args, (0, 0, 1, 0, 0), n_heads=4, qkv_clip=0.01)
    np.testing.assert_allclose(np.asarray(ti[0]), np.asarray(tight[0]),
                               rtol=3e-2, atol=3e-2)


def test_block4_matches_dequantized_block():
    # against attn_block_l on dequantized weights: quantization error only
    from yalm_tpu.ops.pallas.block import attn_block_l
    from yalm_tpu.ops.pallas.gemv import unpack_int4
    args = _blk_args(11)
    x, norm_w, wqkv, wo, sq, so, k_all, v_all, _ = args
    deqq = jnp.asarray(unpack_int4(np.asarray(wqkv), np.asarray(sq)))
    deqo = jnp.asarray(unpack_int4(np.asarray(wo), np.asarray(so)))
    scalars = (1, 5, 6, 0, 5)
    a, ka, va = _run4(None, args, scalars, n_heads=4)
    b, kb, vb = attn_block_l(
        x, norm_w, deqq, deqo, k_all, v_all, jnp.int32(1), jnp.int32(5),
        jnp.int32(6), jnp.int32(0), jnp.int32(5), n_heads=4, kv_sinks=2,
        theta=10000.0, rotary_dim=128, norm_eps=1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=5e-2, atol=5e-2)


def test_block4_supported_shapes():
    from yalm_tpu.config import ModelConfig
    mistral = ModelConfig(
        dim=4096, hidden_dim=14336, head_dim=128, n_layers=32, n_heads=32,
        n_kv_heads=8, vocab_size=32000, max_seq_len=4096, bos_token_id=1,
        eos_token_id=2, rope_theta=1e6, rotary_dim=128, norm_eps=1e-5,
        act_type="silu", weight_dtype="int4")
    assert attn_block4_supported(mistral)
    assert ffn4_supported(mistral.dim, mistral.hidden_dim, mistral.dim)


def test_decode_step_fast_int4_routes_through_fused(monkeypatch):
    """The single-stream int4 decode step must dispatch to the FUSED int4
    kernels (the round-4 unfused gates at fast.py:614/431 are gone)."""
    import yalm_tpu.models.fast as fast
    from yalm_tpu.config import ModelConfig
    from yalm_tpu.models.cache import KVCache
    from yalm_tpu.models.fast import FastScales, FastWeights

    cfg = ModelConfig(
        dim=256, hidden_dim=512, head_dim=128, n_layers=2, n_heads=4,
        n_kv_heads=2, vocab_size=512, max_seq_len=48, bos_token_id=1,
        eos_token_id=2, rope_theta=1e6, rotary_dim=128, norm_eps=1e-5,
        act_type="silu", weight_dtype="int4")
    assert attn_block4_supported(cfg)
    assert ffn4_supported(cfg.dim, cfg.hidden_dim, cfg.dim)

    rng = np.random.default_rng(0)
    d, h, q, kd, v = (cfg.dim, cfg.hidden_dim, cfg.q_dim, cfg.kv_dim,
                      cfg.vocab_size)
    nl, nqkv = cfg.n_layers, q + 2 * cfg.kv_dim
    wqkv, sq = _pack(rng, nl, nqkv, d)
    wo, so = _pack(rng, nl, d, q)
    w13, s13 = _pack(rng, nl, 2 * h, d)
    w2, s2 = _pack(rng, nl, d, h)
    emb = jnp.asarray(rng.integers(-127, 128, (v, d)), jnp.int8)
    fw = FastWeights(
        embed=emb,
        rms_att=jnp.ones((nl, d), jnp.float32),
        rms_ffn=jnp.ones((nl, d), jnp.float32),
        wqkv=wqkv, wo=wo, w13=w13, w2=w2,
        final_norm=jnp.ones((d,), jnp.float32),
        lm_head=emb,
        scales=FastScales(
            embed=jnp.full((v,), 0.01), wqkv=sq, wo=so, w13=s13, w2=s2,
            lm_head=jnp.full((v,), 0.01)))

    calls = {"block4": 0, "ffn4": 0}
    real_blk, real_ffn = fast.attn_block4_l, fast.ffn4_l

    def spy_blk(*a, **kw):
        calls["block4"] += 1
        return real_blk(*a, **kw)

    def spy_ffn(*a, **kw):
        calls["ffn4"] += 1
        return real_ffn(*a, **kw)

    monkeypatch.setattr(fast, "attn_block4_l", spy_blk)
    monkeypatch.setattr(fast, "ffn4_l", spy_ffn)
    cache = KVCache.init(cfg, jnp.bfloat16)
    logits, _ = fast.decode_step_fast(cfg, fw, jnp.int32(3), jnp.int32(0),
                                      cache)
    assert calls["block4"] >= 1 and calls["ffn4"] >= 1
    assert np.isfinite(np.asarray(logits)).all()
