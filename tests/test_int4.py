"""int4 weight path: planar nibble packing + group-scale GEMV kernels.

Invariants: pack/unpack round-trips within one quantization step; the
kernel (emulation AND Pallas interpreter) equals the _gemm4_ref numerics
bitwise; dequantized reference dots agree to bf16-dot tolerance. (The
reference's deepest real dtype is f16 — its fp8 was a stub, SURVEY §2.5;
group-wise int4 halves weight traffic vs even that stub's format.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.ops.pallas.gemv import (_gemm4_ref, gemm4_l, gemv4, gemv4_l,
                                      int4_group, int4_supported, pack_int4,
                                      unpack_int4)


def _mk(n, k, L=1, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((L, n, k)).astype(np.float32) * 0.05
    packed, scales = pack_int4(w)
    return w, jnp.asarray(packed), jnp.asarray(scales)


def test_pack_roundtrip_error_bound():
    w, packed, scales = _mk(256, 1024)
    group = int4_group(1024)
    deq = unpack_int4(np.asarray(packed), np.asarray(scales), group)
    # max error <= s/2 per element, s = groupmax/7
    gmax = np.abs(w.reshape(1, 256, -1, group)).max(axis=-1, keepdims=True)
    err = np.abs(deq.reshape(w.shape) - w).reshape(1, 256, -1, group)
    assert (err <= gmax / 7.0 / 2.0 + 1e-7).all()


@pytest.mark.parametrize("n,k", [(256, 512), (384, 1024), (512, 256)])
def test_kernel_matches_emulation_and_reference(n, k):
    assert int4_supported(n, k)
    w, packed, scales = _mk(n, k, L=3, seed=1)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, k)), jnp.float32)
    group = int4_group(k)
    for layer in (0, 2):
        want = _gemm4_ref(x, packed[layer], scales[layer], group)
        got_em = gemm4_l(x, packed, jnp.int32(layer), scales)
        np.testing.assert_array_equal(np.asarray(got_em), np.asarray(want))
        got_pl = gemm4_l(x, packed, jnp.int32(layer), scales, interpret=True)
        # kernel uses unsigned dots + 8*sum(x) correction (dot4_tile):
        # equal to the emulation's signed dots up to f32 accumulation order
        np.testing.assert_allclose(np.asarray(got_pl), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        # and the whole thing matches a plain dot against dequantized
        # weights to bf16-dot tolerance
        deq = unpack_int4(np.asarray(packed[layer]),
                          np.asarray(scales[layer]), group)
        ref = np.asarray(x, np.float32) @ deq.T
        np.testing.assert_allclose(np.asarray(got_em), ref,
                                   rtol=2e-2, atol=2e-2)


# ---------------------------------------------------------------- end-to-end
def _i4cfg(**over):
    from test_fast_path import fast_config
    return fast_config(max_seq_len=64, **over)


@pytest.fixture(scope="module")
def ckpts4(tmp_path_factory):
    from yalm_tpu.convert import convert
    from yalm_tpu.utils.testing import synth_hf_dir
    root = tmp_path_factory.mktemp("int4")
    cfg = _i4cfg()
    hf = str(root / "hf")
    synth_hf_dir(hf, cfg, seed=31)
    paths = {}
    for d in ("fp32", "fp8", "int8", "int4"):
        p = str(root / f"m_{d}.yalm")
        convert(hf, p, d)
        paths[d] = p
    return paths, cfg


def test_int4_checkpoint_halves_int8_size(ckpts4):
    import os
    paths, _ = ckpts4
    from yalm_tpu.codec.format import read_yalm
    yf = read_yalm(paths["int4"])
    assert yf.metadata["dtype"] == "int4"
    _, cfg = ckpts4
    w = yf.tensors["model.layers.0.attn.wq.weight"]
    gs = yf.tensors["model.layers.0.attn.wq.weight.gscale"]
    assert w.dtype == np.uint8 and w.shape == (cfg.q_dim, cfg.dim // 2)
    assert gs.dtype == np.float32 and gs.shape[-1] == cfg.q_dim
    # layer weights halve; embed/head stay int8, so total is well below int8
    assert os.path.getsize(paths["int4"]) < 0.75 * os.path.getsize(paths["int8"])


def test_int4_fast_matches_oracle_stream(ckpts4):
    """Oracle (load-time dequant) and fast path (packed group-scale
    kernels) emit agreeing greedy streams from the same int4 checkpoint."""
    from yalm_tpu.engine import Engine
    paths, cfg = ckpts4
    oracle = Engine.from_checkpoint(paths["int4"], fast=False)
    fast = Engine.from_checkpoint(paths["int4"], fast=True)
    assert fast.fast, "int4 must take the fast path"
    prompt = [1, 5, 9, 13]
    want = list(oracle.generate(prompt, max_steps=24, temperature=0.0))
    got = list(fast.generate(prompt, max_steps=24, temperature=0.0))
    assert len(got) == len(want) == 24
    agree = 0
    for a, b in zip(got, want):
        if a != b:
            break
        agree += 1
    assert agree >= 12, (agree, got, want)


def test_int4_perplexity_close_to_fp32(ckpts4):
    """Group-wise int4 tracks fp32 closely at toy scale (and is finite)."""
    import math
    from yalm_tpu.engine import Engine
    paths, _ = ckpts4
    tokens = list(np.random.default_rng(0).integers(3, 120, size=48))
    ppl = {}
    for d in ("fp32", "int4", "fp8"):
        eng = Engine.from_checkpoint(paths[d])
        ppl[d], _e, _n = eng.perplexity(tokens)
        assert math.isfinite(ppl[d])
    d4 = abs(ppl["int4"] - ppl["fp32"]) / ppl["fp32"]
    assert d4 < 0.05, ppl  # calibrated toy-scale gate (see test_fp8_parity)


def test_int4_batched_tick_and_prefill(ckpts4):
    """Scheduler-grade paths: batched tick + chunked prefill run on packed
    weights and agree with the single-stream fast path."""
    from yalm_tpu.codec.format import read_yalm
    from yalm_tpu.models.cache import KVCache
    from yalm_tpu.models.fast import (decode_step_fast,
                                      decode_step_fast_batched,
                                      load_fast_weights, prefill_fast)
    paths, cfg = ckpts4
    fw = load_fast_weights(read_yalm(paths["int4"]), cfg)
    assert fw.wqkv.dtype == jnp.uint8

    B = 8
    cache_b = KVCache.init(cfg, jnp.bfloat16, batch=B)
    toks = jnp.asarray([3 + i for i in range(B)], jnp.int32)
    logits_b, cache_b = decode_step_fast_batched(
        cfg, fw, toks, jnp.zeros((B,), jnp.int32), cache_b,
        jnp.ones((B,), jnp.int32))
    lane = KVCache.init(cfg, jnp.bfloat16)
    logits_s, lane = decode_step_fast(cfg, fw, jnp.int32(3), jnp.int32(0),
                                      lane)
    np.testing.assert_allclose(np.asarray(logits_b[0]), np.asarray(logits_s),
                               rtol=2e-2, atol=2e-2)

    T = 16
    lane2 = KVCache.init(cfg, jnp.bfloat16)
    chunk = jnp.asarray(list(range(3, 3 + T)), jnp.int32)
    out, lane2 = prefill_fast(cfg, fw, chunk, jnp.int32(0), jnp.int32(T),
                              lane2, logits_mode="last")
    assert np.isfinite(np.asarray(out)).all()


def test_int4_tensor_parallel_matches_single(tmp_path):
    """Dense int4 x TP: packed rows interleave shard-major, wo/w2 shard
    their packed input columns group-aligned; tp=2 streams == single
    device."""
    import jax
    from yalm_tpu.engine import Engine
    from yalm_tpu.parallel import MeshConfig, make_mesh
    from yalm_tpu.parallel.fast_tp import fast_tp_supported
    from yalm_tpu.utils.testing import synth_checkpoint, tiny_config
    cfg = tiny_config(dim=256, hidden_dim=1024, head_dim=128, n_layers=2,
                      n_heads=8, n_kv_heads=4, vocab_size=512,
                      max_seq_len=64, rotary_dim=128, qkv_clip=30.0,
                      weight_dtype="int4")
    assert fast_tp_supported(cfg, 2)
    path = str(tmp_path / "tp4.yalm")
    synth_checkpoint(path, cfg, seed=35)

    single = Engine.from_checkpoint(path, fast=True)
    mesh = make_mesh(MeshConfig(tp=2), devices=jax.devices()[:2])
    sharded = Engine.from_checkpoint(path, mesh=mesh)
    assert sharded.fast
    prompt = [1, 9, 4, 7]
    want = list(single.generate(prompt, max_steps=12, temperature=0.0))
    got = list(sharded.generate(prompt, max_steps=12, temperature=0.0))
    agree = 0
    for a, b in zip(got, want):
        if a != b:
            break
        agree += 1
    assert agree >= 8, (agree, got, want)


def test_int4_moe_fast_matches_oracle(tmp_path):
    """Routed-expert int4 (gemm4_le/gemv4_le): streams agree with the
    oracle's load-time dequant on a Mixtral-shaped model; the batched MoE
    tick runs on packed experts."""
    from yalm_tpu.codec.format import read_yalm
    from yalm_tpu.engine import Engine
    from yalm_tpu.models import load_weights
    from yalm_tpu.models.cache import KVCache
    from yalm_tpu.models.fast import (decode_step_fast_batched,
                                      load_fast_weights)
    from yalm_tpu.utils.testing import synth_checkpoint
    cfg = _i4cfg(n_experts=4, n_experts_active=2)
    import dataclasses
    cfg = dataclasses.replace(cfg, weight_dtype="int4")
    path = str(tmp_path / "moe4.yalm")
    synth_checkpoint(path, cfg, seed=33)

    oracle = Engine.from_checkpoint(path, fast=False)
    fast = Engine.from_checkpoint(path, fast=True)
    assert fast.fast
    prompt = [1, 5, 9]
    want = list(oracle.generate(prompt, max_steps=16, temperature=0.0))
    got = list(fast.generate(prompt, max_steps=16, temperature=0.0))
    agree = 0
    for a, b in zip(got, want):
        if a != b:
            break
        agree += 1
    assert agree >= 8, (agree, got, want)

    fw = load_fast_weights(read_yalm(path), cfg)
    assert fw.w13.dtype == jnp.uint8 and fw.moegate.dtype == jnp.int8
    B = 8
    cache = KVCache.init(cfg, jnp.bfloat16, batch=B)
    logits, _ = decode_step_fast_batched(
        cfg, fw, jnp.asarray([3 + i for i in range(B)], jnp.int32),
        jnp.zeros((B,), jnp.int32), cache, jnp.ones((B,), jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_gemv4_single_row():
    w, packed, scales = _mk(256, 512, L=2, seed=3)
    x = jnp.asarray(np.random.default_rng(4).standard_normal(512),
                    jnp.float32)
    got = gemv4_l(x, packed, jnp.int32(1), scales)
    want = _gemm4_ref(x.reshape(1, -1), packed[1], scales[1],
                      int4_group(512)).reshape(-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    got2 = gemv4(x, packed[1], scales[1])
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want))


# ------------------------------------------------- int4 x parallelism matrix
def _i4big(**over):
    """Dims whose tp=2 LOCAL shards stay group-aligned (q/tp, h/tp % 512)."""
    kw = dict(dim=256, hidden_dim=1024, head_dim=128, n_layers=2,
              n_heads=8, n_kv_heads=4, vocab_size=512,
              rotary_dim=128, weight_dtype="int4")
    kw.update(over)
    return _i4cfg(**kw)


def test_int4_moe_tensor_parallel_matches_single(tmp_path):
    """Routed int4 x TP (and x EP): packed expert rows interleave
    shard-major per expert, group scales follow; streams match the
    single-device packed path."""
    import dataclasses
    import jax
    from yalm_tpu.engine import Engine
    from yalm_tpu.parallel import MeshConfig, make_mesh
    from yalm_tpu.parallel.fast_tp import fast_tp_supported
    from yalm_tpu.utils.testing import synth_checkpoint
    cfg = _i4big(n_experts=4, n_experts_active=2)
    assert fast_tp_supported(cfg, 2, 1) and fast_tp_supported(cfg, 2, 2)
    path = str(tmp_path / "moetp4.yalm")
    synth_checkpoint(path, cfg, seed=37)

    single = Engine.from_checkpoint(path, fast=True)
    assert single.fast
    prompt = [1, 9, 4, 7]
    want = list(single.generate(prompt, max_steps=12, temperature=0.0))
    for mc in (MeshConfig(tp=2), MeshConfig(tp=2, ep=2)):
        mesh = make_mesh(mc, devices=jax.devices()[: mc.n_devices])
        sharded = Engine.from_checkpoint(path, mesh=mesh)
        assert sharded.fast
        got = list(sharded.generate(prompt, max_steps=12, temperature=0.0))
        agree = 0
        for a, b in zip(got, want):
            if a != b:
                break
            agree += 1
        assert agree >= 8, (mc, agree, got, want)


def test_int4_ring_prefill_matches_single(tmp_path):
    """int4 x SP ring prefill: the packed group-scale GEMMs run inside the
    ring body; last-token logits match the single-chip packed prefill."""
    import jax
    from yalm_tpu.codec.format import read_yalm
    from yalm_tpu.models.cache import KVCache
    from yalm_tpu.models.fast import load_fast_weights, prefill_fast
    from yalm_tpu.parallel.ring import (make_prefill_ring, ring_supported,
                                        shard_ring_weights)
    from yalm_tpu.utils.testing import synth_checkpoint
    cfg = _i4big()
    sp, tp = 2, 2
    assert ring_supported(cfg, sp, tp)
    path = str(tmp_path / "ring4.yalm")
    synth_checkpoint(path, cfg, seed=41)

    fw = load_fast_weights(read_yalm(path), cfg)
    assert fw.wqkv.dtype == jnp.uint8 and fw.scales is not None
    T = 32
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, T), jnp.int32)
    lane = KVCache.init(cfg, jnp.bfloat16)
    want, lane = prefill_fast(cfg, fw, tokens, jnp.int32(0), jnp.int32(T),
                              lane, logits_mode="last")

    mesh = jax.make_mesh((sp, tp), ("sp", "tp"),
                         devices=jax.devices()[: sp * tp])
    rw = shard_ring_weights(
        load_fast_weights(read_yalm(path), cfg, tp=tp), cfg, mesh)
    ring = jax.jit(make_prefill_ring(cfg, mesh, with_scales=True))
    logits, ck, cv = ring(rw, tokens)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    assert int(jnp.argmax(logits)) == int(jnp.argmax(want))
    np.testing.assert_allclose(
        np.asarray(ck, np.float32).reshape(cfg.n_layers, T, -1),
        np.asarray(lane.k[:, :T], np.float32).reshape(cfg.n_layers, T, -1),
        rtol=3e-2, atol=3e-2)


def test_int4_pp_tick_matches_single(tmp_path):
    """int4 x PP: layer-axis sharding of the packed stacks + (L, G, N)
    group scales; the pipelined tick equals the single-device batched
    tick on the same packed weights."""
    import jax
    from yalm_tpu.codec.format import read_yalm
    from yalm_tpu.models.cache import KVCache
    from yalm_tpu.models.fast import (decode_step_fast_batched,
                                      load_fast_weights)
    from yalm_tpu.parallel.pipeline import (make_tick_pp, pp_supported,
                                            shard_pp_cache, shard_pp_weights)
    from yalm_tpu.utils.testing import synth_checkpoint
    cfg = _i4big(n_layers=4)
    pp, B = 2, 8
    assert pp_supported(cfg, pp, B)
    path = str(tmp_path / "pp4.yalm")
    synth_checkpoint(path, cfg, seed=43)
    fw = load_fast_weights(read_yalm(path), cfg)
    assert fw.wqkv.dtype == jnp.uint8

    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, B), jnp.int32)
    positions = jnp.asarray(rng.integers(0, 16, B), jnp.int32)
    write = jnp.ones((B,), jnp.int32)
    cache = KVCache.init(cfg, jnp.bfloat16, batch=B)
    h_tokens = jnp.asarray(rng.integers(3, cfg.vocab_size, B), jnp.int32)
    _, cache = decode_step_fast_batched(cfg, fw, h_tokens,
                                        jnp.zeros((B,), jnp.int32), cache,
                                        write)
    want, want_cache = decode_step_fast_batched(cfg, fw, tokens, positions,
                                                cache, write)

    mesh = jax.make_mesh((pp,), ("pp",), devices=jax.devices()[:pp])
    pw = shard_pp_weights(fw, cfg, mesh)
    pcache = shard_pp_cache(cache, mesh)
    tick = jax.jit(make_tick_pp(cfg, mesh, B, with_scales=True))
    got, got_cache = tick(pw, tokens, positions, pcache, write)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    assert (np.asarray(got).argmax(-1) == np.asarray(want).argmax(-1)).all()
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(got_cache.k), np.float32),
        np.asarray(want_cache.k, np.float32))
