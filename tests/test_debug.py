"""Debug subsystem tests: BinaryDumper, capture maps, capture diffing."""

import jax.numpy as jnp
import numpy as np

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.models import KVCache, decode_step, load_weights
from yalm_tpu.utils.debug import BinaryDumper, diff_captures, max_err
from yalm_tpu.utils.testing import synth_checkpoint, tiny_config


def test_binary_dumper_roundtrip(tmp_path):
    arr = np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32)
    p = str(tmp_path / "dump" / "x.npy")
    BinaryDumper.save(p, arr)
    np.testing.assert_array_equal(BinaryDumper.load(p), arr)


def test_capture_shapes_and_determinism(tmp_path):
    cfg = tiny_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg)
    weights = load_weights(read_yalm(path), cfg)
    cache = KVCache.init(cfg)

    logits, cache2, cap = decode_step(cfg, weights, jnp.int32(3), jnp.int32(0),
                                      cache, capture=True)
    assert cap["q"].shape == (cfg.n_layers, cfg.n_heads, cfg.head_dim)
    assert cap["block_out"].shape == (cfg.n_layers, cfg.dim)
    assert cap["logits"].shape == (cfg.vocab_size,)

    # capture path must not perturb the non-capture result
    logits2, _ = decode_step(cfg, weights, jnp.int32(3), jnp.int32(0), KVCache.init(cfg))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), rtol=1e-6)

    # identical runs diff to ~0; perturbed weights show a nonzero max_err
    _, _, cap_b = decode_step(cfg, weights, jnp.int32(3), jnp.int32(0),
                              KVCache.init(cfg), capture=True)
    errs = diff_captures(cap, cap_b)
    assert max(errs.values()) == 0.0

    w2 = weights._replace(final_norm=weights.final_norm * 1.01)
    _, _, cap_c = decode_step(cfg, w2, jnp.int32(3), jnp.int32(0),
                              KVCache.init(cfg), capture=True)
    errs = diff_captures(cap, cap_c)
    assert errs["logits"] > 0
    assert errs["block_out"] == 0.0  # upstream of the perturbation


def test_max_err_relative_and_absolute():
    a = np.array([1.0, 2.0])
    b = np.array([1.0, 2.2])
    assert abs(max_err(a, b, relative=False) - 0.2) < 1e-9
    assert abs(max_err(a, b, relative=True) - 0.2 / 2.2) < 1e-9


def test_fast_path_capture_matches_oracle(tmp_path):
    """decode_step_fast(capture=True) exposes the same DEBUG_MODEL-style
    activation map as the oracle, pulled from the real kernel boundaries —
    diff_captures localizes oracle-vs-Pallas divergence per layer/tensor."""
    import jax.numpy as jnp
    from test_fast_path import fast_config
    from yalm_tpu.codec.format import read_yalm
    from yalm_tpu.models import KVCache, decode_step, load_weights
    from yalm_tpu.models.fast import FastWeights, decode_step_fast
    from yalm_tpu.utils.debug import diff_captures
    from yalm_tpu.utils.testing import synth_checkpoint

    cfg = fast_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=13)
    w = load_weights(read_yalm(path), cfg)
    fw = FastWeights.from_weights(w, cfg)

    cache_o = KVCache.init(cfg, jnp.bfloat16)
    cache_f = KVCache.init(cfg, jnp.bfloat16)
    tok = jnp.int32(5)
    for pos in range(3):  # build a little history, then capture
        _, cache_o, cap_o = decode_step(cfg, w, tok, jnp.int32(pos), cache_o,
                                        compute_dtype=jnp.bfloat16, capture=True)
        _, cache_f, cap_f = decode_step_fast(cfg, fw, tok, jnp.int32(pos),
                                             cache_f, capture=True)
        tok = jnp.int32(3 + pos)

    assert set(cap_f) == set(cap_o)
    errs = diff_captures(cap_o, cap_f)
    for name, e in errs.items():
        assert e < 6e-2, (name, errs)
    # per-layer stacks really are per-layer
    assert cap_f["block_out"].shape[0] == cfg.n_layers
