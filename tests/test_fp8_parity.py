"""FP8 weight-only parity tests (BASELINE.md north-star: Δppl fp8-vs-fp16).

The reference's fp8 path was a stub that reinterpreted fp8 bytes as f16
(SURVEY.md §2.5); here fp8 is real: e5m2 bytes in the checkpoint, dequantized
at matmul time. These tests pin the quantization semantics and measure the
end-to-end perplexity delta on the built-in harness with a tiny model.
"""

import math

import ml_dtypes
import numpy as np
import pytest

from yalm_tpu.codec.format import read_yalm
from yalm_tpu.convert import convert
from yalm_tpu.engine import Engine
from yalm_tpu.utils.testing import synth_hf_dir, tiny_config


def test_fp8_cast_is_rne():
    """Converter casts f32 -> e5m2 with round-to-nearest-even (same as the
    reference's torch .to(float8_e5m2), convert.py:160-168)."""
    vals = np.array([1.0, 1.25, 1.5, 3.1415, -0.1, 65504.0, 1e-8], np.float32)
    cast = vals.astype(ml_dtypes.float8_e5m2)
    # e5m2 has 2 mantissa bits: 1.25 is exactly representable, 3.1415 -> 3.0
    assert float(cast[1]) == 1.25
    assert float(cast[3]) == 3.0
    # dequant is exact (every e5m2 value is exactly representable in f32)
    redq = cast.astype(np.float32)
    assert float(redq[1]) == 1.25


@pytest.fixture(scope="module")
def two_checkpoints(tmp_path_factory):
    root = tmp_path_factory.mktemp("fp8")
    cfg = tiny_config(dim=64, hidden_dim=128, n_layers=2, max_seq_len=64)
    hf = str(root / "hf")
    synth_hf_dir(hf, cfg, seed=11)
    p16 = str(root / "m16.yalm")
    p8 = str(root / "m8.yalm")
    convert(hf, p16, "fp16")
    convert(hf, p8, "fp8")
    return p16, p8


def test_fp8_checkpoint_smaller(two_checkpoints):
    import os
    p16, p8 = two_checkpoints
    # fp8 weights are half the bytes (norms stay f32 in both)
    assert os.path.getsize(p8) < 0.75 * os.path.getsize(p16)


def test_fp8_vs_fp16_perplexity_delta(two_checkpoints):
    p16, p8 = two_checkpoints
    tokens = list(np.random.default_rng(0).integers(3, 120, size=48))

    ppls = {}
    for name, path in (("fp16", p16), ("fp8", p8)):
        eng = Engine.from_checkpoint(path)
        ppl, _err, n = eng.perplexity(tokens)
        assert n == len(tokens) - 1
        assert math.isfinite(ppl)
        ppls[name] = ppl

    delta = abs(ppls["fp8"] - ppls["fp16"]) / ppls["fp16"]
    # CALIBRATED bound: over 7 synth seeds at this scale the delta
    # distribution measured mean=0.024, sigma=0.014 -> mean+3sigma ~ 0.067.
    # (Tiny random models amplify e5m2 error vs a trained 7B; the ≤1%
    # north-star target applies at full model scale and real weights —
    # see BASELINE.md.) A dequant regression that shifts Δppl by a few
    # percent at this scale lands outside this gate; bit-level shifts are
    # caught by test_fp8_golden_logits below.
    assert delta < 0.07, ppls


def test_fp8_logits_close_to_fp16(two_checkpoints):
    p16, p8 = two_checkpoints
    e16 = Engine.from_checkpoint(p16)
    e8 = Engine.from_checkpoint(p8)
    prompt = [1, 10, 20, 30]
    e16.prefill_tokens(prompt)
    e8.prefill_tokens(prompt)
    a = np.asarray(e16._last_logits)
    b = np.asarray(e8._last_logits)
    # same argmax ranking at the top in a well-conditioned case is too strong
    # for random weights; require high cosine similarity instead
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    # e5m2 has 2 mantissa bits (~6% per-weight error); random tiny models
    # compound it — 0.9 pins "same direction" without overfitting noise
    assert cos > 0.9, cos


def test_fp8_golden_logits(tmp_path):
    """Golden-logits regression gate at a mid-size config: the fp8
    convert -> load -> dequant -> forward pipeline must reproduce a stored
    fixture almost exactly. ANY change to quantization semantics (cast mode,
    scale handling, dequant placement) shifts these logits and fails here —
    a far finer tripwire than the perplexity delta."""
    import os
    from yalm_tpu.convert import convert
    from yalm_tpu.utils.testing import synth_hf_dir

    fix = np.load(os.path.join(os.path.dirname(__file__), "data",
                               "fp8_golden_logits.npz"))
    cfg = tiny_config(dim=256, hidden_dim=512, n_layers=4, max_seq_len=64,
                      vocab_size=512)
    hf = str(tmp_path / "hf")
    synth_hf_dir(hf, cfg, seed=17)
    p8 = str(tmp_path / "m8.yalm")
    convert(hf, p8, "fp8")
    eng = Engine.from_checkpoint(p8)
    eng.prefill_tokens([int(t) for t in fix["prompt"]])
    got = np.asarray(eng._last_logits, np.float32)
    np.testing.assert_allclose(got, fix["logits"], rtol=2e-3, atol=2e-3)
