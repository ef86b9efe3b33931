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
    # tiny random models amplify quantization error vs a trained 7B; the
    # real ≤1% target applies to the full-size bench. This pins sanity.
    assert delta < 0.25, ppls


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
