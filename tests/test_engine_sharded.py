"""End-to-end sharded Engine test: a tp=4 mesh serves identical results to
the single-device engine through the full public API (prefill, generate,
perplexity)."""

import numpy as np
import pytest

from yalm_tpu.engine import Engine
from yalm_tpu.parallel import MeshConfig, make_mesh
from yalm_tpu.utils.testing import synth_checkpoint, tiny_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = tiny_config(n_heads=8, n_kv_heads=4, head_dim=8, dim=64,
                      hidden_dim=128, max_seq_len=64, vocab_size=128,
                      weight_dtype="fp16")
    path = str(tmp_path_factory.mktemp("ckpt") / "m.yalm")
    synth_checkpoint(path, cfg)
    return path


def test_sharded_engine_matches_single(ckpt):
    single = Engine.from_checkpoint(ckpt)
    import jax
    mesh = make_mesh(MeshConfig(tp=4), devices=jax.devices()[:4])
    sharded = Engine.from_checkpoint(ckpt, mesh=mesh)

    prompt = [1, 9, 4, 4, 2, 7]
    out_a = list(single.generate(prompt, max_steps=6, temperature=0.0))
    out_b = list(sharded.generate(prompt, max_steps=6, temperature=0.0))
    assert out_a == out_b

    single.reset()
    sharded.reset()
    toks = [1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 1]
    ppl_a, _, _ = single.perplexity(toks)
    ppl_b, _, _ = sharded.perplexity(toks)
    assert abs(ppl_a - ppl_b) / ppl_a < 1e-3
