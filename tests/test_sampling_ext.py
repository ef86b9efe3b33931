"""Per-request top-k / top-p sampling (sample_ext) + the chat endpoint.

The reference's sampler is argmax/temperature only (src/sampler.cpp); the
serving layer adds top-k and nucleus sampling with k/p as DATA so one
compiled batched tick serves mixed per-request settings, plus
/v1/chat/completions over a minimal template.
"""

import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalm_tpu.sampler import sample, sample_ext
from yalm_tpu.chat import render, STOP_STRINGS


def _logits(seed=0, V=64):
    return jax.random.normal(jax.random.PRNGKey(seed), (V,)) * 3.0


def test_disabled_cuts_match_plain_sample():
    logits = _logits()
    for s in range(5):
        key = jax.random.PRNGKey(100 + s)
        a = sample(logits, key, jnp.float32(0.8))
        b = sample_ext(logits, key, jnp.float32(0.8), jnp.int32(0),
                       jnp.float32(1.0))
        assert int(a) == int(b)


def test_topk1_is_greedy_at_any_temperature():
    logits = _logits(1)
    am = int(jnp.argmax(logits))
    for s in range(8):
        got = sample_ext(logits, jax.random.PRNGKey(s), jnp.float32(5.0),
                         jnp.int32(1), jnp.float32(1.0))
        assert int(got) == am


def test_topk_restricts_support():
    logits = _logits(2)
    top5 = set(np.argsort(np.asarray(logits))[-5:].tolist())
    seen = set()
    for s in range(64):
        got = int(sample_ext(logits, jax.random.PRNGKey(s), jnp.float32(2.0),
                             jnp.int32(5), jnp.float32(1.0)))
        seen.add(got)
        assert got in top5
    assert len(seen) > 1  # actually samples, not argmax


def test_topp_tiny_is_greedy():
    logits = _logits(3)
    am = int(jnp.argmax(logits))
    for s in range(8):
        got = sample_ext(logits, jax.random.PRNGKey(s), jnp.float32(1.0),
                         jnp.int32(0), jnp.float32(1e-6))
        assert int(got) == am


def test_topp_restricts_support():
    logits = _logits(4)
    # compute the nucleus at temp 1 on the host
    p = np.asarray(jax.nn.softmax(logits))
    order = np.argsort(-p)
    csum = np.cumsum(p[order])
    nucleus = set(order[: int((csum < 0.7).sum()) + 1].tolist())
    for s in range(64):
        got = int(sample_ext(logits, jax.random.PRNGKey(s), jnp.float32(1.0),
                             jnp.int32(0), jnp.float32(0.7)))
        assert got in nucleus


def test_temperature_zero_is_argmax_despite_cuts():
    logits = _logits(5)
    got = sample_ext(logits, jax.random.PRNGKey(0), jnp.float32(0.0),
                     jnp.int32(3), jnp.float32(0.5))
    assert int(got) == int(jnp.argmax(logits))


def test_scheduler_topk1_deterministic(tmp_path):
    """A hot-temperature request with top_k=1 decodes greedily through the
    batched tick — proves the per-lane k reaches the device sampler."""
    from yalm_tpu.codec.format import read_yalm
    from yalm_tpu.models import load_weights
    from yalm_tpu.scheduler import Request, Scheduler
    from yalm_tpu.utils.testing import synth_checkpoint, tiny_config

    cfg = tiny_config(max_seq_len=64)
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=3)
    weights = load_weights(read_yalm(path), cfg)

    def run(**kw):
        kw.setdefault("seed", 11)
        sched = Scheduler(cfg, weights, batch=8)
        req = Request(prompt_tokens=[1, 7, 9], max_new_tokens=8, **kw)
        sched.submit(req)
        sched.run()
        return req.generated

    greedy = run(temperature=0.0)
    hot_topk1 = run(temperature=4.0, top_k=1)
    hot = run(temperature=4.0)
    assert hot_topk1 == greedy
    assert hot != greedy  # sanity: temperature alone does diverge


# ---------------------------------------------------------------------------
# chat template + endpoint
# ---------------------------------------------------------------------------

def test_chatml_render():
    msgs = [{"role": "system", "content": "be terse"},
            {"role": "user", "content": "hi"}]
    out = render(msgs, "chatml")
    assert out.endswith("<|im_start|>assistant\n")
    assert "<|im_start|>system\nbe terse<|im_end|>" in out
    with pytest.raises(ValueError):
        render([{"role": "robot", "content": "x"}], "chatml")
    with pytest.raises(ValueError):
        render(msgs, "nope")


def test_gemma_render():
    msgs = [{"role": "system", "content": "S"},
            {"role": "user", "content": "u1"},
            {"role": "assistant", "content": "a1"},
            {"role": "user", "content": "u2"}]
    out = render(msgs, "gemma")
    assert out == ("<start_of_turn>user\nS\n\nu1<end_of_turn>\n"
                   "<start_of_turn>model\na1<end_of_turn>\n"
                   "<start_of_turn>user\nu2<end_of_turn>\n"
                   "<start_of_turn>model\n")
    assert STOP_STRINGS["gemma"] == ("<end_of_turn>",)


def test_inst_render():
    msgs = [{"role": "system", "content": "S"},
            {"role": "user", "content": "u1"},
            {"role": "assistant", "content": "a1"},
            {"role": "user", "content": "u2"}]
    out = render(msgs, "inst")
    assert out == "[INST] S\n\nu1 [/INST] a1[INST] u2 [/INST]"


def test_llama3_render():
    msgs = [{"role": "system", "content": "S"},
            {"role": "user", "content": "hi"}]
    out = render(msgs, "llama3")
    assert out.startswith("<|begin_of_text|>")
    assert "<|start_header_id|>system<|end_header_id|>\n\nS<|eot_id|>" in out
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
    assert STOP_STRINGS["llama3"] == ("<|eot_id|>",)


def test_chat_completions_endpoint(tmp_path):
    import threading
    from yalm_tpu.server import ServingEngine, serve
    from yalm_tpu.utils.testing import synth_checkpoint, tiny_config

    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, tiny_config(), seed=0)
    engine = ServingEngine.from_checkpoint(path, batch=2, kv_dtype=jnp.float16)
    httpd = serve(engine, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        payload = {"messages": [{"role": "user", "content": "hello"}],
                   "max_tokens": 6, "temperature": 0.7, "top_k": 4,
                   "seed": 3}
        req = urllib.request.Request(
            base + "/v1/chat/completions", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["object"] == "chat.completion"
        msg = out["choices"][0]["message"]
        assert msg["role"] == "assistant"
        assert isinstance(msg["content"], str)
        for ss in STOP_STRINGS["chatml"]:
            assert ss not in msg["content"]

        bad = urllib.request.Request(
            base + "/v1/chat/completions",
            data=json.dumps({"messages": [{"role": "robot", "content": "x"}]}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=60)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        engine.close()


def test_chat_streaming_deltas_and_stop_string(tmp_path):
    """Streaming chat: delta-shaped SSE chunks, and a synthetic stop string
    ends the stream early (request cancelled, no template leak)."""
    import threading
    from yalm_tpu import chat as chat_mod
    from yalm_tpu.server import ServingEngine, serve
    from yalm_tpu.utils.testing import synth_checkpoint, tiny_config

    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, tiny_config(), seed=1)
    engine = ServingEngine.from_checkpoint(path, batch=2, kv_dtype=jnp.float16)
    httpd = serve(engine, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        payload = {"messages": [{"role": "user", "content": "hello"}],
                   "max_tokens": 12, "temperature": 0.0, "stream": True}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        pieces = []
        with urllib.request.urlopen(req, timeout=120) as r:
            body = r.read().decode()
        for line in body.splitlines():
            if line.startswith("data: ") and line != "data: [DONE]":
                obj = json.loads(line[6:])
                assert obj["object"] == "chat.completion.chunk"
                pieces.append(obj["choices"][0]["delta"]["content"])
        text = "".join(pieces)
        for ss in STOP_STRINGS["chatml"]:
            assert ss not in text
        assert "data: [DONE]" in body
    finally:
        httpd.shutdown()
        engine.close()
