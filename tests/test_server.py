"""HTTP serving layer tests: completion, streaming, concurrency, health."""

import json
import threading
import urllib.request

import jax.numpy as jnp
import pytest

from yalm_tpu.server import ServingEngine, serve
from yalm_tpu.utils.testing import synth_checkpoint, tiny_config


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("srv") / "m.yalm")
    synth_checkpoint(path, tiny_config(), seed=0)
    engine = ServingEngine.from_checkpoint(path, batch=4, kv_dtype=jnp.float16)
    httpd = serve(engine, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", engine
    httpd.shutdown()
    engine.close()


def _post(url, payload, timeout=120):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read()


def test_health_and_models(server):
    base, _ = server
    with urllib.request.urlopen(base + "/health", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(base + "/v1/models", timeout=30) as r:
        data = json.loads(r.read())
    assert data["data"][0]["id"] == "yalm-tpu"


def test_metrics_endpoint(server):
    """Prometheus-text /metrics: counters advance as requests complete."""
    base, engine = server
    _post(base + "/v1/completions",
          {"prompt": "metrics probe", "max_tokens": 3, "temperature": 0.0})
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        assert "text/plain" in r.headers["Content-Type"]
        text = r.read().decode()
    vals = {}
    for line in text.splitlines():
        if line and not line.startswith("#"):
            k, v = line.rsplit(" ", 1)
            vals[k] = float(v)
    assert vals["yalm_requests_total"] >= 1
    assert vals["yalm_tokens_generated_total"] >= 3
    assert vals["yalm_ticks_total"] >= 1
    assert vals["yalm_requests_failed_total"] == 0
    assert vals["yalm_batch_slots"] == engine.sched.B
    assert vals["yalm_uptime_seconds"] > 0


def test_user_stop_strings_and_finish_reason(server):
    """OpenAI `stop`: generation trims at the first stop sequence and
    reports finish_reason=stop; without it, hitting max_tokens reports
    length."""
    base, engine = server
    # run once unconstrained to learn what the model emits
    status, body = _post(base + "/v1/completions",
                         {"prompt": "hello", "max_tokens": 8,
                          "temperature": 0.0, "seed": 1})
    free = json.loads(body)["choices"][0]
    assert free["finish_reason"] == "length"
    text = free["text"]
    assert len(text) > 2
    stop_seq = text[2:5]
    status, body = _post(base + "/v1/completions",
                         {"prompt": "hello", "max_tokens": 8,
                          "temperature": 0.0, "seed": 1,
                          "stop": stop_seq})
    out = json.loads(body)["choices"][0]
    assert stop_seq not in out["text"]
    assert out["text"] == text[:text.find(stop_seq)]
    assert out["finish_reason"] == "stop"
    # invalid stop -> 400, nothing crashes
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/completions",
              {"prompt": "x", "stop": ["a", "b", "c", "d", "e"]})
    assert ei.value.code == 400


def test_logprobs_field(server):
    base, _ = server
    status, body = _post(base + "/v1/completions",
                         {"prompt": "hello", "max_tokens": 5,
                          "temperature": 0.0, "logprobs": 1})
    out = json.loads(body)["choices"][0]
    lp = out["logprobs"]
    assert len(lp["tokens"]) == len(lp["token_logprobs"]) == 5
    assert all(isinstance(x, float) and x <= 0.0
               for x in lp["token_logprobs"])
    # no logprobs unless asked
    status, body = _post(base + "/v1/completions",
                         {"prompt": "hello", "max_tokens": 2,
                          "temperature": 0.0})
    assert "logprobs" not in json.loads(body)["choices"][0]


def test_logprobs_streaming_and_chat_schema(server):
    """Streaming chunks carry per-token logprobs; chat responses use the
    chat-API logprobs shape ({content: [{token, logprob, ...}]})."""
    base, _ = server
    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({"prompt": "hello", "max_tokens": 4,
                         "temperature": 0.0, "stream": True,
                         "logprobs": 1}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        raw = r.read().decode()
    chunks = [json.loads(l[len("data: "):]) for l in raw.splitlines()
              if l.startswith("data: ") and not l.endswith("[DONE]")]
    assert chunks
    for c in chunks:
        ch = c["choices"][0]
        lp = ch["logprobs"]
        assert lp["tokens"] == [ch["text"]]
        assert all(x is None or x <= 0.0 for x in lp["token_logprobs"])
    # greedy streamed logprobs must match the non-streamed ones
    _, body = _post(base + "/v1/completions",
                    {"prompt": "hello", "max_tokens": 4,
                     "temperature": 0.0, "logprobs": 1})
    flat = json.loads(body)["choices"][0]["logprobs"]["token_logprobs"]
    streamed = [c["choices"][0]["logprobs"]["token_logprobs"][0]
                for c in chunks]
    assert streamed == pytest.approx(flat, abs=1e-4)

    _, body = _post(base + "/v1/chat/completions",
                    {"messages": [{"role": "user", "content": "hi"}],
                     "max_tokens": 4, "temperature": 0.0, "logprobs": True})
    lp = json.loads(body)["choices"][0]["logprobs"]
    assert "content" in lp and len(lp["content"]) >= 1
    for e in lp["content"]:
        assert set(e) == {"token", "logprob", "bytes", "top_logprobs"}
        assert e["logprob"] <= 0.0


def test_n_choices(server):
    """OpenAI `n`: independent choices decode as concurrent lanes; with an
    explicit seed, choice seeds are seed+i so temperature>0 choices
    differ (usually) and greedy choices agree."""
    base, _ = server
    status, body = _post(base + "/v1/completions",
                         {"prompt": "hello", "max_tokens": 6,
                          "temperature": 0.0, "n": 3})
    out = json.loads(body)
    assert [c["index"] for c in out["choices"]] == [0, 1, 2]
    texts = [c["text"] for c in out["choices"]]
    assert texts[0] == texts[1] == texts[2]  # greedy: identical
    assert out["usage"]["completion_tokens"] == 18
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/completions", {"prompt": "x", "n": 9})
    assert ei.value.code == 400


def test_completion(server):
    base, _ = server
    status, body = _post(base + "/v1/completions",
                         {"prompt": "hello", "max_tokens": 8, "temperature": 0.0})
    assert status == 200
    out = json.loads(body)
    assert out["object"] == "text_completion"
    assert out["usage"]["completion_tokens"] >= 1
    assert isinstance(out["choices"][0]["text"], str)


def test_streaming_completion(server):
    base, _ = server
    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({"prompt": "hello", "max_tokens": 6,
                         "temperature": 0.0, "stream": True}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        raw = r.read().decode()
    events = [l for l in raw.splitlines() if l.startswith("data: ")]
    assert events[-1] == "data: [DONE]"
    assert len(events) >= 2  # at least one token + DONE


def test_concurrent_requests(server):
    base, _ = server
    results = {}

    def one(i):
        status, body = _post(base + "/v1/completions",
                             {"prompt": f"hello {i}", "max_tokens": 5,
                              "temperature": 0.0})
        results[i] = (status, json.loads(body))

    threads = [threading.Thread(target=one, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert len(results) == 5
    assert all(status == 200 for status, _ in results.values())
    assert all(out["usage"]["completion_tokens"] >= 1
               for _, out in results.values())


def test_bad_request(server):
    base, _ = server
    req = urllib.request.Request(
        base + "/v1/completions", data=b'{"nope": 1}',
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_engine_complete_api(server):
    _, engine = server
    text = engine.complete("hello world", max_tokens=6, temperature=0.0)
    assert isinstance(text, str)


def test_server_over_fast_path(tmp_path):
    """The serving stack on top of the Pallas fast scheduler (emulated on
    CPU) — exercises the whole fast serving pipeline end-to-end."""
    import jax.numpy as jnp
    from yalm_tpu.server import ServingEngine
    from yalm_tpu.utils.testing import synth_checkpoint, tiny_config

    cfg = tiny_config(dim=256, hidden_dim=512, head_dim=128, n_layers=2,
                      n_heads=4, n_kv_heads=2, vocab_size=512, max_seq_len=64,
                      rotary_dim=128, weight_dtype="fp8")
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=0)
    engine = ServingEngine.from_checkpoint(path, batch=8)
    try:
        assert engine.sched.fast
        text = engine.complete("hello", max_tokens=5, temperature=0.0)
        assert isinstance(text, str)
    finally:
        engine.close()


def test_server_prompt_cap(tmp_path):
    """The cap is a pure POLICY knob now (admission interleaves with decode,
    so long prompts no longer stall the batch): disabled by default,
    enforced when explicitly set."""
    import jax.numpy as jnp
    from yalm_tpu.server import ServingEngine
    from yalm_tpu.utils.testing import synth_checkpoint, tiny_config

    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, tiny_config(max_seq_len=32), seed=0)
    engine = ServingEngine.from_checkpoint(path, batch=2)
    try:
        assert engine.max_prompt_tokens == 0  # unlimited by default
        engine.submit_prompt("word " * 100, max_tokens=1)  # accepted
    finally:
        engine.close()
    engine = ServingEngine.from_checkpoint(path, batch=2, max_prompt_tokens=8)
    try:
        with pytest.raises(ValueError):
            engine.submit_prompt("word " * 100)
    finally:
        engine.close()


def test_server_over_mesh(tmp_path):
    """Serving over a (dp, ep, tp) mesh end-to-end: ServingEngine(mesh=...)
    drives the mesh scheduler and streams match the single-device server
    (VERDICT: '--mesh on server.py main()'). Runs on the virtual 8-device
    CPU mesh."""
    import jax
    from yalm_tpu.codec.format import read_yalm
    from yalm_tpu.config import ModelConfig
    from yalm_tpu.models.fast import load_fast_weights
    from yalm_tpu.parallel.mesh import MeshConfig
    from yalm_tpu.parallel.distributed import make_hybrid_mesh
    from yalm_tpu.tokenizer import Tokenizer
    from test_fast_path import fast_config

    cfg = fast_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=61)

    ref = ServingEngine.from_checkpoint(path, batch=8)
    want = ref.complete("hello", max_tokens=6, temperature=0.0, seed=3)
    ref.close()

    mesh = make_hybrid_mesh(MeshConfig(dp=4, ep=1, tp=2),
                            devices=jax.devices()[:8])
    yf = read_yalm(path)
    mcfg = ModelConfig.from_metadata(yf.metadata)
    weights = load_fast_weights(yf, mcfg, tp=2)
    tok = Tokenizer.from_yalm(yf)
    yf.close()
    eng = ServingEngine(mcfg, weights, tok, batch=8, mesh=mesh)
    assert eng.sched.mesh is mesh
    got = eng.complete("hello", max_tokens=6, temperature=0.0, seed=3)
    eng.close()
    assert got == want


def test_server_main_mesh_flag(tmp_path, monkeypatch):
    """`--mesh dp,ep,tp` on server main() builds the hybrid mesh and wires
    it through ServingEngine (single-process degradation path)."""
    import threading
    import yalm_tpu.server as srv
    from test_fast_path import fast_config

    cfg = fast_config()
    path = str(tmp_path / "m.yalm")
    synth_checkpoint(path, cfg, seed=62)

    built = {}
    real_serve = srv.serve

    def fake_serve(engine, host, port):
        built["engine"] = engine

        class _H:
            def serve_forever(self):
                raise KeyboardInterrupt

            server_address = (host, 0)
        return _H()

    monkeypatch.setattr(srv, "serve", fake_serve)
    srv.main([path, "--batch", "8", "--mesh", "4,1,2", "--port", "0"])
    eng = built["engine"]
    assert eng.sched.mesh is not None
    assert dict(eng.sched.mesh.shape) == {"dp": 4, "ep": 1, "tp": 2}


def test_rejected_submission_returns_error(tmp_path):
    """A request invalid for the scheduler config (logit_bias on a
    spec-lookup scheduler) must return an error response, not an empty
    200 'stop' completion — and must count in the failure metrics.
    (top_k/top_p compose with speculation since round 5, so the trigger
    is logit_bias, which spec modes still reject.)"""
    import urllib.error
    path = str(tmp_path / "spec.yalm")
    from test_fast_path import fast_config
    synth_checkpoint(path, fast_config(max_seq_len=128), seed=9)
    engine = ServingEngine.from_checkpoint(path, batch=8,
                                           spec_lookup=True)
    httpd = serve(engine, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/v1/completions",
                  {"prompt": "x", "max_tokens": 4, "temperature": 0.9,
                   "logit_bias": {"5": 10.0}})
        assert ei.value.code == 400
        assert "speculative" in json.loads(ei.value.read())["error"]
        # greedy requests still work on the same server
        _, body = _post(base + "/v1/completions",
                        {"prompt": "x", "max_tokens": 4, "temperature": 0.0})
        assert json.loads(body)["choices"][0]["text"] is not None
        assert engine.metrics["requests_failed_total"] == 1
    finally:
        httpd.shutdown()
        engine.close()


def test_top_logprobs(server):
    """OpenAI top-N: completions `logprobs: 3` returns per-token dicts of
    the 3 best alternatives; chat `top_logprobs: 2` the chat shape. The
    sampled token's own logprob appears among (or above) its tops."""
    base, _ = server
    _, body = _post(base + "/v1/completions",
                    {"prompt": "hello", "max_tokens": 4,
                     "temperature": 0.0, "logprobs": 3})
    lp = json.loads(body)["choices"][0]["logprobs"]
    assert len(lp["top_logprobs"]) == 4
    for i, d in enumerate(lp["top_logprobs"]):
        assert 1 <= len(d) <= 3      # token-string collisions may merge
        best = max(d.values())
        # greedy: the emitted token IS the best alternative
        assert lp["token_logprobs"][i] == pytest.approx(best, abs=1e-4)

    _, body = _post(base + "/v1/chat/completions",
                    {"messages": [{"role": "user", "content": "hi"}],
                     "max_tokens": 3, "temperature": 0.0,
                     "logprobs": True, "top_logprobs": 2})
    content = json.loads(body)["choices"][0]["logprobs"]["content"]
    for e in content:
        assert len(e["top_logprobs"]) == 2
        assert e["logprob"] == pytest.approx(
            max(t["logprob"] for t in e["top_logprobs"]), abs=1e-4)
