"""Decode-throughput benchmark on real hardware.

Measures single-stream decode tokens/sec on a Mistral-7B-shaped model
(dim 4096, hidden 14336, 32 layers, 32 q / 8 kv heads, vocab 32000, 4k
window — the reference's headline benchmark config, reference README.md:7)
with synthetic device-side weights, and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

vs_baseline is measured tok/s divided by the reference's published 63.8
tok/s (yalm on RTX 4090, FP16, ~120-token generation — BASELINE.md).

Env knobs: YALM_BENCH_DTYPE=fp8|bf16|int8|int4 (default int4 — the
fastest weight format and the headline; the metric name carries the
dtype, fp8's like-for-like-vs-reference row is YALM_BENCH_DTYPE=fp8),
YALM_BENCH_STEPS,
YALM_BENCH_PRESET=mistral7b|gemma2-9b|gemma3-12b|small|fasttiny,
YALM_BENCH_CTX=N (context override), YALM_BENCH_BATCH=N (continuous-batching
aggregate at batch N; N%8==0), YALM_BENCH_PAGED_BATCH=N (paged-KV batching
aggregate), YALM_BENCH_PREFILL=1 (chunked prefill tok/s).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

BASELINE_TOK_S = 63.8  # reference README.md:14, RTX 4090 FP16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_rtt() -> float:
    """Median host dispatch+fetch round trip of a trivial program (the axon
    dev tunnel adds ~26 ms; a host-attached TPU is ~µs). Subtracted from the
    streaming probe so the ceiling reflects the machine, not the harness."""
    import jax
    import jax.numpy as jnp
    tiny = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    _ = np.asarray(tiny(x))  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(tiny(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def measure_hbm_ceiling() -> float:
    """Measured single-stream HBM read bandwidth (GB/s) — the reference
    builds its roofline from mem_bench the same way (src/test.cpp:218-305).

    Honest per the round-2 methodology notes: random data passed as a jit
    ARGUMENT (jnp.ones folds to a constant; closed-over arrays bake into the
    HLO), repeated async host dispatches with ONE fetch as the fence, and
    the separately-measured tunnel RTT subtracted. Emitting this next to
    the idealized 819 GB/s number makes the pct_of_measured_sol claim
    reproducible from the bench artifact alone."""
    import jax
    import jax.numpy as jnp
    from functools import partial as _partial
    rtt = measure_rtt()
    big = jax.random.normal(jax.random.PRNGKey(0), (16384, 16384),
                            jnp.bfloat16)  # 512 MB

    # The whole reduce loop runs ON DEVICE in ONE dispatch (fori_loop with
    # a serializing carry; the `b + c*0` add fuses into the reduce so each
    # step reads exactly big.size*2 bytes) — a host-side dispatch loop let
    # transient tunnel stalls land INSIDE the measured window, and the
    # two-size difference then swung 627-1219 GB/s call to call (a stall
    # in the short run INFLATES the implied bandwidth; the old max-of-3
    # amplified that into >spec readings on flaky-tunnel runs). With one
    # dispatch per measurement, jitter only touches the final fetch, which
    # the difference cancels; min-of-3 filters the rest.
    @jax.jit
    def probe(b, k):
        def body(i, c):
            return c * 1e-20 + jnp.sum((b + c * 0).astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    k_lo, k_hi = 64, 128
    _ = np.asarray(probe(big, jnp.int32(k_lo)))   # ONE compile (k traced)

    def run(k):
        t0 = time.perf_counter()
        _ = np.asarray(probe(big, jnp.int32(k)))
        return time.perf_counter() - t0

    t_hi = min(run(k_hi) for _ in range(3))
    t_lo = min(run(k_lo) for _ in range(3))
    dt = max(t_hi - t_lo, 1e-6) / (k_hi - k_lo)
    best = big.size * 2 / dt / 1e9
    log(f"measured HBM ceiling: {best:.0f} GB/s (rtt {rtt*1e3:.1f} ms)")
    return best


def build_cfg(preset: str, dtype: str):
    from yalm_tpu.config import ModelConfig
    if preset == "mistral7b":
        return ModelConfig(
            dim=4096, hidden_dim=14336, head_dim=128, n_layers=32, n_heads=32,
            n_kv_heads=8, vocab_size=32000, max_seq_len=4096, bos_token_id=1,
            eos_token_id=2, rope_theta=1e6, rotary_dim=128, norm_eps=1e-5,
            act_type="silu", weight_dtype=dtype,
        )
    if preset == "gemma2-9b":
        # Gemma2-9B shapes: sandwich norms + softcaps + 1:1 alternating
        # sliding windows (4096 window == the clamp, so the sliding masks
        # are live only under YALM_BENCH_CTX > 4096; the softcap/post-norm
        # kernel cost shows at any context). fp8 weights ~9.9 GB on v5e.
        return ModelConfig(
            dim=3584, hidden_dim=14336, head_dim=256, n_layers=42,
            n_heads=16, n_kv_heads=8, vocab_size=256128, max_seq_len=4096,
            bos_token_id=2, eos_token_id=1, rope_theta=10000.0,
            rotary_dim=256, norm_eps=1e-6, act_type="gelu",
            weight_dtype=dtype, embed_scale=3584.0 ** 0.5,
            has_post_norms=True, attn_softcap=50.0, final_softcap=30.0,
            sliding_window=4096, tie_word_embeddings=True,
            layer_sliding=tuple(1 if i % 2 == 0 else 0 for i in range(42)),
        )
    if preset == "gemma3-12b":
        # Gemma3-12B text shapes: 5:1 sliding pattern with a 1024 window —
        # sliding layers stream 1/4 of the KV at the full 4096 context
        # (the block-skipping fetch), dual per-layer rope, qk-norm.
        return ModelConfig(
            dim=3840, hidden_dim=15360, head_dim=256, n_layers=48,
            n_heads=16, n_kv_heads=8, vocab_size=262144, max_seq_len=4096,
            bos_token_id=2, eos_token_id=1, rope_theta=1e6,
            rotary_dim=256, norm_eps=1e-6, act_type="gelu",
            weight_dtype=dtype, embed_scale=3840.0 ** 0.5,
            tie_word_embeddings=True,
            has_post_norms=True, has_qk_norm=True, sliding_window=1024,
            layer_sliding=tuple(0 if (i + 1) % 6 == 0 else 1
                                for i in range(48)),
            rope_scale=("gemma3", 8.0, 10000.0),
        )
    if preset == "mixtral-l8":
        # Mixtral-8x7B expert/attention shapes at 8 of its 32 layers: the
        # FULL model is 47 GB at fp8 — over any single v5e's HBM (the
        # reference could not host it either) — so the depth is cut to fit
        # one chip (~12 GB fp8) while every per-layer dimension (8 experts
        # of 14336 hidden, routed top-2) stays real. Per-layer routed
        # decode cost is depth-independent, so full-depth throughput is
        # this number / 4 to first order.
        return ModelConfig(
            dim=4096, hidden_dim=14336, head_dim=128, n_layers=8,
            n_heads=32, n_kv_heads=8, vocab_size=32000, max_seq_len=4096,
            bos_token_id=1, eos_token_id=2, rope_theta=1e6, rotary_dim=128,
            norm_eps=1e-5, act_type="silu", weight_dtype=dtype,
            n_experts=8, n_experts_active=2,
        )
    if preset == "fasttiny":
        # smallest fast-path-capable shapes (head_dim 128): smoke-tests any
        # bench mode on CPU without the 7B footprint
        return ModelConfig(
            dim=256, hidden_dim=512, head_dim=128, n_layers=2, n_heads=4,
            n_kv_heads=2, vocab_size=512, max_seq_len=256, bos_token_id=1,
            eos_token_id=2, rope_theta=1e6, rotary_dim=128, norm_eps=1e-5,
            act_type="silu", weight_dtype=dtype, qkv_clip=30.0,
        )
    return ModelConfig(
        dim=1024, hidden_dim=4096, head_dim=64, n_layers=8, n_heads=16,
        n_kv_heads=8, vocab_size=32000, max_seq_len=4096, bos_token_id=1,
        eos_token_id=2, rope_theta=1e6, rotary_dim=64, act_type="silu",
        weight_dtype=dtype,
    )


def _synth_fast_weights(cfg, seed=0):
    """Random weights synthesized directly in the decode (FastWeights)
    layout, so device HBM never holds a transient second copy."""
    import jax
    import jax.numpy as jnp
    from yalm_tpu.models.fast import FastWeights

    from yalm_tpu.models.fast import FastScales

    int8 = cfg.weight_dtype == "int8"
    int4 = cfg.weight_dtype == "int4"
    wdt = {"fp32": jnp.float32, "fp16": jnp.float16, "bf16": jnp.bfloat16,
           "fp8": jnp.float8_e5m2, "int8": jnp.int8,
           "int4": jnp.uint8}[cfg.weight_dtype]
    key = jax.random.PRNGKey(seed)

    @partial(jax.jit, donate_argnums=(0,))
    def _fill(buf, sub, i):
        idx = (i,) + (jnp.int32(0),) * (buf.ndim - 1)
        return jax.lax.dynamic_update_slice(buf, sub, idx)

    def mk(k, *shape, scale=0.02):
        # hierarchical fold_in (tensor id, then chunk) keeps the random
        # streams disjoint across tensors; chunked rows keep the bf16
        # temporaries small without a dispatch per row. Chunks are written
        # IN PLACE into a donated buffer — a concatenate would transiently
        # double the tensor (gemma3-12b's 5.7 GB w13 stack OOM'd a 16 GB
        # v5e that way).
        tkey = jax.random.fold_in(key, k)
        rows = shape[0]
        chunk = max(1, min(rows, (64 << 20) // max(1, int(np.prod(shape[1:])) * 2)))
        out = jnp.zeros(shape, wdt if not (int8 or int4) else
                        (jnp.int8 if int8 else jnp.uint8)) \
            if rows > chunk else None
        for c, i in enumerate(range(0, rows, chunk)):
            n = min(chunk, rows - i)
            if int8:
                sub = jax.random.randint(jax.random.fold_in(tkey, c),
                                         (n,) + shape[1:], -127, 128, jnp.int8)
            elif int4:
                # random packed nibbles ARE random int4 weights
                sub = jax.random.randint(
                    jax.random.fold_in(tkey, c), (n,) + shape[1:], 0, 256,
                    jnp.int32).astype(jnp.uint8)
            else:
                sub = (jax.random.normal(jax.random.fold_in(tkey, c),
                                         (n,) + shape[1:], jnp.bfloat16)
                       * scale).astype(wdt)
            if out is None:
                return sub
            out = _fill(out, sub, i)
        return out

    nl = cfg.n_layers
    e = (cfg.n_experts,) if cfg.is_moe else ()
    scales = None
    if int4:
        # layer weights: packed nibbles + group scales (G, N); embed/head
        # stay int8 per-channel (mirrors the converter's int4 layout)
        from yalm_tpu.ops.pallas.gemv import int4_group
        d, h, q = cfg.dim, cfg.hidden_dim, cfg.q_dim
        nqkv = q + 2 * cfg.kv_dim
        s4 = jnp.float32(0.02 / 7.0)
        s8 = jnp.float32(0.02 / 127.0)
        scales = FastScales(
            embed=jnp.full((cfg.vocab_size,), s8),
            wqkv=jnp.full((nl, d // int4_group(d), nqkv), s4),
            wo=jnp.full((nl, q // int4_group(q), d), s4),
            w13=jnp.full((nl, *e, d // int4_group(d), 2 * h), s4),
            w2=jnp.full((nl, *e, h // int4_group(h), d), s4),
            lm_head=jnp.full((cfg.vocab_size,), s8),
            moegate=(jnp.full((nl, cfg.n_experts), s8) if cfg.is_moe
                     else None),
        )

        def mk8(k, *shape):
            sub = jax.random.randint(jax.random.fold_in(key, k), shape,
                                     -127, 128, jnp.int8)
            return sub

        emb4 = mk8(9, cfg.vocab_size, d)
        return FastWeights(
            embed=emb4,
            rms_att=jnp.ones((nl, d), jnp.float32),
            rms_ffn=jnp.ones((nl, d), jnp.float32),
            wqkv=mk(1, nl, nqkv, d // 2),
            wo=mk(4, nl, d, q // 2),
            w13=mk(5, nl, *e, 2 * h, d // 2),
            w2=mk(6, nl, *e, d, h // 2),
            final_norm=jnp.ones((d,), jnp.float32),
            # tied heads (Gemma-style) must not synth a second vocab x dim
            # buffer — at 262k vocab that is ~1 GB of HBM
            lm_head=(emb4 if cfg.tie_word_embeddings
                     else mk8(10, cfg.vocab_size, d)),
            moegate=(mk8(11, nl, cfg.n_experts, d) if cfg.is_moe
                     else None),
            scales=scales,
        )
    if int8:
        # per-row scales sized so dequantized weights match the float synth
        # magnitude (~N(0, 0.02))
        s = jnp.float32(0.02 / 127.0)
        scales = FastScales(
            embed=jnp.full((cfg.vocab_size,), s),
            wqkv=jnp.full((nl, cfg.q_dim + 2 * cfg.kv_dim), s),
            wo=jnp.full((nl, cfg.dim), s),
            w13=jnp.full((nl, *e, 2 * cfg.hidden_dim), s),
            w2=jnp.full((nl, *e, cfg.dim), s),
            lm_head=jnp.full((cfg.vocab_size,), s),
            moegate=(jnp.full((nl, cfg.n_experts), s) if cfg.is_moe
                     else None),
        )
    emb = mk(9, cfg.vocab_size, cfg.dim)
    return FastWeights(
        embed=emb,
        rms_att=jnp.ones((nl, cfg.dim), jnp.float32),
        rms_ffn=jnp.ones((nl, cfg.dim), jnp.float32),
        wqkv=mk(1, nl, cfg.q_dim + 2 * cfg.kv_dim, cfg.dim),
        wo=mk(4, nl, cfg.dim, cfg.q_dim),
        w13=mk(5, nl, *e, 2 * cfg.hidden_dim, cfg.dim),
        w2=mk(6, nl, *e, cfg.dim, cfg.hidden_dim),
        final_norm=jnp.ones((cfg.dim,), jnp.float32),
        lm_head=(emb if cfg.tie_word_embeddings
                 else mk(10, cfg.vocab_size, cfg.dim)),
        moegate=(mk(11, nl, cfg.n_experts, cfg.dim) if cfg.is_moe
                 else None),
        scales=scales,
        pa=(jnp.ones((nl, cfg.dim), jnp.float32)
            if cfg.has_post_norms else None),
        pf=(jnp.ones((nl, cfg.dim), jnp.float32)
            if cfg.has_post_norms else None),
        qnorm=(jnp.ones((nl, cfg.head_dim), jnp.float32)
               if cfg.has_qk_norm else None),
        knorm=(jnp.ones((nl, cfg.head_dim), jnp.float32)
               if cfg.has_qk_norm else None),
    )



def _slice_draft(weights, n: int):
    """First-n-layers draft built from the target's FastWeights: every
    per-layer stacked field truncated (incl. bias/qk-norm/scale stacks);
    embed/head/final-norm shared with the target."""
    rep = dict(rms_att=weights.rms_att[:n], rms_ffn=weights.rms_ffn[:n],
               wqkv=weights.wqkv[:n], wo=weights.wo[:n],
               w13=weights.w13[:n], w2=weights.w2[:n])
    if weights.bqkv is not None:
        rep["bqkv"] = weights.bqkv[:n]
    if weights.qnorm is not None:
        rep["qnorm"] = weights.qnorm[:n]
        rep["knorm"] = weights.knorm[:n]
    if weights.scales is not None:
        rep["scales"] = weights.scales._replace(
            wqkv=weights.scales.wqkv[:n], wo=weights.scales.wo[:n],
            w13=weights.scales.w13[:n], w2=weights.scales.w2[:n])
    return weights._replace(**rep)

def _device_reachable(timeout_s: int = 240) -> bool:
    """Probe the TPU from a SUBPROCESS: when the axon tunnel is down, the
    plugin's init hangs inside jax.devices() with no in-process timeout
    possible — a watchdogged child process is the only safe probe."""
    import subprocess
    import sys
    code = ("import jax, jax.numpy as jnp, numpy as np\n"
            "x = jnp.ones((128, 128), jnp.bfloat16)\n"
            "print(float(np.asarray(jnp.sum(x @ x))))\n")
    # the tunnel flakes TRANSIENTLY: round 4's sweep recorded a 0 because a
    # single probe failed and the identical probe succeeded 60 s later —
    # retry with backoff before declaring the device gone
    for attempt in range(4):
        if attempt:
            delay = 20 * attempt
            log(f"device probe attempt {attempt} failed; retrying in {delay}s")
            time.sleep(delay)
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s, capture_output=True,
                               cwd="/root/repo")
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def main() -> None:
    probe_needed = True
    if "jax" in sys.modules:
        import jax
        if (jax.config.jax_platforms or "") == "cpu":
            probe_needed = False
        else:
            # a backend already initialized in THIS process proves the
            # device is reachable — and holds it exclusively, so a
            # subprocess probe would false-fail (never run two TPU
            # processes at once)
            from jax._src import xla_bridge as _xb
            if getattr(_xb, "_backends", None):
                probe_needed = False
    if probe_needed and not _device_reachable():
        # fail FAST with a diagnostic artifact instead of hanging the
        # driver: the TPU tunnel is unreachable (plugin init blocks)
        log("TPU unreachable: device probe subprocess hung/failed")
        print(json.dumps({
            "metric": "decode_throughput",
            "value": 0,
            "unit": "tok/s",
            "vs_baseline": 0,
            "error": "tpu-tunnel-unreachable (device probe timed out; "
                     "plugin init hangs when the tunnel is down)",
        }))
        raise SystemExit(1)
    dtype = os.environ.get("YALM_BENCH_DTYPE", "int4")
    # 128 decode steps per on-device block: the sampled ids are fetched once
    # per block, so the dev-tunnel's ~26 ms dispatch+fetch round trip (pure
    # harness artifact; a host-attached TPU dispatches in ~µs) adds ~0.2
    # ms/token instead of dominating a per-token loop.
    steps = int(os.environ.get("YALM_BENCH_STEPS", "128"))
    preset = os.environ.get("YALM_BENCH_PRESET", "mistral7b")
    kv = os.environ.get("YALM_BENCH_KV", "fp8")

    import jax
    import jax.numpy as jnp
    from yalm_tpu.models.cache import KVCache
    from yalm_tpu.sampler import sample

    from yalm_tpu.engine import Engine

    dev = jax.devices()[0]
    log(f"device: {dev} | preset={preset} dtype={dtype} kv={kv} steps={steps}")
    cfg = build_cfg(preset, dtype)
    ctx = int(os.environ.get("YALM_BENCH_CTX", "0"))
    if ctx:
        # context override (e.g. 8192 makes gemma2-9b's 4096 sliding
        # windows live); window must stay kernel-tileable (% 8)
        import dataclasses as _dc
        cfg = _dc.replace(cfg, max_seq_len=ctx)
    kv_dtype = {"bf16": jnp.bfloat16, "fp8": jnp.float8_e5m2}[kv]
    kv_bytes = jnp.dtype(kv_dtype).itemsize

    t0 = time.perf_counter()
    weights = _synth_fast_weights(cfg)
    jax.block_until_ready(weights)
    log(f"weights synthesized in {time.perf_counter()-t0:.1f}s "
        f"({cfg.active_bytes(0)/1e9:.2f} GB active bytes/token)")

    batch = int(os.environ.get("YALM_BENCH_BATCH", "0"))
    if batch:
        return bench_batched(cfg, weights, batch, steps, kv_dtype, kv)
    pbatch = int(os.environ.get("YALM_BENCH_PAGED_BATCH", "0"))
    if pbatch:
        return bench_paged(cfg, weights, pbatch, steps, kv_dtype, kv)
    if os.environ.get("YALM_BENCH_SPEC", "") == "accept":
        return bench_spec_accept(cfg, weights, kv_dtype)
    if os.environ.get("YALM_BENCH_SPEC", "") == "accept-medusa":
        return bench_spec_accept_medusa(cfg, weights, kv_dtype)
    if os.environ.get("YALM_BENCH_SPEC", "").startswith("sched"):
        return bench_spec_sched(cfg, weights, kv_dtype)
    if os.environ.get("YALM_BENCH_SPEC"):
        return bench_spec(cfg, weights, kv_dtype)
    if os.environ.get("YALM_BENCH_PREFILL"):
        return bench_prefill(cfg, weights)

    eng = Engine(cfg, weights, kv_dtype=kv_dtype, compute_dtype=jnp.bfloat16,
                 fast=True)
    key = jax.random.PRNGKey(0)
    # Decode at temperature 1.0: SYNTHETIC weights make greedy decode
    # collapse to one repeated token on several presets (softcap saturation
    # on gemma2, tied-head logit bias on gemma3) — an artifact of random
    # weights, not a kernel bug — which trips the degeneracy assert.
    # Sampling keeps the assert meaningful at identical cost: `sample`
    # evaluates both the argmax and the categorical branch either way
    # (temperature is data, one compiled program).
    temp = jnp.float32(1.0)

    # The decode loop runs ON DEVICE in blocks (engine._decode_block), so
    # host dispatch cost is amortized over the whole block; a host fetch of
    # the sampled ids delimits the measurement (block_until_ready alone does
    # not reliably fence on relayed device platforms). The warmup block uses
    # the SAME static n as the measured blocks — a different n is a
    # different compiled program, and its compile time would pollute the
    # measurement. Median of 3 repeats guards against machine noise.
    t0 = time.perf_counter()
    out, cache = eng._decode_block(weights, jnp.int32(1), jnp.int32(0),
                                   eng.cache, key, temp, n=steps)
    _ = np.asarray(out)
    log(f"compile+first {steps}-step block: {time.perf_counter()-t0:.1f}s")

    times = []
    pos0 = steps
    for rep in range(4):
        t0 = time.perf_counter()
        out, cache = eng._decode_block(weights, jnp.int32(int(out[-1])),
                                       jnp.int32(pos0), cache, key, temp, n=steps)
        toks = np.asarray(out)  # host fetch = completion fence
        times.append(time.perf_counter() - t0)
        pos0 += steps
        log(f"  rep {rep}: {steps/times[-1]:.2f} tok/s")
    assert len(set(toks.tolist())) > 1 or steps < 4, "degenerate decode"
    # rep 0 is reliably a clock-ramp outlier right after the long compile
    # (45-61 tok/s vs 94-96 steady-state); median of the steady reps
    dt = sorted(times[1:])[1]

    tok_s = steps / dt
    # speed-of-light context: idealized (v5e spec sheet) AND measured (the
    # machine's actual streaming ceiling, probed in this same run so the
    # roofline defense is reproducible from the artifact)
    hbm_gbs = 819.0  # v5e spec
    measured_gbs = measure_hbm_ceiling()
    sol = hbm_gbs * 1e9 / cfg.active_bytes(pos0 + steps, kv_bytes)
    msol = measured_gbs * 1e9 / cfg.active_bytes(pos0 + steps, kv_bytes)
    log(f"decode: {tok_s:.2f} tok/s ({dt/steps*1e3:.2f} ms/tok); "
        f"idealized SoL ~{sol:.1f} tok/s -> {100*tok_s/sol:.1f}%; "
        f"measured SoL ~{msol:.1f} tok/s -> {100*tok_s/msol:.1f}%")

    result = {
        "metric": f"{preset}_{dtype}_decode_throughput",
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
        "pct_of_sol": round(100 * tok_s / sol, 1),
        "measured_ceiling_gbps": round(measured_gbs, 1),
        "pct_of_measured_sol": round(100 * tok_s / msol, 1),
        "kv_dtype": kv,
    }
    try:
        # full-window regime: positions past max_seq_len attend the whole
        # ring buffer every step (the reference's long-generation row,
        # README.md:14). Best-effort: a slow compile tunnel must not cost
        # the primary metric.
        fw_pos = cfg.max_seq_len + 8
        out, cache = eng._decode_block(weights, jnp.int32(int(out[-1])),
                                       jnp.int32(fw_pos), cache, key, temp,
                                       n=steps)
        _ = np.asarray(out)
        fw_times = []
        for rep in range(3):
            t0 = time.perf_counter()
            out, cache = eng._decode_block(weights, jnp.int32(int(out[-1])),
                                           jnp.int32(fw_pos + (rep + 1) * steps),
                                           cache, key, temp, n=steps)
            _ = np.asarray(out)
            fw_times.append(time.perf_counter() - t0)
        fw_tok_s = steps / sorted(fw_times)[1]
        fw_sol = hbm_gbs * 1e9 / cfg.active_bytes(cfg.max_seq_len, kv_bytes)
        fw_msol = measured_gbs * 1e9 / cfg.active_bytes(cfg.max_seq_len, kv_bytes)
        log(f"full-window decode: {fw_tok_s:.2f} tok/s; idealized ~{fw_sol:.1f} "
            f"-> {100*fw_tok_s/fw_sol:.1f}%; measured -> "
            f"{100*fw_tok_s/fw_msol:.1f}%")
        result["full_window_tok_s"] = round(fw_tok_s, 2)
        result["full_window_pct_of_sol"] = round(100 * fw_tok_s / fw_sol, 1)
        result["full_window_pct_of_measured_sol"] = round(
            100 * fw_tok_s / fw_msol, 1)
    except Exception as e:  # noqa: BLE001
        log(f"full-window phase skipped: {e}")
    print(json.dumps(result))


def bench_batched(cfg, weights, batch: int, steps: int, kv_dtype=None,
                  kv: str = "bf16") -> None:
    """Continuous-batching aggregate throughput (new capability vs the
    single-stream reference; B sequences decode against one weight stream)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from yalm_tpu.models.cache import KVCache
    from yalm_tpu.models.fast import decode_step_fast_batched, fast_batched_supported
    from yalm_tpu.sampler import sample

    if batch % 8 or not fast_batched_supported(cfg):
        raise SystemExit(f"YALM_BENCH_BATCH={batch} needs batch % 8 == 0 and a "
                         f"fast-batched-supported config (dense, head_dim % 128 == 0)")

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(1,))
    def blk(w, cache, tokens, pos0, key, n):
        def body(i, carry):
            toks, cache, key = carry
            logits, cache = decode_step_fast_batched(cfg, w, toks, pos0 + i, cache)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, toks.shape[0])
            nxt = jax.vmap(sample)(logits, keys, jnp.zeros(toks.shape[0]))
            return nxt, cache, key
        toks, cache, _ = jax.lax.fori_loop(0, n, body, (tokens, cache, key))
        return toks, cache

    cache = KVCache.init(cfg, kv_dtype or jnp.bfloat16, batch=batch)
    toks = jnp.ones((batch,), jnp.int32)
    pos = jnp.zeros((batch,), jnp.int32)
    t0 = time.perf_counter()
    out, cache = blk(weights, cache, toks, pos, jax.random.PRNGKey(0), n=steps)
    _ = np.asarray(out)
    log(f"compile+first {steps}-step block: {time.perf_counter()-t0:.1f}s")
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        out, cache = blk(weights, cache, toks, pos + steps * (rep + 1),
                         jax.random.PRNGKey(0), n=steps)
        _ = np.asarray(out)
        times.append(time.perf_counter() - t0)
        log(f"  rep {rep}: {batch*steps/times[-1]:.1f} tok/s aggregate")
    dt = sorted(times)[1]
    agg = batch * steps / dt
    print(json.dumps({
        "metric": f"{cfg.weight_dtype}_batch{batch}_decode_throughput",
        "value": round(agg, 1),
        "unit": "tok/s",
        "vs_baseline": round(agg / BASELINE_TOK_S, 3),
        "kv_dtype": kv,
    }))


def bench_spec(cfg, weights, kv_dtype=None) -> None:
    """Speculative-decoding throughput: target = the 7B synth model, draft
    = its first 4 layers (sharing embed/head/early blocks, so proposals are
    CORRELATED with the target — the realistic regime a distilled draft
    approximates; two independent random models would agree at chance).

    YALM_BENCH_SPEC=lookup swaps the draft for PROMPT LOOKUP (n-gram
    proposals from the token history, zero draft compute) over a
    repetitive prompt — the input-grounded regime the technique targets.

    Emits acceptance rate, tokens per target sweep, and wall + RTT-corrected
    tok/s. The dev tunnel adds ~26 ms per host round-trip and speculation
    needs TWO per round (draft fetch + verify fetch; one for lookup) — pure
    harness artifact, measured in-run and subtracted for the corrected
    number (a host-attached TPU pays µs)."""
    import jax
    import jax.numpy as jnp
    import dataclasses
    from yalm_tpu.engine import Engine

    rtt = measure_rtt()
    mode = os.environ.get("YALM_BENCH_SPEC", "")
    lookup = mode == "lookup"
    medusa = mode == "medusa"
    target = Engine(cfg, weights, kv_dtype=kv_dtype or jnp.bfloat16,
                    compute_dtype=jnp.bfloat16, fast=True)
    if medusa:
        # self-drafting: synthesize identity heads on the fly (random
        # benches measure sweep mechanics; acceptance needs real heads)
        from yalm_tpu.medusa import MedusaWeights
        H, d, v = 4, cfg.dim, cfg.vocab_size
        target.medusa = MedusaWeights(
            w1=jnp.zeros((H, d, d), jnp.bfloat16),
            b1=jnp.zeros((H, d), jnp.float32),
            head=jnp.broadcast_to(
                weights.lm_head.astype(jnp.bfloat16)[None], (H, v, d)))
        draft = None
    elif lookup:
        # draft-model-free prompt lookup: proposals come from the token
        # history, so the bench prompt repeats a span (the input-grounded
        # regime — summarization/code-edit outputs that reuse prompt text)
        draft = None
    else:
        dl = min(4, cfg.n_layers)
        dcfg = dataclasses.replace(cfg, n_layers=dl)
        draft_w = _slice_draft(weights, dl)
        draft = Engine(dcfg, draft_w, kv_dtype=kv_dtype or jnp.bfloat16,
                       compute_dtype=jnp.bfloat16, fast=True)

    N = int(os.environ.get("YALM_BENCH_SPEC_TOKENS", "96"))
    K = int(os.environ.get("YALM_BENCH_SPEC_K", "4"))
    prompt = ([1, 7, 9] + [5, 11, 23, 42] * 8) if lookup else [1, 7, 9]

    def run(n):
        if medusa:
            return list(target.generate_medusa(prompt, max_steps=n))
        return list(target.generate_speculative(prompt, draft=draft,
                                                n_draft=K, max_steps=n))

    # warmup compiles every program in the loop
    _ = run(8)
    target.reset()
    if draft is not None:
        draft.reset()
    t0 = time.perf_counter()
    toks = run(N)
    dt = time.perf_counter() - t0
    st = target._spec_stats
    rounds = max(st["rounds"], 1)
    proposed = st.get("proposed", rounds * K)
    acc = st["accepted"] / max(proposed, 1)
    tpr = len(toks) / (rounds + st.get("plain", 0))
    # host round trips per round ride the tunnel (draft fetch + verify
    # fetch; lookup proposals are host-side, one fetch); subtract them
    trips = (rounds + st.get("plain", 0) if lookup
             else 2 * rounds + st.get("plain", 0) if medusa
             else 2 * rounds)
    dt_corr = max(dt - trips * rtt, 1e-6)

    # plain-decode reference from the same engine/cache setup
    target.reset()
    key = jax.random.PRNGKey(0)
    out, cache = target._decode_block(target.weights, jnp.int32(1),
                                      jnp.int32(0), target.cache, key,
                                      jnp.float32(0.0), n=64)
    _ = np.asarray(out)
    t0 = time.perf_counter()
    out, cache = target._decode_block(target.weights, jnp.int32(int(out[-1])),
                                      jnp.int32(64), cache, key,
                                      jnp.float32(0.0), n=64)
    _ = np.asarray(out)
    plain = 64 / (time.perf_counter() - t0)

    kind = "medusa" if medusa else "lookup" if lookup else "draft"
    log(f"spec[{kind}]: {len(toks)} toks in {dt:.2f}s wall "
        f"({len(toks)/dt:.1f} tok/s; rtt-corrected {len(toks)/dt_corr:.1f}), "
        f"acceptance {acc:.2f}, {tpr:.2f} tok/target-sweep; "
        f"plain decode {plain:.1f} tok/s")
    print(json.dumps({
        "metric": f"{cfg.weight_dtype}_speculative_decode_{kind}",
        "value": round(len(toks) / dt_corr, 2),
        "unit": "tok/s",
        "vs_baseline": round(len(toks) / dt_corr / BASELINE_TOK_S, 3),
        "acceptance_rate": round(acc, 3),
        "tokens_per_target_sweep": round(tpr, 2),
        "wall_tok_s": round(len(toks) / dt, 2),
        "plain_decode_tok_s": round(plain, 2),
        "draft_layers": 4 if kind == "draft" else None,
        "n_draft": K,
        "plain_steps": st.get("plain"),
    }))


def bench_spec_sched(cfg, weights, kv_dtype=None) -> None:
    """SCHEDULER-level speculation throughput: B concurrent greedy lanes,
    per-round either K+1 batched draft ticks (YALM_BENCH_SPEC=sched; draft
    = target's first 4 layers) or per-lane prompt lookup
    (YALM_BENCH_SPEC=sched-lookup), one batched verify sweep for all lanes.
    Reference aggregate: the plain batched scheduler on the same requests.
    The scheduler host loop syncs once per round; the tunnel's ~26 ms RTT
    is measured in-run and subtracted for the corrected number."""
    import dataclasses
    import jax.numpy as jnp
    from yalm_tpu.scheduler import Request, Scheduler

    rtt = measure_rtt()
    mode = os.environ.get("YALM_BENCH_SPEC", "")
    lookup = mode == "sched-lookup"
    medusa = mode == "sched-medusa"
    B = int(os.environ.get("YALM_BENCH_SPEC_BATCH", "8"))
    N = int(os.environ.get("YALM_BENCH_SPEC_TOKENS", "96"))
    K = int(os.environ.get("YALM_BENCH_SPEC_K", "4"))
    kv = kv_dtype or jnp.bfloat16

    kwargs = {}
    if lookup:
        kwargs["spec_lookup"] = True
        prompt = [1, 7, 9] + [5, 11, 23, 42] * 8
    elif medusa:
        # identity heads (head = lm_head): measure the sweep + on-device
        # head mechanics; acceptance needs trained heads
        from yalm_tpu.medusa import MedusaWeights
        H, d, v = K, cfg.dim, cfg.vocab_size
        kwargs["spec_medusa"] = MedusaWeights(
            w1=jnp.zeros((H, d, d), jnp.bfloat16),
            b1=jnp.zeros((H, d), jnp.float32),
            head=jnp.broadcast_to(
                weights.lm_head.astype(jnp.bfloat16)[None], (H, v, d)))
        prompt = [1, 7, 9]
    else:
        dl = min(4, cfg.n_layers)
        dcfg = dataclasses.replace(cfg, n_layers=dl)
        kwargs["spec_draft"] = (dcfg, _slice_draft(weights, dl))
        prompt = [1, 7, 9]

    def reqs():
        return [Request(prompt_tokens=list(prompt), max_new_tokens=N,
                        temperature=0.0, seed=i) for i in range(B)]

    def run(sched):
        rs = reqs()
        for r in rs:
            sched.submit(r)
        # warm the compiled programs on a throwaway pass, then reset: too
        # expensive at 7B — instead time from the 2nd step; compile cost is
        # measured separately below
        t0 = time.perf_counter()
        ticks = 0
        while sched.queue or sched.n_active:
            sched.step()
            ticks += 1
        dt = time.perf_counter() - t0
        toks = sum(len(r.generated) for r in rs)
        return toks, dt, ticks

    sp = Scheduler(cfg, weights, batch=B, kv_dtype=kv, spec_k=K, **kwargs)
    t0 = time.perf_counter()
    toks, dt, ticks = run(sp)  # includes compiles; report the 2nd pass
    log(f"spec-sched warm pass: {toks} toks in {dt:.1f}s (compiles included)")
    sp.spec_stats.update(rounds=0, accepted=0, proposed=0)
    toks, dt, ticks = run(sp)
    st = sp.spec_stats
    # one host sync per scheduler step rides the tunnel
    dt_corr = max(dt - ticks * rtt, 1e-6)

    plain = Scheduler(cfg, weights, batch=B, kv_dtype=kv)
    run(plain)  # compile pass
    ptoks, pdt, pticks = run(plain)
    pdt_corr = max(pdt - pticks * rtt, 1e-6)

    acc = st["accepted"] / max(st.get("proposed", 0), 1)
    kind = "medusa" if medusa else "lookup" if lookup else "draft"
    log(f"spec-sched[{kind}] B={B}: {toks} toks {toks/dt:.1f} tok/s wall "
        f"({toks/dt_corr:.1f} rtt-corrected), acceptance {acc:.2f}, "
        f"{st['rounds']} verify rounds; plain {ptoks/pdt_corr:.1f} tok/s")
    print(json.dumps({
        "metric": f"{cfg.weight_dtype}_spec_sched_{kind}_b{B}",
        "value": round(toks / dt_corr, 2),
        "unit": "tok/s",
        "vs_baseline": round(toks / dt_corr / BASELINE_TOK_S, 3),
        "acceptance_rate": round(acc, 3),
        "verify_rounds": st["rounds"],
        "wall_tok_s": round(toks / dt, 2),
        "plain_sched_tok_s": round(ptoks / pdt_corr, 2),
        "batch": B, "n_draft": K,
    }))


def bench_spec_accept(cfg, weights, kv_dtype=None) -> None:
    """ACCEPTANCE-SWEEP speculation bench: scheduler tok/s as a function of
    draft acceptance, with REAL costs on both sides.

    Construction: the target's layers >= 4 get wo = 0 and w2 = 0 — their
    attention/FFN deltas vanish, so the 32-layer target computes exactly
    what its first 4 layers compute (while still streaming every weight
    byte: wqkv/w13 are read, wo/w2 are read as zeros). A 4-layer sliced
    draft therefore proposes the target's own argmax — acceptance ~1.0 at
    REAL target-verify cost and REAL draft-tick cost. A host-side wrapper
    then corrupts each proposed token with probability 1-p, dialing
    acceptance to ~p without touching any model math (rejections and
    corrections flow through the production verify pack).

    YALM_BENCH_SPEC_ACCEPT="1.0,0.75,0.5,0.25" sets the sweep; emits ONE
    JSON line with a row per point + the plain-scheduler reference, so
    BASELINE.md can state the break-even acceptance (VERDICT r4 #6).
    """
    import dataclasses
    import jax
    import jax.numpy as jnp
    from yalm_tpu.scheduler import Request, Scheduler

    rtt = measure_rtt()
    ps = [float(s) for s in os.environ.get(
        "YALM_BENCH_SPEC_ACCEPT", "1.0,0.75,0.5,0.25").split(",")]
    B = int(os.environ.get("YALM_BENCH_SPEC_BATCH", "8"))
    N = int(os.environ.get("YALM_BENCH_SPEC_TOKENS", "96"))
    K = int(os.environ.get("YALM_BENCH_SPEC_K", "4"))
    kv = kv_dtype or jnp.bfloat16
    dl = min(4, cfg.n_layers)

    # zero the deep layers' output projections IN PLACE (donated buffers:
    # no transient second copy of the 7B stack). Packed int4's zero weight
    # is nibble 8 (offset-8 storage) -> fill byte 0x88.
    @partial(jax.jit, donate_argnums=(0,))
    def zero_tail(w):
        fill = 0x88 if w.dtype == jnp.uint8 else 0
        return w.at[dl:].set(jnp.asarray(fill, w.dtype))

    weights = weights._replace(wo=zero_tail(weights.wo),
                               w2=zero_tail(weights.w2))
    dcfg = dataclasses.replace(cfg, n_layers=dl)
    draft_w = _slice_draft(weights, dl)
    prompt = [1, 7, 9]

    def reqs():
        return [Request(prompt_tokens=list(prompt), max_new_tokens=N,
                        temperature=0.0, seed=i) for i in range(B)]

    def run(sched):
        rs = reqs()
        for r in rs:
            sched.submit(r)
        t0 = time.perf_counter()
        ticks = 0
        while sched.queue or sched.n_active:
            sched.step()
            ticks += 1
        dt = time.perf_counter() - t0
        return sum(len(r.generated) for r in rs), dt, ticks

    # rtt correction floor: on CPU smoke runs the model is faster than the
    # "rtt" itself — never credit more than 90% of wall to the tunnel
    def corr(dt, ticks):
        return max(dt - ticks * rtt, 0.1 * dt)

    plain = Scheduler(cfg, weights, batch=B, kv_dtype=kv)
    run(plain)  # compile pass
    ptoks, pdt, pticks = run(plain)
    plain_tps = ptoks / corr(pdt, pticks)
    log(f"plain sched: {plain_tps:.1f} tok/s rtt-corrected")
    plain = None  # free its 2+ GB cache before the spec schedulers allocate

    rows = []
    rng = np.random.default_rng(0)
    # ONE scheduler reused across sweep points: per-point construction
    # fragmented HBM (2.4 GB of caches re-allocated 4x next to the 7B
    # weights) and OOM'd the last point; slots free as requests finish,
    # so fresh submissions just reuse them
    cur = {"p": 1.0}
    sched = Scheduler(cfg, weights, batch=B, kv_dtype=kv, spec_k=K,
                      spec_draft=(dcfg, draft_w))
    orig = sched._draft_propose

    def corrupted(dw, tokens, positions, dcache, write):
        out, dcache = orig(dw, tokens, positions, dcache, write)
        arr = np.asarray(out)
        flip = rng.random(arr.shape) > cur["p"]
        arr = np.where(flip, (arr + 1) % cfg.vocab_size, arr)
        return jnp.asarray(arr, jnp.int32), dcache

    sched._draft_propose = corrupted
    run(sched)  # compile pass
    for p in ps:
        cur["p"] = p
        sched.spec_stats.update(rounds=0, accepted=0, proposed=0)
        toks, dt, ticks = run(sched)
        st = sched.spec_stats
        acc = st["accepted"] / max(st.get("proposed", 1), 1)
        # each spec round costs TWO host fetches (draft proposals +
        # verify pack); ticks counts one per step
        tps = toks / corr(dt, ticks + st["rounds"])
        log(f"p={p}: acceptance {acc:.2f}, {tps:.1f} tok/s rtt-corrected "
            f"({st['rounds']} rounds, {toks} toks)")
        rows.append({"target_p": p, "acceptance": round(acc, 3),
                     "tok_s": round(tps, 2),
                     "speedup_vs_plain": round(tps / plain_tps, 3),
                     "rounds": st["rounds"]})

    best = max(rows, key=lambda r: r["tok_s"])
    print(json.dumps({
        "metric": f"{cfg.weight_dtype}_spec_accept_sweep_b{B}",
        "value": best["tok_s"],
        "unit": "tok/s",
        "vs_baseline": round(best["tok_s"] / BASELINE_TOK_S, 3),
        "plain_sched_tok_s": round(plain_tps, 2),
        "sweep": rows,
        "batch": B, "n_draft": K, "draft_layers": dl,
    }))


def bench_spec_accept_medusa(cfg, weights, kv_dtype=None) -> None:
    """TREE vs CHAIN Medusa at EQUAL per-candidate acceptance — the
    round-5 datapoint that tree attention pays: at per-candidate survival
    p, a k-wide tree advances a depth with probability 1-(1-p)^k vs the
    chain's p, for the SAME verify-sweep cost structure.

    Candidates are INJECTED: each mode first runs uninjected to record its
    own exact T=0 stream, then re-runs with banked candidates rewritten
    after every round — the true next tokens corrupted independently with
    probability 1-p (rank 2 of the tree gets an independent draw). Head
    compute still runs on device every round (realistic cost); only the
    banked ids are overwritten. Emitted streams stay exact by construction
    (point-mass verification).

    YALM_BENCH_SPEC_ACCEPT sets the sweep. One JSON line with per-p rows
    for chain and tree + the plain reference."""
    import jax.numpy as jnp
    from yalm_tpu.medusa import MedusaWeights
    from yalm_tpu.scheduler import Request, Scheduler

    rtt = measure_rtt()
    ps = [float(s) for s in os.environ.get(
        "YALM_BENCH_SPEC_ACCEPT", "1.0,0.75,0.5").split(",")]
    B = int(os.environ.get("YALM_BENCH_SPEC_BATCH", "8"))
    # 48-token requests: tree rows are path-dependent at the f32-reduction
    # level (ancestors attend at chunk indices, not cache slots), so a
    # measured run's stream drifts off the recorded oracle at rare
    # near-ties (~1/50 tokens at 7B) — keep requests inside the horizon
    # and stop injecting on any lane that diverges (logged below)
    N = int(os.environ.get("YALM_BENCH_SPEC_TOKENS", "48"))
    D = int(os.environ.get("YALM_BENCH_SPEC_DEPTH", "2"))
    KT = int(os.environ.get("YALM_BENCH_SPEC_TREEK", "2"))
    kv = kv_dtype or jnp.bfloat16
    V = cfg.vocab_size
    prompt = [1, 7, 9]

    def corr(dt, ticks):
        return max(dt - ticks * rtt, 0.1 * dt)

    mw = MedusaWeights(
        w1=jnp.zeros((D, cfg.dim, cfg.dim), jnp.bfloat16),
        b1=jnp.zeros((D, cfg.dim), jnp.float32),
        head=jnp.broadcast_to(weights.lm_head.astype(jnp.bfloat16)[None],
                              (D, V, cfg.dim)))

    def reqs():
        return [Request(prompt_tokens=list(prompt), max_new_tokens=N,
                        temperature=0.0, seed=i) for i in range(B)]

    def mk(tree: bool):
        kw = dict(spec_medusa=mw, spec_k=D)
        if tree:
            kw["spec_tree"] = tuple([KT] * D)
        return Scheduler(cfg, weights, batch=B, kv_dtype=kv, **kw)

    def drive(sched, rs, bank=None):
        t0 = time.perf_counter()
        ticks = 0
        while sched.queue or sched.n_active:
            sched.step()
            ticks += 1
            if bank is not None:
                for s in sched.slots:
                    if s.request is None or not s.med_props:
                        continue
                    bank(s)
        return time.perf_counter() - t0, ticks

    rng = np.random.default_rng(0)

    diverged = set()

    def bank_for(tree, p, req_stream):
        def bank(s):
            st = req_stream.get(id(s.request))
            if st is None:
                return
            n = len(s.request.generated)
            if s.request.generated != st[:n]:
                # this lane's trajectory left the recorded oracle (tree
                # near-tie); its future is unknown — leave the device
                # head proposals in place from here on
                diverged.add(id(s.request))
                return
            tr = [st[n + d] if n + d < len(st) else 0 for d in range(D)]
            if tree:
                s.med_props = [
                    [int(t) if rng.random() < p else int((t + 1 + c) % V)
                     for c in range(KT)] for t in tr]
            else:
                s.med_props = [int(t) if rng.random() < p
                               else int((t + 1) % V) for t in tr]
        return bank

    # plain reference
    plain = Scheduler(cfg, weights, batch=B, kv_dtype=kv)
    rs = reqs()
    for r in rs:
        plain.submit(r)
    drive(plain, rs)  # compile pass folded into the run; re-run timed
    rs = reqs()
    for r in rs:
        plain.submit(r)
    pdt, pticks = drive(plain, rs)
    plain_tps = sum(len(r.generated) for r in rs) / corr(pdt, pticks)
    plain = None
    log(f"plain sched: {plain_tps:.1f} tok/s rtt-corrected")

    rng = np.random.default_rng(0)
    rows = []
    for tree in (False, True):
        # ONE scheduler per mode, reused across sweep points (per-point
        # construction fragments HBM next to the 7B weights); the first
        # uninjected run compiles everything AND records the mode's own
        # exact stream for candidate injection
        sched = mk(tree)
        rs = reqs()
        for r in rs:
            sched.submit(r)
        drive(sched, rs)
        streams = [list(r.generated) for r in rs]
        for p in ps:
            sched.spec_stats.update(rounds=0, accepted=0, proposed=0)
            rs = reqs()
            for r in rs:
                sched.submit(r)
            req_stream = {id(r): streams[i] for i, r in enumerate(rs)}
            dt, ticks = drive(sched, rs, bank_for(tree, p, req_stream))
            st = sched.spec_stats
            toks = sum(len(r.generated) for r in rs)
            acc = st["accepted"] / max(st.get("proposed", 1), 1)
            # medusa rounds cost one fetch (the verify pack carries the
            # next proposals); ticks already counts it
            tps = toks / corr(dt, ticks)
            name = "tree" if tree else "chain"
            log(f"{name} p={p}: acceptance {acc:.2f}, {tps:.1f} tok/s "
                f"({st['rounds']} rounds, {len(diverged)} diverged lanes)")
            diverged.clear()
            rows.append({"mode": name, "per_candidate_p": p,
                         "acceptance": round(acc, 3),
                         "tok_s": round(tps, 2),
                         "speedup_vs_plain": round(tps / plain_tps, 3),
                         "rounds": st["rounds"]})
        sched = None

    best = max(rows, key=lambda r: r["tok_s"])
    print(json.dumps({
        "metric": f"{cfg.weight_dtype}_medusa_tree_vs_chain_b{B}",
        "value": best["tok_s"],
        "unit": "tok/s",
        "vs_baseline": round(best["tok_s"] / BASELINE_TOK_S, 3),
        "plain_sched_tok_s": round(plain_tps, 2),
        "sweep": rows,
        "batch": B, "depth": D, "tree_k": KT,
    }))


def bench_prefill(cfg, weights) -> None:
    """Chunked prefill throughput: 256-token chunks hydrating the cache
    (the reference hydrates token-at-a-time, src/main.cpp:91-97)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from yalm_tpu.models.cache import KVCache
    from yalm_tpu.models.fast import prefill_fast

    T = 256
    n_chunks = 8  # 2048 tokens per dispatch

    @partial(jax.jit, donate_argnums=(1,))
    def run(w, cache, tokens):
        def body(i, c):
            _, c = prefill_fast(cfg, w, tokens, i * T, jnp.int32(T), c,
                                logits_mode="none")
            return c
        return jax.lax.fori_loop(0, n_chunks, body, cache)

    cache = KVCache.init(cfg, jnp.bfloat16)
    toks = jnp.ones((T,), jnp.int32)
    cache = run(weights, cache, toks)
    _ = np.asarray(cache.k[0, 0, 0])
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        cache = run(weights, cache, toks)
        _ = np.asarray(cache.k[0, 0, 0])
        times.append(time.perf_counter() - t0)
        log(f"  rep {rep}: {n_chunks*T/times[-1]:.0f} tok/s prefill")
    dt = sorted(times)[1]
    print(json.dumps({
        "metric": f"{cfg.weight_dtype}_prefill_throughput",
        "value": round(n_chunks * T / dt, 1),
        "unit": "tok/s",
        "vs_baseline": round((n_chunks * T / dt) / BASELINE_TOK_S, 3),
    }))


def bench_paged(cfg, weights, batch: int, steps: int, kv_dtype=None,
                kv: str = "bf16") -> None:
    """Aggregate throughput with the PAGED cache at a batch the dense
    cache cannot hold: lanes at ~512-token contexts own 2 pages each, so
    batch 32 costs ~2.2 GB of cache instead of the dense ~17 GB (> HBM
    alongside the 7B weights). Demonstrates the occupancy contract of
    models/paged.py at full speed."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from yalm_tpu.models.fast import decode_step_fast_batched_paged
    from yalm_tpu.models.paged import PagedKVPool
    from yalm_tpu.sampler import sample

    page = 256
    blocks = 2                      # lanes decode inside the first 2 pages
    n_pages = 1 + batch * blocks
    pool = PagedKVPool.init(cfg, kv_dtype or jnp.bfloat16, n_pages, page)
    tables = np.zeros((batch, cfg.max_seq_len // page), np.int32)
    for b in range(batch):
        for k in range(blocks):
            tables[b, k] = 1 + b * blocks + k
    tables = jnp.asarray(tables)
    kvb = jnp.dtype(kv_dtype or jnp.bfloat16).itemsize
    gb = (2 * n_pages * cfg.n_layers * page * cfg.kv_dim * kvb) / 1e9
    log(f"paged pool: {n_pages} pages ({gb:.2f} GB cache for batch {batch}; "
        f"dense would need "
        f"{2 * batch * cfg.n_layers * cfg.max_seq_len * cfg.kv_dim * kvb / 1e9:.1f} GB)")

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(1,))
    def blk(w, pool, tokens, pos0, key, n):
        def body(i, carry):
            toks, pool, key = carry
            logits, pool = decode_step_fast_batched_paged(
                cfg, w, toks, pos0 + i, pool, tables, page_size=page)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, toks.shape[0])
            nxt = jax.vmap(sample)(logits, keys, jnp.zeros(toks.shape[0]))
            return nxt, pool, key
        toks, pool, _ = jax.lax.fori_loop(0, n, body, (tokens, pool, key))
        return toks, pool

    toks = jnp.ones((batch,), jnp.int32)
    pos = jnp.full((batch,), 256, jnp.int32)
    t0 = time.perf_counter()
    out, pool = blk(weights, pool, toks, pos, jax.random.PRNGKey(0), n=steps)
    _ = np.asarray(out)
    log(f"compile+first {steps}-step block: {time.perf_counter()-t0:.1f}s")
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        # stay within the 2 mapped pages: start <= 352, +steps <= 480 < 512
        out, pool = blk(weights, pool, toks, pos + 32 * (rep + 1),
                        jax.random.PRNGKey(0), n=steps)
        _ = np.asarray(out)
        times.append(time.perf_counter() - t0)
        log(f"  rep {rep}: {batch*steps/times[-1]:.1f} tok/s aggregate")
    dt = sorted(times)[1]
    agg = batch * steps / dt
    print(json.dumps({
        "metric": f"{cfg.weight_dtype}_paged_batch{batch}_decode_throughput",
        "value": round(agg, 1),
        "unit": "tok/s",
        "vs_baseline": round(agg / BASELINE_TOK_S, 3),
        "kv_dtype": kv,
    }))


if __name__ == "__main__":
    main()
