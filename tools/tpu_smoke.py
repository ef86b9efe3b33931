"""TPU integration smoke matrix: every dtype x path on REAL kernels.

The CPU test suite runs the kernels' jnp emulation (plus small
interpret-mode kernel tests), which cannot catch Mosaic lowering gaps —
e.g. fp16 being entirely unsupported in the mosaic dialect was invisible
on CPU. This script drives the real kernels on the attached TPU across
the dtype/path matrix. Run it after kernel changes:

    python tools/tpu_smoke.py            # ~5 minutes (compiles dominate)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    from yalm_tpu.engine import Engine
    from yalm_tpu.scheduler import Request, Scheduler
    from yalm_tpu.models import load_weights
    from yalm_tpu.codec.format import read_yalm
    from yalm_tpu.utils.testing import synth_checkpoint, tiny_config

    assert jax.devices()[0].platform == "tpu", "attach a TPU first"
    tmp = tempfile.mkdtemp(prefix="tpu_smoke_")
    failures = []

    def check(name, fn):
        try:
            fn()
            print(f"  OK   {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failures.append((name, e))
            print(f"  FAIL {name}: {str(e)[:200]}", flush=True)

    base = dict(dim=256, hidden_dim=512, head_dim=128, n_layers=2, n_heads=4,
                n_kv_heads=2, vocab_size=512, max_seq_len=64, rotary_dim=128,
                qkv_clip=30.0)

    # --- dtype sweep through the single-stream fast engine ---------------
    for wdt in ("fp32", "fp16", "bf16", "fp8", "int8", "int4"):
        cfg = tiny_config(**base, weight_dtype=wdt)
        path = f"{tmp}/{wdt}.yalm"
        synth_checkpoint(path, cfg, seed=0)

        def run(path=path):
            eng = Engine.from_checkpoint(path, fast=True)
            assert eng.fast
            toks = list(eng.generate([1, 7], max_steps=6, temperature=0.0))
            assert len(toks) == 6
        check(f"engine fast decode+prefill [{wdt}]", run)

    # --- QKV bias (Qwen2) ------------------------------------------------
    cfg = tiny_config(**base, weight_dtype="fp8", has_qkv_bias=True)
    path = f"{tmp}/bias.yalm"
    synth_checkpoint(path, cfg, seed=1)
    check("engine fast with qkv bias [fp8]",
          lambda: list(Engine.from_checkpoint(path, fast=True)
                       .generate([1, 7], max_steps=4, temperature=0.0)))

    # --- MoE routed-expert kernels ---------------------------------------
    mcfg = tiny_config(**base, weight_dtype="fp8", n_experts=4, n_experts_active=2)
    mpath = f"{tmp}/moe.yalm"
    synth_checkpoint(mpath, mcfg, seed=2)
    check("engine fast MoE [fp8]",
          lambda: list(Engine.from_checkpoint(mpath, fast=True)
                       .generate([1, 7], max_steps=4, temperature=0.0)))

    # --- batched scheduler tick ------------------------------------------
    def run_sched():
        cfg = tiny_config(**base, weight_dtype="fp8")
        p = f"{tmp}/sched.yalm"
        synth_checkpoint(p, cfg, seed=3)
        w = load_weights(read_yalm(p), cfg)
        s = Scheduler(cfg, w, batch=8, kv_dtype=jnp.bfloat16)
        assert s.fast
        reqs = [s.submit(Request(prompt_tokens=[1, 4 + i], max_new_tokens=4,
                                 temperature=0.0)) for i in range(3)]
        s.run()
        assert all(len(r.generated) == 4 for r in reqs)
    check("scheduler batched tick [fp8, B=8]", run_sched)

    # --- batched MoE tick (gemm_le + router gemm_l, N=n_experts) ---------
    def run_sched_moe():
        cfg = tiny_config(**base, weight_dtype="fp8", n_experts=4,
                          n_experts_active=2)
        p = f"{tmp}/schedmoe.yalm"
        synth_checkpoint(p, cfg, seed=5)
        w = load_weights(read_yalm(p), cfg)
        s = Scheduler(cfg, w, batch=8, kv_dtype=jnp.bfloat16)
        assert s.fast
        req = s.submit(Request(prompt_tokens=[1, 5, 9], max_new_tokens=4,
                               temperature=0.0))
        s.run()
        assert len(req.generated) == 4
    check("scheduler batched MoE tick [fp8, B=8]", run_sched_moe)

    # --- PAGED continuous batching (vLLM-style block tables) -------------
    def run_sched_paged():
        cfg = tiny_config(**base, weight_dtype="fp8")
        path = f"{tmp}/paged.yalm"
        synth_checkpoint(path, cfg, seed=4)
        w = load_weights(read_yalm(path), cfg)
        dense = Scheduler(cfg, w, batch=8, kv_dtype=jnp.bfloat16)
        want = []
        for i in range(4):
            r = Request(prompt_tokens=[1, 5 + i], max_new_tokens=4,
                        temperature=0.0, seed=i)
            dense.submit(r)
            want.append(r)
        dense.run()
        s = Scheduler(cfg, w, batch=8, kv_dtype=jnp.bfloat16,
                      paged_pages=1 + 8 * (cfg.max_seq_len // 16),
                      page_size=16)
        got = []
        for i in range(4):
            r = Request(prompt_tokens=[1, 5 + i], max_new_tokens=4,
                        temperature=0.0, seed=i)
            s.submit(r)
            got.append(r)
        s.run()
        assert [r.generated for r in got] == [r.generated for r in want], \
            (got[0].generated, want[0].generated)
    check("PAGED scheduler tick == dense [fp8, B=8, page=16]", run_sched_paged)

    # --- fp8 (e4m3) quantized KV cache on real kernels -------------------
    # fp8 KV on real kernels needs n_kv_heads % 4 == 0 (packed-tile DMA)
    base4 = dict(base, n_kv_heads=4)

    def run_fp8_kv():
        cfg = tiny_config(**base4, weight_dtype="bf16")
        p = f"{tmp}/fp8kv.yalm"
        synth_checkpoint(p, cfg, seed=9)
        fast = Engine.from_checkpoint(p, fast=True,
                                      kv_dtype=jnp.float8_e5m2)
        ref = Engine.from_checkpoint(p, fast=True, kv_dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        # teacher-forced across the window edge: quantized write, staged
        # flash, lazy sinks — logits must track the bf16 cache
        toks = [1, 7] + list(rng.integers(3, cfg.vocab_size,
                                          cfg.max_seq_len + 8))
        fast.prefill_tokens(toks[:2])
        ref.prefill_tokens(toks[:2])
        for i in range(2, len(toks)):
            lf, fast.cache = fast._step_logits(
                fast.weights, jnp.int32(toks[i]), jnp.int32(fast.pos),
                fast.cache)
            lr, ref.cache = ref._step_logits(
                ref.weights, jnp.int32(toks[i]), jnp.int32(ref.pos),
                ref.cache)
            fast.pos += 1
            ref.pos += 1
            a, b = np.asarray(lf), np.asarray(lr)
            rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-6)
            # e5m2: 2 mantissa bits; worst single logit ~0.22
            # observed (ppl gates in tests/test_fp8_kv.py hold
            # the accuracy line — this guards gross breakage)
            assert rel < 0.4, (fast.pos, rel)
    check("fp8-e5m2 KV cache decode tracks bf16 [real kernels]", run_fp8_kv)

    def run_fp8_kv_sched():
        cfg = tiny_config(**base4, weight_dtype="fp8")
        p = f"{tmp}/fp8kvs.yalm"
        synth_checkpoint(p, cfg, seed=10)
        w = load_weights(read_yalm(p), cfg)
        s = Scheduler(cfg, w, batch=8, kv_dtype=jnp.float8_e5m2)
        reqs = [s.submit(Request(prompt_tokens=[1, 4 + i], max_new_tokens=4,
                                 temperature=0.0)) for i in range(3)]
        s.run()
        assert all(len(r.generated) == 4 for r in reqs)
        sp = Scheduler(cfg, w, batch=8, kv_dtype=jnp.float8_e5m2,
                       paged_pages=1 + 8 * (cfg.max_seq_len // 16),
                       page_size=16)
        r = sp.submit(Request(prompt_tokens=[1, 5], max_new_tokens=4,
                              temperature=0.0))
        sp.run()
        assert len(r.generated) == 4
    check("fp8-KV batched + paged scheduler ticks", run_fp8_kv_sched)

    # --- window-edge decode: ring overwrite + LAZY sink rotation ---------
    def run_window_edge():
        # teacher-forced logit comparison fast-vs-oracle across the edge:
        # free-running greedy streams amplify bf16 tie-breaks, but the
        # per-position logits must stay within plain bf16 noise and agree
        # on argmax while the sink path is live
        cfg = tiny_config(**base, weight_dtype="bf16")
        p = f"{tmp}/edge.yalm"
        synth_checkpoint(p, cfg, seed=7)
        fast = Engine.from_checkpoint(p, fast=True)
        orac = Engine.from_checkpoint(p, fast=False, kv_dtype=jnp.bfloat16,
                                      compute_dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        toks = [1, 7] + list(rng.integers(3, cfg.vocab_size,
                                          cfg.max_seq_len + 10))
        fast.prefill_tokens(toks[:2])
        orac.prefill_tokens(toks[:2])
        for i in range(2, len(toks)):
            lf, fast.cache = fast._step_logits(
                fast.weights, jnp.int32(toks[i]), jnp.int32(fast.pos),
                fast.cache)
            lo, orac.cache = orac._step_logits(
                orac.weights, jnp.int32(toks[i]), jnp.int32(orac.pos),
                orac.cache)
            fast.pos += 1
            orac.pos += 1
            if fast.pos >= cfg.max_seq_len - 2:  # sink region and beyond
                a, b = np.asarray(lf), np.asarray(lo)
                assert np.max(np.abs(a - b)) < 0.06, (fast.pos,
                                                      np.max(np.abs(a - b)))
                assert int(a.argmax()) == int(b.argmax()), fast.pos
    check("window-edge decode w/ lazy sinks == oracle [bf16]", run_window_edge)

    # --- int4: packed nibble unpack + group scales on real Mosaic --------
    def run_int4_logits():
        # teacher-forced logit parity vs the oracle's load-time dequant:
        # catches Mosaic lowering bugs in the bitwise unpack / group-scale
        # accumulate, not just crashes
        cfg = tiny_config(**base, weight_dtype="int4")
        p = f"{tmp}/int4.yalm"
        synth_checkpoint(p, cfg, seed=12)
        fast = Engine.from_checkpoint(p, fast=True)
        orac = Engine.from_checkpoint(p, fast=False, kv_dtype=jnp.bfloat16,
                                      compute_dtype=jnp.bfloat16)
        assert fast.fast
        rng = np.random.default_rng(0)
        toks = [1, 7] + list(rng.integers(3, cfg.vocab_size, 12))
        fast.prefill_tokens(toks[:2])
        orac.prefill_tokens(toks[:2])
        for i in range(2, len(toks)):
            lf, fast.cache = fast._step_logits(
                fast.weights, jnp.int32(toks[i]), jnp.int32(fast.pos),
                fast.cache)
            lo, orac.cache = orac._step_logits(
                orac.weights, jnp.int32(toks[i]), jnp.int32(orac.pos),
                orac.cache)
            fast.pos += 1
            orac.pos += 1
            a, b = np.asarray(lf), np.asarray(lo)
            assert np.max(np.abs(a - b)) < 0.06, (fast.pos,
                                                  np.max(np.abs(a - b)))
            assert int(a.argmax()) == int(b.argmax()), fast.pos
    check("int4 decode logits == oracle dequant [real kernels]",
          run_int4_logits)

    def run_int4_moe():
        cfg = tiny_config(**base, weight_dtype="int4", n_experts=4,
                          n_experts_active=2)
        p = f"{tmp}/int4moe.yalm"
        synth_checkpoint(p, cfg, seed=14)
        eng = Engine.from_checkpoint(p, fast=True)
        assert eng.fast
        toks = list(eng.generate([1, 7], max_steps=4, temperature=0.0))
        assert len(toks) == 4
    check("int4 MoE routed-expert kernels", run_int4_moe)

    def run_int4_sched():
        cfg = tiny_config(**base, weight_dtype="int4")
        p = f"{tmp}/int4s.yalm"
        synth_checkpoint(p, cfg, seed=13)
        from yalm_tpu.models.fast import load_fast_weights
        fw = load_fast_weights(read_yalm(p), cfg)
        s = Scheduler(cfg, fw, batch=8, kv_dtype=jnp.bfloat16)
        assert s.fast
        reqs = [s.submit(Request(prompt_tokens=[1, 4 + i], max_new_tokens=4,
                                 temperature=0.0)) for i in range(3)]
        s.run()
        assert all(len(r.generated) == 4 for r in reqs)
    check("int4 scheduler batched tick [B=8]", run_int4_sched)

    # --- odd-size exact-fit prefill chunks (full-dim activation blocks) --
    def run_odd_prefill():
        cfg = tiny_config(dim=256, hidden_dim=512, head_dim=128, n_layers=2,
                          n_heads=4, n_kv_heads=2, vocab_size=512,
                          max_seq_len=328, rotary_dim=128, weight_dtype="fp8")
        p = f"{tmp}/oddt.yalm"
        synth_checkpoint(p, cfg, seed=6)
        eng = Engine.from_checkpoint(p, fast=True)
        prompt = list(np.random.default_rng(0).integers(3, cfg.vocab_size, 300))
        toks = list(eng.generate(prompt, max_steps=8, temperature=0.0))
        assert len(toks) == 8
    check("odd-T exact-fit prefill [fp8]", run_odd_prefill)

    # --- Gemma2 features on real Mosaic: tanh score cap + age-mod sliding
    # mask + sandwich norms (unfused wo/FFN) + capped logits --------------
    def run_gemma2_logits():
        cfg = tiny_config(**base, weight_dtype="bf16", act_type="gelu",
                          embed_scale=16.0, has_post_norms=True,
                          attn_softcap=50.0, final_softcap=30.0,
                          sliding_window=32, layer_sliding=(1, 0))
        p = f"{tmp}/g2.yalm"
        synth_checkpoint(p, cfg, seed=21)
        fast = Engine.from_checkpoint(p, fast=True)
        orac = Engine.from_checkpoint(p, fast=False, kv_dtype=jnp.bfloat16,
                                      compute_dtype=jnp.bfloat16)
        assert fast.fast
        rng = np.random.default_rng(0)
        toks = [1, 7] + list(rng.integers(3, cfg.vocab_size,
                                          cfg.max_seq_len + 6))
        fast.prefill_tokens(toks[:2])
        orac.prefill_tokens(toks[:2])
        for i in range(2, len(toks)):  # crosses sliding edge AND ring edge
            lf, fast.cache = fast._step_logits(
                fast.weights, jnp.int32(toks[i]), jnp.int32(fast.pos),
                fast.cache)
            lo, orac.cache = orac._step_logits(
                orac.weights, jnp.int32(toks[i]), jnp.int32(orac.pos),
                orac.cache)
            fast.pos += 1
            orac.pos += 1
            a, b = np.asarray(lf), np.asarray(lo)
            assert np.max(np.abs(a - b)) < 0.06, (fast.pos,
                                                  np.max(np.abs(a - b)))
    check("gemma2 decode (softcaps+sliding+sandwich) == oracle",
          run_gemma2_logits)

    def run_gemma3_logits():
        # dual per-layer rope: the traced alt selector steering the
        # in-kernel rotation between two static freq tables
        cfg = tiny_config(**base, weight_dtype="bf16", act_type="gelu",
                          embed_scale=16.0, has_post_norms=True,
                          has_qk_norm=True, sliding_window=32,
                          layer_sliding=(1, 0), rope_theta=1e6,
                          rope_scale=("gemma3", 2.0, 1e4))
        p = f"{tmp}/g3.yalm"
        synth_checkpoint(p, cfg, seed=22)
        fast = Engine.from_checkpoint(p, fast=True)
        orac = Engine.from_checkpoint(p, fast=False, kv_dtype=jnp.bfloat16,
                                      compute_dtype=jnp.bfloat16)
        assert fast.fast
        rng = np.random.default_rng(1)
        toks = [1, 7] + list(rng.integers(3, cfg.vocab_size,
                                          cfg.max_seq_len + 6))
        fast.prefill_tokens(toks[:2])
        orac.prefill_tokens(toks[:2])
        for i in range(2, len(toks)):
            lf, fast.cache = fast._step_logits(
                fast.weights, jnp.int32(toks[i]), jnp.int32(fast.pos),
                fast.cache)
            lo, orac.cache = orac._step_logits(
                orac.weights, jnp.int32(toks[i]), jnp.int32(orac.pos),
                orac.cache)
            fast.pos += 1
            orac.pos += 1
            a, b = np.asarray(lf), np.asarray(lo)
            assert np.max(np.abs(a - b)) < 0.06, (fast.pos,
                                                  np.max(np.abs(a - b)))
    check("gemma3 decode (dual rope + sliding + qk-norm) == oracle",
          run_gemma3_logits)

    def run_gemma2_sched():
        cfg = tiny_config(**base, weight_dtype="bf16", act_type="gelu",
                          embed_scale=16.0, has_post_norms=True,
                          attn_softcap=50.0, final_softcap=30.0,
                          sliding_window=32, layer_sliding=(1, 0))
        p = f"{tmp}/g2s.yalm"
        synth_checkpoint(p, cfg, seed=23)
        w = load_weights(read_yalm(p), cfg)
        s = Scheduler(cfg, w, batch=8, kv_dtype=jnp.bfloat16)
        assert s.fast
        reqs = [s.submit(Request(prompt_tokens=[1, 4 + i], max_new_tokens=4,
                                 temperature=0.0)) for i in range(3)]
        s.run()
        assert all(len(r.generated) == 4 for r in reqs)
    check("gemma2 scheduler batched tick [B=8]", run_gemma2_sched)

    # --- shard_map fast-TP at tp=1 on the single chip --------------------
    def run_medusa_tree():
        # TREE-attention medusa == chain medusa's exact greedy stream on
        # hardware (head-independence, the tree walk, path scatter)
        from yalm_tpu.medusa import load_medusa_weights
        from yalm_tpu.models import load_weights as lw
        cfg = tiny_config(**base, weight_dtype="fp8")
        p = f"{tmp}/mtree.yalm"
        synth_checkpoint(p, cfg, seed=17, medusa_heads=-3)
        yf = read_yalm(p)
        w = lw(yf, cfg)
        mw = load_medusa_weights(yf, cfg)
        yf.close()
        streams = {}
        for name, kw in (("chain", {}), ("tree", {"spec_tree": (2, 2)})):
            s = Scheduler(cfg, lw(read_yalm(p), cfg), batch=8,
                          kv_dtype=jnp.bfloat16, spec_medusa=mw, **kw)
            rs = [Request(prompt_tokens=[1, 7, 9], max_new_tokens=8,
                          temperature=0.0, seed=i) for i in range(3)]
            for r in rs:
                s.submit(r)
            s.run()
            assert s.spec_stats["rounds"] >= 1
            streams[name] = [r.generated for r in rs]
        for a, b in zip(streams["chain"], streams["tree"]):
            # same verify formulation family; agreement until the first
            # chain-vs-tree attention-order bf16 near-tie
            pre = 0
            for x, y in zip(a, b):
                if x != y:
                    break
                pre += 1
            assert pre >= 4, (a, b)
    check("medusa TREE scheduler == chain stream", run_medusa_tree)

    def run_tp():
        from yalm_tpu.parallel.mesh import MeshConfig, make_mesh
        cfg = tiny_config(**base, weight_dtype="bf16")
        p = f"{tmp}/tp.yalm"
        synth_checkpoint(p, cfg, seed=4)
        mesh = make_mesh(MeshConfig(tp=1), devices=jax.devices()[:1])
        eng = Engine.from_checkpoint(p, mesh=mesh, kv_dtype=jnp.bfloat16)
        assert eng.fast
        toks = list(eng.generate([1, 7], max_steps=4, temperature=0.0))
        assert len(toks) == 4
    check("fast-TP shard_map tp=1 [bf16]", run_tp)

    print(f"\n{len(failures)} failures" if failures else "\nALL OK", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
