#!/bin/bash
# On-chip validation backlog: run after the TPU tunnel returns.
# Executes the real-kernel smoke matrix, the int8-KV decision probe, and
# the bench sweep (fp8 headline, int4, spec modes, batch/paged/prefill),
# teeing everything to /tmp/onchip_backlog.log. ~60-120 min (compiles
# dominate). Run from /root/repo; NEVER set PYTHONPATH; never run two TPU
# processes at once.
set -x
cd /root/repo
LOG=/tmp/onchip_backlog.log
{
  date
  echo "=== 0. device probe ==="
  timeout 300 python -c "
import jax, jax.numpy as jnp, numpy as np
print(jax.devices())
x = jnp.ones((256,256), jnp.bfloat16)
print('matmul-ok', float(np.asarray(jnp.sum(x@x))))" || exit 1

  echo "=== 1. tpu_smoke (23 checks incl gemma2/3 + tree-medusa) ==="
  timeout 3600 python tools/tpu_smoke.py

  echo "=== 2. int8 KV probe ==="
  timeout 1200 python tools/int8_probe.py

  echo "=== 3. bench: int4 headline (the default) + fp8 like-for-like ==="
  timeout 1800 python bench.py
  YALM_BENCH_DTYPE=fp8 timeout 1800 python bench.py

  echo "=== 4. bench: int4 weights ==="
  YALM_BENCH_DTYPE=int4 YALM_BENCH_KV=bf16 timeout 1800 python bench.py
  echo "=== 4b. bench: int4 weights + fp8 KV ==="
  YALM_BENCH_DTYPE=int4 YALM_BENCH_KV=fp8 timeout 1800 python bench.py

  echo "=== 5. bench: speculative (engine draft + lookup + medusa) ==="
  YALM_BENCH_SPEC=1 timeout 1800 python bench.py
  YALM_BENCH_SPEC=lookup timeout 1800 python bench.py
  YALM_BENCH_SPEC=medusa timeout 1800 python bench.py

  echo "=== 6. bench: scheduler-level spec ==="
  YALM_BENCH_SPEC=sched timeout 2400 python bench.py
  YALM_BENCH_SPEC=sched-lookup timeout 2400 python bench.py

  echo "=== 7. bench: batch / paged / prefill ==="
  YALM_BENCH_BATCH=16 timeout 1800 python bench.py
  YALM_BENCH_PAGED_BATCH=24 timeout 1800 python bench.py
  YALM_BENCH_PREFILL=1 timeout 1800 python bench.py

  echo "=== 8. bench: gemma presets (softcaps; gemma3 sliding streams 1/4 KV) ==="
  YALM_BENCH_PRESET=gemma2-9b timeout 2400 python bench.py
  YALM_BENCH_PRESET=gemma3-12b timeout 2400 python bench.py

  echo "=== 9. bench: MoE preset (paged + lookup-spec, round-5 compositions) ==="
  YALM_BENCH_PRESET=mixtral-l8 timeout 1800 python bench.py
  YALM_BENCH_PRESET=mixtral-l8 YALM_BENCH_PAGED_BATCH=8 timeout 1800 python bench.py
  YALM_BENCH_PRESET=mixtral-l8 YALM_BENCH_SPEC=sched-lookup timeout 1800 python bench.py

  echo "=== 10. bench: acceptance-dialed speculation sweeps (round 5) ==="
  YALM_BENCH_DTYPE=fp8 YALM_BENCH_SPEC=accept timeout 2400 python bench.py
  YALM_BENCH_DTYPE=fp8 YALM_BENCH_SPEC=accept-medusa timeout 3000 python bench.py
  date
} 2>&1 | tee -a "$LOG"
