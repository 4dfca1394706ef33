#!/bin/bash
# TPU measurement runbook (r4) — run top-to-bottom when the tunnel is up.
# Each step logs to /tmp/tpu_logs/; review between steps before changing
# kernel defaults.  Do NOT run pytest concurrently (host contention has
# corrupted e2e numbers by 4.5x — see CLAUDE.md).
#
# DECISION GATES (review the logs, then edit defaults + commit):
# - solver: pick the FASTEST candidate passing BOTH 2% gates
#   (tgt + melrmse vs ddim25) from solver_eval_r4.log; set bench.py
#   SAMPLER/STEPS/TIME_GRID to it and record the JSON in VALIDATION.md.
#   If nothing below 25 passes, the headline stays ddim25.
# - vocoder: act v4 (padless) + fast-sin are in; if micro.py vocoder
#   ≤ 180 ms the r3-review target is met — record in BASELINE.md.
# - flashcheck MUST pass before keeping DIFFBINAURAL_FLASH_EXP2=1
#   (the new base-2 inference softmax) or any flashsweep change.
# - quality: all four beats_monocopy_* gates must be true; paste the
#   JSON into VALIDATION.md.
# - train1/train2 now print TFLOP + MFU — record them in BASELINE.md.
set -u
mkdir -p /tmp/tpu_logs
cd /root/repo

run() {  # run <tag> <timeout_s> <cmd...> — returns the COMMAND's status
  local tag=$1 t=$2; shift 2
  echo "=== $tag ($(date -u +%H:%M:%SZ)) ==="
  timeout "$t" "$@" 2>&1 | tee "/tmp/tpu_logs/$tag.log" | tail -40
  local rc=${PIPESTATUS[0]}
  echo "=== $tag done rc=$rc ==="
  return "$rc"
}

# 0. backend probe — LONG timeout: killing a probe mid-backend-init has been
# observed to wedge the tunnel for the NEXT client too, so short probe+kill
# cycles can keep the tunnel "down" indefinitely.  One patient probe instead.
run probe 600 python -u -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((128,128)))))" || exit 1

# 1. SOLVER CERTIFICATION (r3-review item 2, decides the headline): the
#    dim=64 trained params are cached from the r3 run — eval-only, ~20 min.
#    If the cache is missing this retrains (~28 min extra).
DPMCHECK_PARAMS=/tmp/dpmcheck_prod_d64.msgpack \
  run solver_eval_r4 5400 python -u benchmarks/convergence.py dpmcheck 1500 16 64 80 256

# 2. vocoder: act v4 + fast sin end-to-end, then per-stage attribution
run vocoder 1200 python -u benchmarks/micro.py vocoder
run act 1200 python -u benchmarks/micro.py act

# 3. flash d=32: correctness incl. the exp2 primal, then the step
run flashcheck 900 python -u benchmarks/micro.py flashcheck
run attn 900 python -u benchmarks/micro.py attn
run unet 900 python -u benchmarks/micro.py unet

# 4. training steps with the new FLOP/MFU accounting
run train1 1800 python -u benchmarks/micro.py train1
run train2 1800 python -u benchmarks/micro.py train2

# 5. QUALITY BATTERY at production size (r3-review item 3): stage-1 from
#    the cached params, stage-2 trained 2000 steps (~20 min), 6 held-out
#    clips scored vs mono-copy.
DPMCHECK_PARAMS=/tmp/dpmcheck_prod_d64.msgpack \
STAGE2_PARAMS=/tmp/stage2_prod.msgpack \
  run quality_prod 7200 python -u benchmarks/quality.py prod

# 6. live visual-conditioning cost (r3-review item 7), small n
BENCH_VISUAL=1 BENCH_ITERS=5 run bench_visual 2400 python -u bench.py

# 7. the headline (BENCH_ITERS=30 default; set BENCH_SAMPLER/STEPS/GRID
#    first if step 1 certified a faster mode)
run bench 3600 python -u bench.py

echo "ALL DONE $(date -u +%H:%M:%SZ) — logs in /tmp/tpu_logs/"
