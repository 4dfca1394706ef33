#!/bin/bash
# TPU measurement runbook — run top-to-bottom when the tunnel is up.
# Each step logs to /tmp/tpu_logs/; review between steps before changing
# kernel defaults.  Do NOT run pytest concurrently (host contention has
# corrupted e2e numbers by 4.5x — see CLAUDE.md).
#
# DECISION GATES (review the logs, then edit defaults + commit):
# - actsin: if 'none' ≪ 'exact' and 'fast' ≈ 'none' → flip the
#   ops/alias_free_act._SIN_IMPL default to "fast" (and delete the env
#   knob or keep as escape hatch); if 'none' ≈ 'exact', sin is free and
#   further act work must target the shift/FMA lattice instead.
# - convnarrow: if im2col ≥ ~1.5× faster at C ≤ 96 → flip
#   models/bigvgan.NARROW_CONV_LOWERING to "im2col".
# - snakeconv: fused wins → keep _snake_conv_fusable gate as is; loses →
#   set use_fused=False wiring in AMPBlocks (one-line revert).
# - flashcheck MUST pass before adopting any flashsweep-suggested
#   (bq, chunks) change in ops/flash_d32.py.
# - unetbatch: if one 21-24-window group scales ~linearly, set
#   UNET_BATCH=21 n_batches=1 in bench.py/pipeline defaults.
# - bench: record BOTH the dpm++12 headline and ddim25 parity numbers in
#   BASELINE.md + CLAUDE.md; if the fused single-graph compile stalls
#   >15 min, rerun with BENCH_FUSE=0.
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

# 1. act kernel v4 (padless tiles) + fused snake-conv: Mosaic compile +
#    numbers on production vocoder stages
run snakeconv 1200 python -u benchmarks/micro.py snakeconv
run convt 1200 python -u benchmarks/micro.py convt
run convnarrow 1200 python -u benchmarks/micro.py convnarrow
run act 1200 python -u benchmarks/micro.py act
run actsin 1800 python -u benchmarks/micro.py actsin

# 2. vocoder end-to-end (act v4 + snake_conv fusion in place)
run vocoder 1200 python -u benchmarks/micro.py vocoder

# 3. flash d=32: correctness (ones-column fwd + stock bwd), then geometry
run flashcheck 900 python -u benchmarks/micro.py flashcheck
run flashsweep 1800 python -u benchmarks/micro.py flashsweep

# 4. UNet step + batch sweep (the 3x8-vs-24 anomaly)
run unet 900 python -u benchmarks/micro.py unet
run unetbatch 2400 python -u benchmarks/micro.py unetbatch

# 5. training steps (scan-amortised, all leaves touched)
run train1 1800 python -u benchmarks/micro.py train1
run train2 1800 python -u benchmarks/micro.py train2

# 6. the headline number (single-graph compile time is the open risk;
#    if compile stalls >15 min, retry with the two-dispatch pipeline)
run bench 2400 python -u bench.py

echo "ALL DONE $(date -u +%H:%M:%SZ) — logs in /tmp/tpu_logs/"
