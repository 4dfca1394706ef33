#!/bin/bash
# Round-5 TPU measurement runbook — run AFTER the longrun2 training stops
# (one TPU process at a time; do NOT run concurrently with it).
# Logs land in benchmarks/results/*_r5.log.  Order = descending priority so
# a tunnel outage costs the least-important tail.
set -x
cd /root/repo
R=benchmarks/results
S1=${S1:-/tmp/dpmcheck_prod_d64.msgpack}
GEN=${GEN:-benchmarks/results/longrun2/gen_final.msgpack}

# 1. quality battery on the long-run vocoder (VERDICT #1 closer)
QUALITY_S1_PARAMS=$S1 STAGE2_PARAMS=$GEN \
  timeout 3600 python -u benchmarks/quality.py prod 1500 2000 6 \
  2>&1 | tee $R/quality_prod_r5.log

# 2. bench headline, n=30 (VERDICT #4 re-record with hardened artifact)
BENCH_ITERS=30 timeout 2400 python -u bench.py 2>&1 | tee $R/bench_headline_r5.log

# 3. solver robustness run C (VERDICT #2: third independent training run)
DPMCHECK_PARAMS=/tmp/s1_runC.msgpack \
  timeout 3000 python -u benchmarks/solver_recheck.py 1500 16 64 80 256 \
  2>&1 | tee $R/solver_recheck_r5.log

# 6. visual-path bench, n=16 with retried MFU (VERDICT #4c)
BENCH_VISUAL=1 BENCH_ITERS=16 timeout 2400 python -u bench.py \
  2>&1 | tee $R/bench_visual_r5.log

# 4. UNet residue attribution (VERDICT #3)
timeout 2400 python -u benchmarks/micro.py unetresidue 2>&1 | tee $R/micro_unetresidue_r5.log

# 5. train-step refresh w/ act-v4 backward + batch-scaling table (VERDICT #7, #8)
timeout 1200 python -u benchmarks/micro.py train1 2>&1 | tee $R/micro_train1_r5.log
timeout 1200 python -u benchmarks/micro.py train2 2>&1 | tee $R/micro_train2_r5.log
timeout 2400 python -u benchmarks/micro.py unetbatch 2>&1 | tee $R/micro_unetbatch_r5.log

