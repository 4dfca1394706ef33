#!/bin/bash
# Round-5 (continuation session) TPU pipeline.  The prior session's /tmp and
# working-tree checkpoints were wiped at the round boundary, so the 16k-step
# longrun2 generator is gone; ILD was solved from step 1500 on
# (results/longrun2/log.jsonl), so a 1500-step augmented retrain suffices for
# the quality battery.  Phases ordered so a cut session loses the least:
#   1. stage-2 GAN, 1500 steps WITH level-diversity augmentation  -> gen ckpt
#   2. solver_recheck run C (trains a fresh stage-1 = 3rd independent run)
#   3. full-stack quality battery from both caches (VERDICT r4 #1 closer)
set -x
cd /root/repo
R=benchmarks/results
S1=/tmp/s1_runC.msgpack
GEN=benchmarks/results/longrun3/gen_final.msgpack

LONGRUN_DIR=$R/longrun3 LONGRUN_CKPT_EVERY=500 LONGRUN_SNAP_EVERY=750 \
LONGRUN_EVAL_EVERY=750 timeout 1800 python -u benchmarks/longrun2.py 1500 16 \
  2>&1 | tee $R/longrun3_train.log

DPMCHECK_PARAMS=$S1 timeout 2400 python -u benchmarks/solver_recheck.py \
  1500 16 64 80 256 2>&1 | tee $R/solver_recheck_r5.log

QUALITY_S1_PARAMS=$S1 STAGE2_PARAMS=$GEN timeout 1800 python -u \
  benchmarks/quality.py prod 1500 1500 6 2>&1 | tee $R/quality_prod_r5b.log

echo ALL_PHASES_DONE
