#!/bin/bash
# Supervise longrun2: restart on wedge (log stale >420 s). Exact-PID kills only.
# Usage: SUP_TOTAL=16000 SUP_BUDGET=4500 SUP_LOG=/tmp/longrun2.log bash benchmarks/longrun_supervise.sh
# Restarts benchmarks/longrun2.py from its last checkpoint whenever the log
# goes stale >420 s (tunnel-RPC wedge: process sleeps at 0% CPU while fresh
# connections work — hit twice in r5, both resumed cleanly).
LOG=${SUP_LOG:-/tmp/longrun2.log}
DEADLINE=$(( $(date +%s) + ${SUP_BUDGET:-4500} ))
while true; do
  LONGRUN_CKPT_EVERY=1000 LONGRUN_DIR=/root/repo/benchmarks/results/longrun2 \
    python -u /root/repo/benchmarks/longrun2.py ${SUP_TOTAL:-16000} 16 >> $LOG 2>&1 &
  PID=$!
  echo "supervisor: started $PID" >> $LOG
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    NOW=$(date +%s)
    MT=$(stat -c %Y $LOG)
    if [ $((NOW - MT)) -gt 420 ]; then
      echo "supervisor: stale $((NOW-MT))s, killing $PID" >> $LOG
      kill -9 $PID 2>/dev/null
      sleep 3
      break
    fi
    if [ $NOW -gt $DEADLINE ]; then
      echo "supervisor: deadline reached, killing $PID" >> $LOG
      kill -9 $PID 2>/dev/null
      exit 2
    fi
  done
  wait $PID 2>/dev/null
  RC=$?
  if grep -q "^DONE" $LOG; then echo "supervisor: DONE" >> $LOG; exit 0; fi
  if [ $(date +%s) -gt $DEADLINE ]; then echo "supervisor: deadline" >> $LOG; exit 2; fi
  echo "supervisor: restarting (rc=$RC)" >> $LOG
done
