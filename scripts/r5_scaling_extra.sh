#!/bin/bash
# Round-5 extra pairs 6-7, continuing the alternating-leg protocol
# (run5 ended c2-first, so run6 goes c8-first).
set -u
cd /root/repo
export SPARK_GRAFT_LOCAL_DIR=/dev/shm/spark-local
export TMPDIR=/dev/shm/ck
mkdir -p /dev/shm/ck /dev/shm/spark-local
FLAGS="--hosts 30000 --pages-base 120 --max-pages 96 --quota 96 --budget-scheduled"
run_leg() {
  python scripts/scaling_run.py --cpus "$2" $FLAGS \
    >"BENCH/r5/run$1_c$2.json" 2>"BENCH/r5/run$1_c$2.log"
  tail -1 "BENCH/r5/run$1_c$2.json"
  rm -rf /dev/shm/ck/* /dev/shm/spark-local/*
}
run_leg 6 8; run_leg 6 2
run_leg 7 2; run_leg 7 8
echo ALL_DONE_EXTRA
