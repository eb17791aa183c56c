#!/bin/bash
# Round-5 pairs 8-9 (same alternating protocol; run7 ended c8-last,
# so run8 goes c2-first).
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
run_leg 8 2; run_leg 8 8
run_leg 9 8; run_leg 9 2
echo ALL_DONE_EXTRA2
