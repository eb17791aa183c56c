#!/bin/bash
# Resume of scripts/r5_scaling.sh after the box killed run2_c2 mid-leg:
# re-run run2_c2, then pairs 3..5 with the same alternating-leg protocol.
set -u
cd /root/repo
export SPARK_GRAFT_LOCAL_DIR=/dev/shm/spark-local
export TMPDIR=/dev/shm/ck
mkdir -p /dev/shm/ck /dev/shm/spark-local
FLAGS="--hosts 30000 --pages-base 120 --max-pages 96 --quota 96 --budget-scheduled"
run_leg() {  # $1=run idx  $2=cpus
  python scripts/scaling_run.py --cpus "$2" $FLAGS \
    >"BENCH/r5/run$1_c$2.json" 2>"BENCH/r5/run$1_c$2.log"
  tail -1 "BENCH/r5/run$1_c$2.json"
  rm -rf /dev/shm/ck/* /dev/shm/spark-local/*
}
run_leg 2 2
run_leg 3 2; run_leg 3 8
run_leg 4 8; run_leg 4 2
run_leg 5 2; run_leg 5 8
echo ALL_DONE
