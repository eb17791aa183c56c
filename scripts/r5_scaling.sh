#!/bin/bash
# Round-5 scaling protocol: 5 alternating credit-matched local[2]/local[8]
# pairs on the fat-wave 2.8M-URL workload, leg order alternating per pair
# to cancel credit drift; shuffle local-dir + checkpoint on tmpfs.
set -u
cd /root/repo
mkdir -p /dev/shm/ck /dev/shm/spark-local
export SPARK_GRAFT_LOCAL_DIR=/dev/shm/spark-local
export TMPDIR=/dev/shm/ck
FLAGS="--hosts 30000 --pages-base 120 --max-pages 96 --quota 96 --budget-scheduled"
run_leg() {  # $1=run idx  $2=cpus
  python scripts/scaling_run.py --cpus "$2" $FLAGS \
    >"BENCH/r5/run$1_c$2.json" 2>"BENCH/r5/run$1_c$2.log"
  tail -1 "BENCH/r5/run$1_c$2.json"
  rm -rf /dev/shm/ck/* /dev/shm/spark-local/*
}
for i in 1 2 3 4 5; do
  if [ $((i % 2)) -eq 1 ]; then
    run_leg "$i" 2; run_leg "$i" 8
  else
    run_leg "$i" 8; run_leg "$i" 2
  fi
done
echo ALL_DONE
