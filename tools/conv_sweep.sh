#!/bin/bash
# Convergence accelerant sweep (VERDICT r4 item 4): 1M-row hetero shape,
# relaxation x rho.adapt grid, JSONL out. Each run is a fresh process.
cd /root/repo
OUT=tools/conv_sweep_r5.jsonl
: > $OUT
for setting in "1.0 0.0" "1.6 0.0" "1.8 0.0" "1.0 0.02" "1.6 0.02"; do
  set -- $setting
  echo "=== relaxation=$1 rho_adapt=$2 $(date +%H:%M:%S) ===" >> tools/conv_sweep_r5.log
  BENCH_MODE=convergence BENCH_DEADLINE=0 \
  BENCH_ROWS=262144 BENCH_BLOCKS=4 BENCH_FEATURES=50000 BENCH_NNZ=15 \
  BENCH_HEAD=512 BENCH_CONV_ITERS=300 BENCH_CONV_TRAJ=5 \
  BENCH_RELAXATION=$1 BENCH_RHO_ADAPT=$2 \
  timeout 1800 python bench.py 2>> tools/conv_sweep_r5.log | head -1 >> $OUT
done
echo "SWEEP DONE $(date +%H:%M:%S)" >> tools/conv_sweep_r5.log
