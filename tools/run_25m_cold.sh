#!/bin/bash
# 25M cold-start measurement (VERDICT r4 item 3): padded compact wire vs
# r4's 560 s (dense) / 880 s (compact) cold iteration-1. Fresh compile
# cache for honesty; creates the 25M pack cache as a side effect; logs the
# floor decomposition + phase breakdown + bounded checkpoint evidence.
cd /root/repo
export MLEASE_JAX_CACHE=/tmp/cold_cache_r5_$(date +%s)
mkdir -p "$MLEASE_JAX_CACHE"
echo "=== 25M cold run $(date +%H:%M:%S) cache=$MLEASE_JAX_CACHE ===" >> tools/run_25m_r5.log
timeout 5400 python -m mlease_tpu train examples/data/ctr-25m.job >> tools/run_25m_r5.log 2>&1
echo "=== rc=$? done $(date +%H:%M:%S) ===" >> tools/run_25m_r5.log
ls -la examples/data/ctr-10m/out-25m/checkpoint/ >> tools/run_25m_r5.log 2>&1
