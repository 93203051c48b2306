#!/bin/bash
# Round-5 100M streaming run: pack-cache load (~7 min), 5 iterations,
# floor decomposition at the 317 s/iter shape, bounded checkpoints,
# padded compact wire. Uses the shipped warm compile cache (steady-state
# evidence; the cold-compile comparison is the 25M run's job).
cd /root/repo
echo "=== 100M run $(date +%H:%M:%S) ===" >> tools/run_100m_r5.log
timeout 7200 python -m mlease_tpu train examples/data/ctr-100m.job >> tools/run_100m_r5.log 2>&1
echo "=== rc=$? done $(date +%H:%M:%S) ===" >> tools/run_100m_r5.log
ls -la examples/data/ctr-10m/out-100m/checkpoint/ >> tools/run_100m_r5.log 2>&1
