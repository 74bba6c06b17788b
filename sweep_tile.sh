#!/bin/bash
# Sweep MFX_TILE x MFX_EXIT_CHECK on the real TPU (fwd+bwd bench, 1 iter).
cd /root/repo
for cfg in "32 2" "32 8" "64 4" "64 8" "128 4" "128 8" "128 16"; do
  set -- $cfg
  echo "=== TILE=$1 EXIT_CHECK=$2 ==="
  MFX_TILE=$1 MFX_EXIT_CHECK=$2 BENCH_ITERS=1 timeout 420 python bench.py 2>/dev/null
done
