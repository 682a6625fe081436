#!/bin/bash
# TPU measurement chain (PLAN P0). Run as:
#   nohup bash benchmarks/run_chain.sh > /tmp/chain.log 2>&1 & echo $! > /tmp/chain.pid
# Stages are individually resumable; reruns skip completed work via markers.
set -x
cd /root/repo

echo "=== stage 1: 10M HNSW end-to-end (Collection API) ==="
ZVEC_BUILD_LOG=1 python benchmarks/bench_10m_hnsw.py \
  && cp /tmp/h2h10m/results.json benchmarks/h2h10m_results.json

echo "=== stage 2: BASELINE configs 3/4/5 suite ==="
python benchmarks/bench_suite.py

echo "=== stage 3: gaussian 1M tpu-recall ef sweep (vs ref curve in BASELINE.md) ==="
if [ ! -f /tmp/h2h/gaussian_1000000_128_gt.npy ]; then
  python benchmarks/h2h.py gen --kind gaussian --n 1000000 --dim 128 --npy-only
fi
python benchmarks/h2h.py tpu-recall --kind gaussian --n 1000000 --dim 128 \
  --ef-sweep 32,64,128,256,500 | tee /tmp/h2h_1m_sweep.jsonl

echo "=== stage 4: headline bench + 10M kernel figure ==="
BENCH_10M=1 python bench.py

echo "=== chain complete ==="
