#!/bin/bash
# One-command on-chip measurement queue: run this when the chip comes
# back after an outage (see benchmarks/RESULTS.md "queued for on-chip
# measurement"). Each stage is bounded; output accumulates in
# benchmarks/onchip_queue.log and the standard artifacts
# (TPU_CHECKS.json, BENCH_CACHE.json).
#
#   nohup bash benchmarks/onchip_queue.sh > /dev/null 2>&1 &
#
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/onchip_queue.log
say() { echo "[$(date -u +%H:%M:%S)] $*" >> "$LOG"; }

say "=== on-chip queue start ==="

say "--- tpu_checks (compiled regression tier) ---"
timeout 3600 python benchmarks/tpu_checks.py >> "$LOG" 2>&1
say "tpu_checks rc=$?"

say "--- bench.py (headline; refreshes BENCH_CACHE.json) ---"
timeout 1800 python bench.py >> "$LOG" 2>&1
say "bench rc=$?"

# scenarios, most-stale first (mrf reports all four dictionary kernels)
for sc in mrf mrf_pipeline mrf_fisp mrf_kspace bssfp_fit nufft nufft3d kspace field signal cest beffstream longpulse deeptime throughput recon freeprec32 tiny design64; do
  say "--- suite: $sc ---"
  timeout 2400 python benchmarks/suite.py "$sc" >> "$LOG" 2>&1
  say "suite[$sc] rc=$?"
done

say "=== on-chip queue done ==="
