#!/bin/bash
# Reproduce round-5's published evidence on the ambient TPU, one
# fault-isolated process per measurement (see CLAUDE.md for why), logs
# to results_repro/.  Total ~60-90 min of chip time.
set -x
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1
mkdir -p results_repro

# 1. the scored headline: u32 + u64 stable-KV at 2^27 (canonical command)
RST_CFG2_LOG2N=27 timeout 7200 python scripts/baseline_configs.py 2 \
  > results_repro/cfg2_2e27.log 2>&1
echo "cfg2 exit=$?"

# 2. the driver bench (self-checking 3-arm timing) — run twice; the two
#    values must agree within 10% (r5 measured 0.16%)
timeout 3600 python bench.py > results_repro/bench_run1.log 2>&1
timeout 3600 python bench.py > results_repro/bench_run2.log 2>&1
echo "bench exit=$?"

# 3. post-fix distributed overhead at D=1 (expect ~180%, not r4's 564%)
timeout 3600 python scripts/dist_overhead_probe.py 25 1 \
  > results_repro/dist_overhead_g1.log 2>&1
echo "dist exit=$?"

# 4. chunked-engine refutation at the headline size (expect ~0.28x/0.43x)
timeout 5400 python scripts/chunked_probe.py 27 \
  > results_repro/chunked_ab.log 2>&1
echo "chunked exit=$?"

# 5. publish from the fresh rows
python scripts/publish_baseline.py > results_repro/publish.log 2>&1
python scripts/headline.py > results_repro/headline.log 2>&1
echo "publish exit=$?"
echo "DONE — compare results_repro/ against results_r5/ and RESULTS_R5.md"
