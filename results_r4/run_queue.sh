#!/bin/bash
# Round-4 measurement queue — sequential (one TPU chip, no contention).
set -x
cd /root/repo
export PYTHONUNBUFFERED=1

# 1. THE headline: u32+u64 KV at 2^27, 4 distributions
RST_CFG2_LOG2N=27 timeout 7200 python scripts/baseline_configs.py 2 \
  > results_r4/cfg2_2e27.log 2>&1
echo "cfg2_2e27 exit=$?" >> results_r4/queue_status.txt

# 2. configs 3-4 at 2^24
RST_CFG34_LOG2N=24 timeout 3600 python scripts/baseline_configs.py 3 4 \
  > results_r4/cfg34_2e24.log 2>&1
echo "cfg34_2e24 exit=$?" >> results_r4/queue_status.txt

# 3. D=1 dist overhead probe, 2^25, overlap 1 then 2
timeout 3600 python scripts/dist_overhead_probe.py 25 1 \
  > results_r4/dist_overhead_g1.log 2>&1
echo "dist_g1 exit=$?" >> results_r4/queue_status.txt
timeout 3600 python scripts/dist_overhead_probe.py 25 2 \
  > results_r4/dist_overhead_g2.log 2>&1
echo "dist_g2 exit=$?" >> results_r4/queue_status.txt

# 4. stream partition probe 2^22 / 2^24
timeout 3600 python scripts/stream_partition_probe.py 22 24 \
  > results_r4/stream_partition.log 2>&1
echo "stream_partition exit=$?" >> results_r4/queue_status.txt

echo "ALL DONE" >> results_r4/queue_status.txt
