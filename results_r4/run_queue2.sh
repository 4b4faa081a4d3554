#!/bin/bash
# Round-4 queue 2 (reordered): falloff first (is the monolithic 2^27
# stable-KV compile even possible?), then the hardened headline rerun.
set -x
cd /root/repo
export PYTHONUNBUFFERED=1

timeout 5400 python scripts/falloff_probe.py 27 \
  > results_r4/falloff.log 2>&1
echo "falloff exit=$?" >> results_r4/queue_status.txt

# headline rerun with the escalating chain fallback
RST_CFG2_LOG2N=27 timeout 7200 python scripts/baseline_configs.py 2 \
  > results_r4/cfg2_2e27_try2.log 2>&1
echo "cfg2_try2 exit=$?" >> results_r4/queue_status.txt

timeout 5400 python scripts/chunked_probe.py 25 27 \
  > results_r4/chunked_ab.log 2>&1
echo "chunked_ab exit=$?" >> results_r4/queue_status.txt

# retries for queue-1 failures: overlap=2 dist probe OOM'd the remote
# compile helper at 2^25 — try the smaller program first, then 2^25 again
timeout 3600 python scripts/dist_overhead_probe.py 24 2 \
  > results_r4/dist_overhead_g2_24.log 2>&1
echo "dist_g2_24 exit=$?" >> results_r4/queue_status.txt
timeout 3600 python scripts/dist_overhead_probe.py 24 1 \
  > results_r4/dist_overhead_g1_24.log 2>&1
echo "dist_g1_24 exit=$?" >> results_r4/queue_status.txt
timeout 3600 python scripts/dist_overhead_probe.py 25 2 \
  > results_r4/dist_overhead_g2_try2.log 2>&1
echo "dist_g2_try2 exit=$?" >> results_r4/queue_status.txt
# A/B vs queue-1's G=1 2^25 run (548ms): that measured the pre-fcf966a
# shard program; this remeasures after the two-pass elimination
timeout 3600 python scripts/dist_overhead_probe.py 25 1 \
  > results_r4/dist_overhead_g1_try2.log 2>&1
echo "dist_g1_try2 exit=$?" >> results_r4/queue_status.txt

# small-n corpus rows (accelerator-loses regime), u32, all distributions
timeout 3600 python scripts/benchmark.py --min-log2 4 --max-log2 10 --step 2 \
  --datatypes u32 --perf-to-csv \
  > results_r4/corpus_smalln.log 2>&1
echo "corpus_smalln exit=$?" >> results_r4/queue_status.txt

# per-engine corpus rows: each engine decomposed by its own phases
for eng in pallas_stream xla_radix pallas_merge; do
  timeout 5400 python scripts/benchmark.py --min-log2 20 --max-log2 24 --step 2 \
    --datatypes u32 --datasets RandomDistributed --engine $eng --perf-to-csv \
    > results_r4/corpus_$eng.log 2>&1
  echo "corpus_$eng exit=$?" >> results_r4/queue_status.txt
done

# regenerate default-size BASELINE_RESULTS entries (n/engine stamps)
timeout 5400 python scripts/baseline_configs.py 1 2 3 4 \
  > results_r4/cfg_defaults.log 2>&1
echo "cfg_defaults exit=$?" >> results_r4/queue_status.txt
RST_FORCE_CPU_MESH=1 timeout 1800 python scripts/baseline_configs.py 5 \
  > results_r4/cfg5_cpu.log 2>&1
echo "cfg5 exit=$?" >> results_r4/queue_status.txt

# cfg34 retry: the 2^24 join compile outran queue-1's 3600s window, and
# the timeout dropped config3's completed entry (JSON written at exit)
RST_CFG34_LOG2N=24 timeout 7200 python scripts/baseline_configs.py 3 4 \
  > results_r4/cfg34_2e24_try2.log 2>&1
echo "cfg34_2e24_try2 exit=$?" >> results_r4/queue_status.txt

# stream partition re-run: queue-1's attempt smem-OOM'd at 2^24 with the
# (B, R) prefetch layout; this validates + measures the transposed (R, B)
# kernel on hardware at the size that failed
timeout 5400 python scripts/stream_partition_probe.py 22 24 \
  > results_r4/stream_partition_try2.log 2>&1
echo "stream_partition_try2 exit=$?" >> results_r4/queue_status.txt

# publish the scored metric + stamp the round-over-round series
python scripts/publish_baseline.py \
  > results_r4/publish.log 2>&1
echo "publish exit=$?" >> results_r4/queue_status.txt
python scripts/headline.py --round r4 \
  > results_r4/headline_r4.log 2>&1
echo "headline exit=$?" >> results_r4/queue_status.txt
echo "QUEUE2 DONE" >> results_r4/queue_status.txt
