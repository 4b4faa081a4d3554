#!/bin/sh
# Round-2 TPU follow-ups, queued while the device tunnel was down.
# Run when `timeout 90 python -c "import jax; print(jax.devices())"`
# answers again.  Each step is independent and checkpoints incrementally,
# so a mid-run transport death loses nothing already measured.
set -x

# 1. Probe: refuse to start against a dead transport.
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel still dead — aborting" >&2; exit 1; }

# 2. The four 2^27 i64 rows the transport dropped mid-capture
#    (Performance/ has the Zeros row only; RESULTS_R2.md coverage note).
timeout 3000 python scripts/benchmark.py --min-log2 27 --max-log2 27 \
  --datatypes i64 \
  --datasets RandomDistributed,Random,Range,InvertedRange \
  --cpu-baselines --phases --perf-to-csv

# 3. BASELINE config2 (u32/u64 KV) measured on the streaming radix engine
#    (engine-suffixed result names — auto rows are not clobbered).
RST_ENGINE=pallas_stream timeout 3000 python scripts/baseline_configs.py 2

# 4. Headline contract check.
timeout 1200 python bench.py
