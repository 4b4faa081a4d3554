"""Track the BASELINE scored metric — u32 KV sort pairs/s/chip at 2^27 —
round over round (VERDICT r3 item 8: nothing tracked the actual scored
metric, which is how it went unmeasured for three rounds).

Reads the config2 2^27 entries out of BASELINE_RESULTS.json (produced by
``RST_CFG2_LOG2N=27 python scripts/baseline_configs.py 2``), prints ONE
JSON line per dtype with the headline number, and appends a stamped entry
to RESULTS_SERIES.json so the series survives rounds.

Usage:
  python scripts/headline.py                  # report latest + update series
  python scripts/headline.py --round r4       # stamp the series entry
  python scripts/headline.py --run            # re-measure first (real TPU)

bench.py's driver contract is untouched; this is the second, KV-stable
line of evidence.
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(ROOT, "BASELINE_RESULTS.json")
SERIES = os.path.join(ROOT, "RESULTS_SERIES.json")

# GTX 680 flagship row the headline must dwarf:
# /root/reference/Performance/performance_uniform.csv:101 — u32 2^25
# uniform, 740.664 ms -> 45.3 Mkeys/s (key-only; the reference never
# shipped KV — PERMUT commented out, src/RadixSortGPU.cpp:578).
REFERENCE_MKEYS = 45.3


def collect(results):
    out = {}
    for name, row in results.items():
        if not name.startswith("config2_kv_") or "_2^27" not in name:
            continue
        if row.get("failed"):
            # failed rows carry no rate; report them separately rather
            # than KeyError-ing after an expensive --run (ADVICE r4)
            print(json.dumps({"metric": name, "failed": row["failed"]}))
            continue
        parts = name.split("_")  # config2 kv u32 Zeros 2^27 [engine...]
        dt, dist = parts[2], parts[3]
        out.setdefault(dt, {})[dist] = row
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", default=None,
                    help="series stamp (e.g. r4); omit to only report")
    ap.add_argument("--run", action="store_true",
                    help="re-measure on the ambient backend first")
    args = ap.parse_args()

    if args.run:
        env = dict(os.environ, RST_CFG2_LOG2N="27")
        subprocess.run(
            [sys.executable,
             os.path.join(ROOT, "scripts", "baseline_configs.py"), "2"],
            env=env, check=True)

    if not os.path.exists(RESULTS):
        print(json.dumps({"error": "BASELINE_RESULTS.json missing"}))
        return 1
    with open(RESULTS) as f:
        results = json.load(f)
    per_dtype = collect(results)
    if not per_dtype:
        print(json.dumps({"error": "no config2 2^27 entries; run "
                          "RST_CFG2_LOG2N=27 scripts/baseline_configs.py 2"}))
        return 1

    lines = []
    for dt, dists in sorted(per_dtype.items()):
        vals = [r["mpairs_per_s"] for r in dists.values()]
        roofs = [r.get("roofline_frac") for r in dists.values()
                 if r.get("roofline_frac") is not None]
        valid = all(r.get("valid") for r in dists.values())
        rec = {
            "metric": f"{dt}_kv_sort_2^27",
            "unit": "Mpairs/s/chip",
            "value": round(min(vals), 1),          # conservative: worst dist
            "max_over_dists": round(max(vals), 1),
            "distributions": {d: r["mpairs_per_s"]
                              for d, r in sorted(dists.items())},
            "roofline_frac": round(min(roofs), 4) if roofs else None,
            "valid": valid,
        }
        if dt == "u32":
            rec["vs_reference_gtx680_keyonly_2^25"] = round(
                rec["value"] / REFERENCE_MKEYS, 1)
        print(json.dumps(rec))
        lines.append(rec)

    if args.round:
        series = []
        if os.path.exists(SERIES):
            with open(SERIES) as f:
                series = json.load(f)
        series = [e for e in series if e.get("round") != args.round]
        series.append({"round": args.round, "entries": lines})
        with open(SERIES, "w") as f:
            json.dump(series, f, indent=2)
        print(f"# series updated: {SERIES}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
