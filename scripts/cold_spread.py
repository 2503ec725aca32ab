"""Measure the cold-run (compile-inclusive) spread across fresh
processes — round-4 verdict #7: the first-run metric wandered 117-240 s
across processes on the same HEAD with no recorded bound.

Runs `python bench.py` N times in FRESH processes (BENCH_COLD_ONLY=1 so
each run is one cold pipeline), records every cold_s, and writes
COLD_SPREAD.json keyed by the bench metric.  bench.py merges the entry
for its config into its own JSON line as `cold_spread`, so the driver's
BENCH_r{N}.json carries the distribution.

Usage:  python scripts/cold_spread.py [N]     (default 3)
Existing samples for the same metric are appended to, so spread data
accumulates across sessions at the same HEAD.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "COLD_SPREAD.json")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    for i in range(n):
        env = dict(os.environ, BENCH_COLD_ONLY="1")
        print(f"cold run {i + 1}/{n} ...", flush=True)
        proc = subprocess.run([sys.executable, "bench.py"], cwd=ROOT,
                              env=env, capture_output=True, text=True)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("{")]
        if not line:
            print(f"  run failed (rc={proc.returncode}):\n"
                  f"{proc.stderr[-2000:]}", file=sys.stderr)
            continue
        rec = json.loads(line[-1])
        metric = rec["metric"]
        ent = data.setdefault(metric, {"cold_samples_s": []})
        ent["cold_samples_s"].append(rec["cold_s"])
        print(f"  cold {rec['cold_s']}s", flush=True)
    for metric, ent in data.items():
        s = sorted(ent["cold_samples_s"])
        ent["min_s"] = s[0]
        ent["median_s"] = s[len(s) // 2]
        ent["max_s"] = s[-1]
        ent["max_over_min"] = round(s[-1] / s[0], 2)
        ent["n"] = len(s)
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(data, indent=1))


if __name__ == "__main__":
    main()
