"""Compare the end-of-round BENCH_LAST.json against the round-11
baseline run (committed at f6dfe83) — per-query deltas for
OPTIMIZATION_r11.md. Usage: python scripts/compare_bench_r11.py"""

import json
import subprocess

base = json.loads(
    subprocess.check_output(
        ["git", "show", "f6dfe83:BENCH_LAST.json"], cwd="/root/repo"
    )
)["queries"]
now = json.load(open("/root/repo/BENCH_LAST.json"))["queries"]

rows = []
for k in sorted(set(base) & set(now)):
    if base[k] >= 0.3 or now[k] >= 0.3:
        rows.append((now[k] / base[k], k, base[k], now[k]))
rows.sort()
print(f"{'ratio':>6}  {'query':<36} {'base':>7} {'now':>7}")
for r, k, b, n in rows:
    if r < 0.85 or r > 1.25:
        print(f"{r:6.2f}  {k:<36} {b:7.3f} {n:7.3f}")
tot_b = sum(base.values())
tot_n = sum(now[k] for k in now)
import math

common = [(k) for k in set(base) & set(now)]
geo = math.exp(
    sum(math.log(now[k] / base[k]) for k in common if base[k] > 0.05 and now[k] > 0.05)
    / len(common)
)
print(f"\ntotal base {tot_b:.1f}s -> now {tot_n:.1f}s; geomean ratio {geo:.3f}")
