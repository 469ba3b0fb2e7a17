#!/usr/bin/env python3
"""Aggregate scaling runs -> markdown table + efficiency. eff = T8_med / (4 * T32_med)
is wrong way; with 4x threads ideal time is T8/4, so eff = (T8/4) / T32 = T8 / (4*T32)."""
import json, sys, statistics
out = sys.argv[1]
def med(p):
    runs = [json.load(open(f"{out}/run_{p}_{i}.json")) for i in (1, 2, 3)]
    stages = {k: statistics.median(r["queries"][k] for r in runs)
              for k in runs[0]["queries"]}
    total = statistics.median(r["value"] for r in runs)
    return total, stages, runs[0]
t8, s8, r8 = med(8)
t32, s32, r32 = med(32)
eff = t8 / (4 * t32)
lines = []
lines.append("| stage/query | local[8] med s | local[32] med s | speedup | eff (x/4) |")
lines.append("| --- | --- | --- | --- | --- |")
for k in s8:
    sp = s8[k] / s32[k] if s32[k] > 0 else float("nan")
    lines.append(f"| {k} | {s8[k]:.2f} | {s32[k]:.2f} | {sp:.2f}x | {sp/4:.2f} |")
lines.append(f"| **TOTAL** | **{t8:.2f}** | **{t32:.2f}** | **{t8/t32:.2f}x** | **{eff:.2f}** |")
print("\n".join(lines))
print(f"\nscaling efficiency (total, T8/(4*T32)) = {eff:.3f}")
d8, d32 = r8.get("detail", {}), r32.get("detail", {})
print(f"input points: {d8.get('input_points')}")
for k in ("pps_rollup_15min", "pps_rollup_1h", "pps_rollup_1d", "pps_gorilla_encode"):
    print(f"{k}: 8thr={d8.get(k)} 32thr={d32.get(k)}")
print(f"gorilla bytes/point: {d8.get('gorilla_bytes_per_point')}")
