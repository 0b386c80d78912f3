"""Merge an extra_leg.py repeat into scaling_results.json (best-of-N).

Appends the new repeat to the recorded repeat list of the matching leg
of the matching weak point.  If the new repeat is the new best, the
point's derived fields (best sec, pages/s, raw + speed-corrected weak
efficiency, work linearity, occupancy/dead/tail/spin for that leg) are
recomputed from the new run's own instrumentation; otherwise only the
repeat list grows.  All repeats remain recorded either way — the
estimator stays best-of-N with full history, same as scaling_bench.py.

Usage: python tools/merge_extra_leg.py <cores> <n_pages_of_leg>
"""
import json
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cores, n = int(sys.argv[1]), int(sys.argv[2])

with open(os.path.join(repo, "tools", f"extra_leg_{cores}c_{n}.json")) as f:
    new = json.load(f)
path = os.path.join(repo, "tools", "scaling_results.json")
with open(path) as f:
    res = json.load(f)

lo, hi = res["lo_cores"], res["hi_cores"]
factor = hi // lo
assert cores in (lo, hi), cores
side = "lo" if cores == lo else "hi"
base = n if cores == lo else n // factor
[pt] = [p for p in res["weak_curve"] if p["base_pages"] == base]

secs_key = f"all_secs_{cores}c"
pt[secs_key] = pt[secs_key] + [new["sec"]]
old_best = pt[f"sec_{lo}c"] if side == "lo" else pt[f"sec_{hi}c_{factor}x"]
print(f"leg {cores}c/{n}: new repeat {new['sec']}s vs best {old_best}s")
if new["sec"] < old_best:
    # speed of a leg = mean of its before/after spin controls
    def speed(rec, key):
        return (rec["spin_before"][key] + rec["spin_after"][key]) / 2

    # other leg's stats come from the stored curve entry
    o_cores = hi if side == "lo" else lo
    o_sec = pt[f"sec_{hi}c_{factor}x"] if side == "lo" else pt[f"sec_{lo}c"]
    o_spin = pt["spin"][f"{o_cores}c"]
    o_speed = lambda key: (o_spin["before"][key] + o_spin["after"][key]) / 2
    # busy task-seconds of the other leg, from its occupancy trace
    o_busy = pt["occupancy"][f"{o_cores}c"] * o_cores * o_sec

    if side == "lo":
        t_lo, t_hi = new["sec"], o_sec
        s_lo, s_hi = speed(new, "mean"), o_speed("mean")
        s_lo_min, s_hi_min = speed(new, "min"), o_speed("min")
        busy_lo, busy_hi = new["busy_task_secs"], o_busy
        pt[f"sec_{lo}c"] = new["sec"]
    else:
        t_lo, t_hi = o_sec, new["sec"]
        s_lo, s_hi = o_speed("mean"), speed(new, "mean")
        s_lo_min, s_hi_min = o_speed("min"), speed(new, "min")
        busy_lo, busy_hi = o_busy, new["busy_task_secs"]
        pt[f"sec_{hi}c_{factor}x"] = new["sec"]

    pt[f"pages_per_sec_{lo}c"] = round(base / t_lo, 1)
    pt[f"pages_per_sec_{hi}c"] = round(base * factor / t_hi, 1)
    pt["weak_efficiency"] = round(t_lo / t_hi, 3)
    pt["weak_eff_speed_mean"] = round(t_lo * s_lo / (t_hi * s_hi), 3)
    pt["weak_eff_speed_min"] = round(t_lo * s_lo_min / (t_hi * s_hi_min), 3)
    pt["work_linearity"] = round(busy_hi * s_hi / (factor * busy_lo * s_lo), 3)
    pt["occupancy"][f"{cores}c"] = new["occupancy"]
    pt["dead_frac"][f"{cores}c"] = new["dead_frac"]
    pt["tail_frac"][f"{cores}c"] = new["tail_frac"]
    pt["spin"][f"{cores}c"] = {
        "before": new["spin_before"], "after": new["spin_after"]
    }
    print(f"  new best: weak_eff {pt['weak_efficiency']} "
          f"speed-corr {pt['weak_eff_speed_mean']}/{pt['weak_eff_speed_min']} "
          f"work_lin {pt['work_linearity']}")

# keep the flat times map and strong-scaling ratios consistent
res["times"][f"{cores}c_{n}"] = min(res["times"][f"{cores}c_{n}"], new["sec"])
for x, eff in list(res.get("strong_efficiency", {}).items()):
    t4, t16 = res["times"].get(f"{lo}c_{x}"), res["times"].get(f"{hi}c_{x}")
    if t4 and t16:
        res["strong_efficiency"][x] = round(t4 / (factor * t16), 3)

with open(path, "w") as f:
    json.dump(res, f, indent=1)
print("merged into", path)
