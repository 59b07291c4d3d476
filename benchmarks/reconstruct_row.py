"""Reconstruct a registration_tpu.json row from a (possibly killed) run's
metrics.jsonl (tpu-tunnel-stalls playbook: per-epoch history persists)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

exp = sys.argv[1]                       # e.g. bench_w_cos_1024_ssw
crit = sys.argv[2]                      # row 'criterion' name
point_num = int(sys.argv[3]) if len(sys.argv) > 3 else 128
solver = sys.argv[4] if len(sys.argv) > 4 else None

hist = []
with open(os.path.join("log", exp, "metrics.jsonl")) as f:
    for line in f:
        r = json.loads(line)
        if "rot_error" in r:
            hist.append(r)
if not hist:
    raise SystemExit("no epochs recorded")
row = {
    "criterion": crit, "epochs": len(hist),
    "point_num": point_num, "solver": solver,
    "num_synthetic": 2048,
    "reconstructed_from": f"log/{exp}/metrics.jsonl (run killed by stage timeout)",
    "s_per_epoch": sum(r.get("seconds", 0.0) for r in hist[1:])
                    / max(len(hist) - 1, 1),   # [0] includes compile
    "first_rot_error": hist[0]["rot_error"],
    "best_rot_error": min(r["rot_error"] for r in hist),
    "best_trans_error": min(r["trans_error"] for r in hist),
    "final_rot_error": hist[-1]["rot_error"],
    "final_trans_error": hist[-1]["trans_error"],
    "rot_curve_every10": [r["rot_error"] for r in hist[::10]],
}
print(json.dumps(row))
out = "benchmarks/registration_tpu.json"
rows = json.load(open(out)) if os.path.exists(out) else []
if not any(r["criterion"] == crit and r["epochs"] >= row["epochs"] for r in rows):
    rows = [r for r in rows if r["criterion"] != crit]
    rows.append(row)
    json.dump(rows, open(out, "w"), indent=1)
    print("row written")
else:
    print("existing row is complete; kept")
