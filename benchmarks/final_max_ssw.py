"""Train the best max_ssw probe variant to the flagship budget (VERDICT r4 #8).

Reads the 60-epoch batch-3 probe histories (log/probe_{J,K,L}*/metrics.jsonl,
plus the r3 winner E's pinned config as baseline), picks the variant with the
best (min over epochs) rotation error, trains it for 800 epochs and appends
the row to benchmarks/registration_tpu.json as criterion 'max_ssw'.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shwd_tpu.data import DatasetConfig, RegistrationDataset, TransformConfig
from shwd_tpu.losses.ssw_loss import MaxSSWConfig
from shwd_tpu.train import TrainConfig, Trainer

VARIANTS = {
    "E_mlp_lr9e-5_it1": ("mlp", MaxSSWConfig(
        num_projections=100, max_iter=1, phi_lr=9.213233310357477e-05)),
    "J_mlp_lr9e-5_L512": ("mlp", MaxSSWConfig(
        num_projections=512, max_iter=1, phi_lr=9.213233310357477e-05)),
    "K_enc_lr9e-5_it1": ("encoder_flow", MaxSSWConfig(
        num_projections=100, max_iter=1, phi_lr=9.213233310357477e-05)),
    "L_mlp_lr3e-4_L256": ("mlp", MaxSSWConfig(
        num_projections=256, max_iter=1, phi_lr=3e-4)),
    # r5 batch 4 (VERDICT r4 #4: translation collapse at L=512)
    "M_mlp_lr3e-5_L512": ("mlp", MaxSSWConfig(
        num_projections=512, max_iter=1, phi_lr=3e-5)),
    "O_mlp_frozen_L512": ("mlp", MaxSSWConfig(
        num_projections=512, max_iter=0, phi_lr=9.213233310357477e-05)),
    "P_mlp_lr9e-5_L512_p1": ("mlp", MaxSSWConfig(
        num_projections=512, max_iter=1, phi_lr=9.213233310357477e-05,
        p=1.0)),
    "Q_mlp_lr9e-5_L512_mb32": ("mlp", MaxSSWConfig(
        num_projections=512, max_iter=1, phi_lr=9.213233310357477e-05,
        minibatch=32)),
}


def probe_best(name):
    """Probe score = best over epochs of rot + 100*trans (BOTH errors in
    the acceptance, VERDICT r4 #4 — 0.02 trans is worth 2 deg rot)."""
    p = Path("log") / f"probe_{name}" / "metrics.jsonl"
    if not p.exists():
        return None
    vals = []
    for l in p.read_text().splitlines():
        if "rot_error" not in l:
            continue
        r = json.loads(l)
        vals.append(r["rot_error"] + 100.0 * r.get("trans_error", 0.0))
    return min(vals) if vals else None


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    scores = {}
    scores_source = "live probe histories (log/probe_*/metrics.jsonl)"
    for name in VARIANTS:
        b = probe_best(name)
        if b is not None:
            scores[name] = b
    # E has no probe dir under this name: its 30/60-epoch history exists as
    # probe_E_old_lr9e-5_it1 from the r3 sweep
    e_b = probe_best("E_old_lr9e-5_it1")
    if e_b is not None:
        scores["E_mlp_lr9e-5_it1"] = min(
            scores.get("E_mlp_lr9e-5_it1", 1e9), e_b)
    if not scores:
        # probe checkpoints/metrics live under the gitignored log/ dir; when
        # the workspace is reset between rounds the histories vanish but the
        # batch-3 result is recorded in benchmarks/queue_r4b.log (stage J):
        # J_mlp_lr9e-5_L512 best 21.7 deg @60ep vs E 28.6 / K 26.1 / L div.
        # ADVICE r4: this fallback must be machine-distinguishable from live
        # measurements — tagged in stdout AND in the committed row.
        scores_source = ("FALLBACK: recorded batch-3 probe results from "
                         "queue_r4b.log stage J (live histories absent)")
        print("FALLBACK probe scores (recorded, not re-measured)", flush=True)
        scores = {"J_mlp_lr9e-5_L512": 21.706811904907227,
                  "E_mlp_lr9e-5_it1": 28.587932586669922,
                  "K_enc_lr9e-5_it1": 26.130638122558594,
                  "L_mlp_lr3e-4_L256": 45.88914489746094}
    winner = min(scores, key=scores.get)
    print("probe scores:", json.dumps(scores), "-> winner:", winner, flush=True)
    chart, mcfg = VARIANTS[winner]

    cfg = TrainConfig(
        experiment="bench_max_ssw",
        log_dir="log",
        criterion="max_ssw", max_ssw_chart=chart, max_ssw=mcfg,
        dataset=DatasetConfig(
            source_point_num=128, target_point_num=128, num_synthetic=2048,
            synthetic_kinds=("composite",), cache_dir="modelnet_cache",
            transform=TransformConfig(noise_sigma=0.02)),
        num_epochs=epochs, batch_size=128, pcr_iteration_num=3)
    tr = Trainer(cfg)
    ds = RegistrationDataset(cfg.dataset, "train")
    t0 = time.perf_counter()
    res = tr.fit(ds, verbose=True)
    dt = time.perf_counter() - t0
    h = res["history"]
    row = {
        "criterion": "max_ssw", "epochs": epochs, "num_synthetic": 2048,
        "variant": winner, "probe_scores_60ep": scores,
        "probe_scores_source": scores_source,
        "total_s": dt, "s_per_epoch": dt / epochs,
        "first_rot_error": h[0]["rot_error"],
        "best_rot_error": res["best"]["rot"],
        "best_trans_error": res["best"]["trans"],
        "final_rot_error": h[-1]["rot_error"],
        "final_trans_error": h[-1]["trans_error"],
        "best_combined_rot_plus_100trans": min(
            r["rot_error"] + 100.0 * r["trans_error"] for r in h),
        "rot_curve_every10": [r["rot_error"] for r in h[::10]],
        "trans_curve_every10": [r["trans_error"] for r in h[::10]],
    }
    print(json.dumps(row), flush=True)
    out = Path("benchmarks/registration_tpu.json")
    rows = json.loads(out.read_text()) if out.exists() else []
    old = next((r for r in rows if r["criterion"] == "max_ssw"), None)
    marker = Path("benchmarks/.max_ssw_improved")

    def score(r):
        """Same dual-error acceptance as the probes. For rows without the
        combined field, recover the per-epoch joint min from the curves
        when possible — best_rot + 100*best_trans mixes different epochs
        and scores the old row optimistically (code-review r5)."""
        if "best_combined_rot_plus_100trans" in r:
            return r["best_combined_rot_plus_100trans"]
        rc, tc = r.get("rot_curve_every10"), r.get("trans_curve_every10")
        if rc and tc and len(rc) == len(tc):
            return min(a + 100.0 * b for a, b in zip(rc, tc))
        return r["best_rot_error"] + 100.0 * r["best_trans_error"]

    if old is not None and score(old) <= score(row):
        # keep the better committed run as the headline; record this attempt
        # honestly under its own key so the evidence is not silently dropped
        row["criterion"] = "max_ssw_retrain_r4"
        rows = [r for r in rows if r["criterion"] != "max_ssw_retrain_r4"]
        rows.append(row)
        marker.unlink(missing_ok=True)
        print(f"KEPT_OLD (old best {old['best_rot_error']:.2f} <= "
              f"new {row['best_rot_error']:.2f})", flush=True)
    else:
        rows = [r for r in rows if r["criterion"] not in
                ("max_ssw", "max_ssw_retrain_r4")]
        rows.append(row)
        marker.write_text("1")
        print("IMPROVED", flush=True)
    out.write_text(json.dumps(rows, indent=1))
    print("DONE max_ssw", flush=True)


if __name__ == "__main__":
    main()
