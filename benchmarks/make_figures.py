"""Figure export over the committed benchmark artifacts.

The analysis layer the reference ships as notebook plots, rebuilt over this
repo's json evidence:

- flow convergence log-plots  <-> ``Flow_cube.ipynb`` cell 11 (per-method
  exact-W2 curves; rows carry ``eval_curve`` once produced by
  ``flow_parity.py``)
- WD-vs-CD sensitivity sweeps <-> ``WD_vs_CD_graph.ipynb`` (Chamfer plateaus
  under occlusion-free rotation while exact W stays monotone)
- WD-vs-KL study              <-> ``Comparison_Wasserstein_with_KL/
  WD_vs_KL_graph.ipynb``
- success-ratio curves        <-> ``test_ERROR.py:247-268`` threshold sweeps
- robustness curves           <-> the noise/outlier matrix
  (train_RUNNER.py:174-190)

Usage: python benchmarks/make_figures.py [--out figures]
Writes PNGs; skips any figure whose source json is absent.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

HERE = os.path.dirname(os.path.abspath(__file__))

# categorical palette (validated fixed slot order; see the repo's figure
# conventions — identity never rides on color alone: every line is
# direct-labeled at its end)
SLOTS = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4", "#008300"]
MUTED = "#b3b2ab"
INK = "#0b0b0b"
INK2 = "#52514e"
SURFACE = "#fcfcfb"

plt.rcParams.update({
    "figure.facecolor": SURFACE, "axes.facecolor": SURFACE,
    "savefig.facecolor": SURFACE,
    "text.color": INK, "axes.labelcolor": INK2, "xtick.color": INK2,
    "ytick.color": INK2, "axes.edgecolor": INK2,
    "axes.grid": True, "grid.color": "#e8e7e2", "grid.linewidth": 0.6,
    "axes.axisbelow": True, "axes.spines.top": False,
    "axes.spines.right": False, "font.size": 9, "legend.frameon": False,
})


def _load(name):
    path = os.path.join(HERE, f"{name}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _save(fig, out_dir, name):
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.png")
    fig.savefig(path, dpi=160, bbox_inches="tight")
    plt.close(fig)
    print("wrote", path)


def _label_ends(ax, items, min_gap=0.04):
    """Direct labels at line ends, nudged apart vertically so stacked
    endpoints stay readable. items: list of (x, y, text, color)."""
    if not items:
        return
    ax.relim()
    ax.autoscale_view()   # transforms are stale until a draw otherwise

    def to_frac(y):
        return ax.transAxes.inverted().transform(
            ax.transData.transform((0, y)))[1]

    def to_data(fy):
        return ax.transData.inverted().transform(
            ax.transAxes.transform((0, fy)))[1]

    labs = sorted([to_frac(y), x, text, color] for x, y, text, color in items)
    for i in range(1, len(labs)):
        if labs[i][0] - labs[i - 1][0] < min_gap:
            labs[i][0] = labs[i - 1][0] + min_gap
    overflow = labs[-1][0] - 0.98      # keep the stack inside the axes
    if overflow > 0:
        for lab in labs:
            lab[0] -= overflow
    for fy, x, text, color in labs:
        ax.annotate(f" {text}", (x, to_data(fy)), fontsize=7.5, color=color,
                    va="center", ha="left", annotation_clip=False)


def flow_convergence(out_dir, experiment="cube", metric="w2"):
    suffix = "" if metric == "w2" else f"_{metric}"
    rows = _load(f"results_{experiment}{suffix}")
    if not rows:
        return
    rows = [r for r in rows if "eval_curve" in r]
    if not rows:
        print(f"results_{experiment}{suffix}: no rows carry eval_curve yet; "
              "re-run flow_parity.py to record curves")
        return
    highlight = ["SHWD", "ASWD", "SWD", "CD"]
    fig, ax = plt.subplots(figsize=(6.4, 4.2))
    labels = []
    for r in rows:                       # muted context first, color on top
        if r["method"] in highlight:
            continue
        ax.semilogy(r["eval_iters"], r["eval_curve"], color=MUTED,
                    lw=1.1, zorder=1)
        labels.append((r["eval_iters"][-1], r["eval_curve"][-1],
                       r["method"], INK2))
    by_name = {r["method"]: r for r in rows}
    for slot, name in enumerate(highlight):
        r = by_name.get(name)
        if r is None:
            continue
        ax.semilogy(r["eval_iters"], r["eval_curve"], color=SLOTS[slot],
                    lw=1.8, zorder=2, label=name)
        labels.append((r["eval_iters"][-1], r["eval_curve"][-1], name,
                       SLOTS[slot]))
    _label_ends(ax, labels, min_gap=0.032)
    ax.set_xlabel("flow iteration")
    ax.set_ylabel("exact $W_2$" if metric == "w2" else "Chamfer distance")
    ax.set_title(f"Gradient-flow convergence — {experiment}", color=INK)
    ax.legend(loc="lower left", fontsize=8)
    _save(fig, out_dir, f"flow_convergence_{experiment}{suffix}")


def wd_vs_cd(out_dir, mode="rotation"):
    d = _load(f"sweep_{mode}")
    if d is None:
        return
    unit = "rotation limit (deg)" if mode == "rotation" else \
        "translation limit"
    fig, ax = plt.subplots(figsize=(5.6, 3.8))
    labels = []
    for slot, (name, label) in enumerate(
            [("wasserstein", "exact W"), ("sinkhorn", "Sinkhorn"),
             ("chamfer", "Chamfer")]):
        y = d[name]
        top = max(y) or 1.0
        yn = [v / top for v in y]
        ax.plot(d["grid"], yn, color=SLOTS[slot], lw=1.8, label=label)
        labels.append((d["grid"][-1], yn[-1], label, SLOTS[slot]))
    _label_ends(ax, labels)
    ax.set_xlabel(unit)
    ax.set_ylabel("mean metric / max")
    ax.set_title(f"Metric sensitivity vs {mode}", color=INK)
    ax.legend(loc="upper left", fontsize=8)
    _save(fig, out_dir, f"wd_vs_cd_{mode}")


def wd_vs_kl(out_dir):
    d = _load("sweep_kl")
    if d is None:
        return
    fig, axes = plt.subplots(1, 2, figsize=(7.6, 3.2), sharex=True)
    for ax, key, label in [(axes[0], "kl", "KL divergence"),
                           (axes[1], "w2", "$W_2$")]:
        ax.plot(d["translations"], d[key], color=SLOTS[0], lw=1.8)
        ax.set_xlabel("translation $\\|t\\|$")
        ax.set_title(label, color=INK, fontsize=10)
    fig.suptitle("Translated Gaussians: KL explodes quadratically, "
                 "$W_2$ stays linear", color=INK, fontsize=10, y=1.04)
    _save(fig, out_dir, "wd_vs_kl")


def success_curves(out_dir):
    import glob
    paths = sorted(glob.glob(os.path.join(HERE, "eval_*.json")))
    runs = [json.load(open(p)) for p in paths]
    if not runs:
        return
    fig, axes = plt.subplots(1, 2, figsize=(7.6, 3.2))
    for slot, d in enumerate(runs):
        # label by experiment (criterion collides: w_cos appears for the
        # sinkhorn-trained, hybrid-trained and N=1024 runs)
        name = d.get("experiment", d["criterion"])
        name = name.replace("bench_", "")
        label = f"{name} ({d['mean_rot_error_deg']:.1f}°)"
        axes[0].plot(d["rot_thresholds_deg"], d["rot_success_ratio"],
                     color=SLOTS[slot % len(SLOTS)], lw=1.8, label=label)
        axes[1].plot(d["trans_thresholds"], d["trans_success_ratio"],
                     color=SLOTS[slot % len(SLOTS)], lw=1.8)
    axes[0].set_xlabel("rotation-error threshold (deg)")
    axes[0].set_ylabel("success ratio")
    axes[0].legend(loc="lower right", fontsize=8)
    axes[1].set_xlabel("translation-error threshold")
    fig.suptitle("Success-ratio curves on the held-out split "
                 "(mean rot error per criterion)", color=INK,
                 fontsize=10, y=1.02)
    _save(fig, out_dir, "success_curves")


def robustness(out_dir):
    rows = _load("robustness_tpu")
    if not rows:
        return
    fig, ax = plt.subplots(figsize=(5.6, 3.8))
    labels = []
    for slot, r in enumerate(rows):
        y = r["rot_curve_every10"]
        x = [1 + 10 * i for i in range(len(y))]
        ax.plot(x, y, color=SLOTS[slot % len(SLOTS)], lw=1.8,
                label=r["setting"])
        labels.append((x[-1], y[-1], r["setting"], SLOTS[slot % len(SLOTS)]))
    _label_ends(ax, labels)
    ax.set_xlabel("epoch")
    ax.set_ylabel("val rotation error (deg)")
    ax.set_title("W_COS registration under noise / outliers", color=INK)
    ax.legend(fontsize=8)
    _save(fig, out_dir, "robustness")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(HERE, "figures"))
    args = ap.parse_args()
    for exp in ("cube", "ellipsoid", "ellipsoid_2"):
        flow_convergence(args.out, exp)
        flow_convergence(args.out, exp, metric="cd")
    wd_vs_cd(args.out, "rotation")
    wd_vs_cd(args.out, "translation")
    wd_vs_kl(args.out)
    success_curves(args.out)
    robustness(args.out)


if __name__ == "__main__":
    main()
