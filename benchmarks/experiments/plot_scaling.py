"""Render the scaling-study MXU curve from benchmarks/results/scaling.json.

One figure, two panels (MC=16 / MC=64): MXU utilization of the fused train
step vs hidden width, one line per batch size. Shows the three measured
regimes (docs/PERFORMANCE.md "Scaling study"): latency-bound at reference
scale, utilization rising with width/batch, and the HBM-roof fall-off at
65k decoder rows.

    python benchmarks/experiments/plot_scaling.py \
        [--json benchmarks/results/scaling.json] \
        [--out benchmarks/results/scaling_mxu.png]
"""

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# Reference data-viz palette (first three categorical slots, light mode —
# validated all-pairs: worst-pair CVD dE 9.2, normal-vision 24.0) + chrome.
SERIES = {64: "#2a78d6", 256: "#eb6834", 1024: "#1baf7a"}
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
MUTED = "#898781"
GRID = "#e1e0d9"
BASELINE = "#c3c2b7"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", default="benchmarks/results/scaling.json")
    ap.add_argument("--out", default="benchmarks/results/scaling_mxu.png")
    args = ap.parse_args()

    with open(args.json) as f:
        data = json.load(f)
    rows = [r for r in data["train"] if "mxu_utilization" in r]

    fig, axes = plt.subplots(
        1, 2, figsize=(9.2, 3.9), dpi=150, sharey=True,
        facecolor=SURFACE,
    )
    for ax, mc in zip(axes, (16, 64)):
        ax.set_facecolor(SURFACE)
        for batch, color in SERIES.items():
            pts = sorted(
                (r["hidden_width"], r["mxu_utilization"] * 100)
                for r in rows
                if r["n_batch"] == batch and r["n_mc_train"] == mc
            )
            if not pts:
                continue
            xs, ys = zip(*pts)
            ax.plot(xs, ys, color=color, linewidth=2, marker="o",
                    markersize=5, label=f"batch {batch}")
        ax.set_xscale("log", base=2)
        ax.set_xticks([128, 256, 512, 1024])
        ax.set_xticklabels(["128", "256", "512", "1024"], color=MUTED)
        ax.set_title(f"MC = {mc}", color=INK, fontsize=11)
        ax.set_xlabel("hidden width", color=MUTED)
        ax.grid(True, axis="y", color=GRID, linewidth=0.8)
        ax.tick_params(colors=MUTED, which="both")
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)
        for side in ("left", "bottom"):
            ax.spines[side].set_color(BASELINE)
        ax.set_ylim(0, None)

    axes[0].set_ylabel("MXU utilization (%)", color=MUTED)
    # reference-scale marker on the left panel (w128, b64, mc16)
    ref = next((r for r in rows
                if r["config"] == "w128_b64_mc16"), None)
    if ref is not None:
        axes[0].annotate(
            "reference scale (0.5%)",
            xy=(128, ref["mxu_utilization"] * 100),
            xytext=(150, 6.5), color=MUTED, fontsize=8.5,
            arrowprops=dict(arrowstyle="-", color=BASELINE, linewidth=0.8),
        )
    axes[1].legend(frameon=False, labelcolor=INK, fontsize=9,
                   loc="upper left")
    fig.suptitle(
        "Fused DPI-VAE train step: MXU utilization vs width "
        "(TPU v5e, one chip)",
        color=INK, fontsize=12, y=1.0,
    )
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, facecolor=SURFACE, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
