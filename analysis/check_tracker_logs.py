"""Offline analysis of davison_tracker_internals.json.

Python/matplotlib equivalent of reference matlab/check_tracker_logs.m:
plots reprojection error, camera state vs ground truth with ±3σ envelopes,
residuals, and landmark-uncertainty medians. Also usable headless
(--no_show --out plots.png) and as a library (load + summarize).

Usage: python analysis/check_tracker_logs.py davison_tracker_internals.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def summarize(doc: dict) -> dict:
    frames = doc["Frames"]
    out = {
        "frames_count": doc["FramesCount"],
        "avg_frame_dur_ms": doc["AvgFrameProcessingDur"] * 1e3,
        "mean_reproj_err_meas": float(np.mean(
            [f["CurReprojErrMeas"] for f in frames])) if frames else 0.0,
        "final_estimated_sal_pnts": frames[-1]["EstimatedSalPnts"] if frames else 0,
    }
    if frames and "EstimErr" in frames[0]:
        errs = np.stack([np.asarray(f["EstimErr"]) for f in frames if "EstimErr" in f])
        out["pos_err_rms"] = float(np.sqrt(np.mean(np.sum(errs[:, :3] ** 2, axis=1))))
        if "EstimErrStd" in frames[0]:
            stds = np.stack([np.asarray(f["EstimErrStd"])[:3] for f in frames
                             if "EstimErrStd" in f])
            pos_err = np.linalg.norm(errs[:, :3], axis=1)
            env = 3 * np.linalg.norm(stds, axis=1) + 1e-12
            out["within_3sigma_frac"] = float(np.mean(pos_err <= env))
    return out


def plot(doc: dict, out_path: str | None = None, show: bool = True) -> None:
    import matplotlib
    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    frames = doc["Frames"]
    n = len(frames)
    t = np.arange(n)
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))

    ax = axes[0, 0]
    ax.plot(t, [f["CurReprojErrMeas"] for f in frames], label="measured")
    ax.plot(t, [f["CurReprojErrPred"] for f in frames], label="optimized")
    ax.set_title("reprojection error (pix)")
    ax.legend()

    ax = axes[0, 1]
    ax.plot(t, [f["EstimatedSalPnts"] for f in frames], label="estimated")
    ax.plot(t, [f["NewSalPnts"] for f in frames], label="new")
    ax.plot(t, [f["DeletedSalPnts"] for f in frames], label="deleted")
    ax.set_title("salient points")
    ax.legend()

    ax = axes[1, 0]
    if "EstimErr" in frames[0]:
        err = np.stack([np.asarray(f["EstimErr"])[:3] for f in frames])
        pos_err = np.linalg.norm(err, axis=1)
        ax.plot(t, pos_err, label="|pos err|")
        if "EstimErrStd" in frames[0]:
            std = np.stack([np.asarray(f["EstimErrStd"])[:3] for f in frames])
            ax.plot(t, 3 * np.linalg.norm(std, axis=1), "--", label="3 sigma")
        ax.legend()
    ax.set_title("camera position error vs envelope")

    ax = axes[1, 1]
    cam = np.stack([np.asarray(f["CamState"])[:3] for f in frames])
    ax.plot(cam[:, 0], cam[:, 1], label="estimated")
    if "CamStateGT" in frames[0]:
        gt = np.stack([np.asarray(f["CamStateGT"])[:3] for f in frames])
        ax.plot(gt[:, 0], gt[:, 1], "--", label="GT")
    ax.set_title("trajectory (x-y)")
    ax.legend()

    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=110)
        print(f"saved {out_path}")
    if show:
        plt.show()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("log", nargs="?", default="davison_tracker_internals.json")
    ap.add_argument("--out", default=None)
    ap.add_argument("--no_show", action="store_true")
    args = ap.parse_args()
    doc = load(args.log)
    for k, v in summarize(doc).items():
        print(f"{k}: {v}")
    plot(doc, out_path=args.out, show=not args.no_show)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
