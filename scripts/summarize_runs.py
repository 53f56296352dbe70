#!/usr/bin/env python
"""Summarize runs/<name>/metrics.jsonl into one table row each:
epochs, fps, reward first/peak/final, episode length, task metrics
(consecutive successes, success rate). Used for the round evidence
commits; reads only the JSONL, no device access."""

import json
import os
import sys

import numpy as np


def summarize(d):
    path = os.path.join("runs", d, "metrics.jsonl")
    if not os.path.exists(path):
        return None
    rows = [json.loads(l) for l in open(path)]
    if not rows:
        return None

    def col(k):
        v = [r.get(k) for r in rows if k in r and np.isfinite(r.get(k, 0))]
        return np.asarray(v) if v else None

    rew = col("rewards/episode")
    out = {"run": d, "epochs": len(rows)}
    fps = col("performance/step_fps")
    if fps is not None:
        out["fps"] = int(np.median(fps))
    if rew is not None and len(rew):
        out["rew_first"] = round(float(rew[min(10, len(rew) - 1)]), 1)
        out["rew_peak"] = round(float(np.max(rew)), 1)
        out["rew_final"] = round(float(rew[-1]), 1)
    el = col("episode_lengths/mean")
    if el is not None and len(el):
        out["eplen_final"] = round(float(el[-1]), 1)
    for k in ("train/episode/consecutive_successes", "train/episode/successes",
              "train/episode/success_rate", "train/episode/terrain_level_mean",
              "train/disc_acc_demo"):
        v = col(k)
        if v is not None and len(v):
            out[k.split("/")[-1] + "_peak"] = round(float(np.max(v)), 3)
            out[k.split("/")[-1] + "_final"] = round(float(v[-1]), 3)
    nan_epochs = sum(1 for r in rows
                     if not np.isfinite(r.get("train/loss", 0.0)))
    if nan_epochs:
        out["NAN_EPOCHS"] = nan_epochs
    return out


def main(names):
    if not names:
        names = sorted(os.listdir("runs"))
    for d in names:
        s = summarize(d)
        if s:
            print(json.dumps(s))


if __name__ == "__main__":
    main(sys.argv[1:])
