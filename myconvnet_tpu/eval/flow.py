"""Optical-flow metrics (fifteenth task family; the reference has no
flow metrics — SURVEY.md §2; mount empty, §0).

Average end-point error (AEPE, the FlyingChairs/Sintel headline) plus
the KITTI outlier fraction Fl (EPE > 3 px AND > 5% of the ground-
truth magnitude).  Per-image means averaged over images — the Sintel
convention — on host numpy (microseconds per batch next to the
forward pass).  NaN ground-truth components (the .flo "unknown"
sentinel, subsets/flow.py) are masked out.
"""

from __future__ import annotations

import numpy as np

from myconvnet_tpu.eval.evaluators import Evaluator


class FlowEvaluator(Evaluator):
    """Streaming AEPE / Fl-outlier metrics.

    ``update(preds, labels)``: both ``[N, H, W, 2]`` pixel flows.
    ``metric`` picks the headline: ``epe`` (default, lower is better)
    or ``fl`` (outlier fraction, lower).  ``report()`` returns both
    plus the <1px / <3px inlier rates.
    """

    name = "flow"
    higher_is_better = False

    def __init__(self, metric: str = "epe"):
        if metric not in ("epe", "fl"):
            raise ValueError(f"unknown flow metric {metric!r}; valid: "
                             "['epe', 'fl']")
        self.metric = metric
        self.reset()

    def reset(self):
        self._sums = dict.fromkeys(("epe", "fl", "px1", "px3"), 0.0)
        self._images = 0

    def update(self, preds, labels):
        p_all = np.asarray(preds, np.float64)
        t_all = np.asarray(labels, np.float64)
        for p, t in zip(p_all, t_all):
            valid = np.isfinite(t).all(axis=-1)
            if not valid.any():
                continue
            pv, tv = p[valid], t[valid]
            epe = np.sqrt(np.sum((pv - tv) ** 2, axis=-1))
            mag = np.sqrt(np.sum(tv ** 2, axis=-1))
            s = self._sums
            s["epe"] += float(np.mean(epe))
            s["fl"] += float(np.mean((epe > 3.0) & (epe > 0.05 * mag)))
            s["px1"] += float(np.mean(epe < 1.0))
            s["px3"] += float(np.mean(epe < 3.0))
            self._images += 1

    def report(self, names=None) -> dict:
        del names  # uniform test.py --report call shape
        n = max(self._images, 1)
        return {k: self._sums[k] / n for k in ("epe", "fl", "px1",
                                               "px3")}

    def score(self) -> float:
        return self.report()[self.metric]
