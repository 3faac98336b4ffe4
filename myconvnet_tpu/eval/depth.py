"""Monocular-depth metrics (fourteenth task family; the reference has
no dense-regression metrics — SURVEY.md §2; mount empty, §0).

The standard Eigen protocol over valid pixels (gt > 0): AbsRel,
RMSE, RMSE(log), log10, and the threshold accuracies
delta < 1.25 / 1.25^2 / 1.25^3.  Metrics are computed PER IMAGE and
averaged over images — the convention of the published
monodepth/BTS/Eigen-split evaluation scripts (RMSE in particular is
the mean of per-image roots, not the root of a pooled mean, and
images with few valid pixels weigh the same as dense ones).
Accumulation is streaming sums on host numpy (per eval batch the
reductions are microseconds next to the forward pass), matching
every other evaluator's ``update(outputs, labels)`` contract —
predictions ``[N, H, W, 1]`` meters, labels ``[N, H, W, 1]`` meters
with 0 = invalid.

``median_scaling`` rescales each prediction by ``median(gt)/
median(pred)`` before scoring — the protocol for models trained
without metric supervision (monodepth-style); OFF by default since
the supervised recipe learns metric depth.
"""

from __future__ import annotations

import numpy as np

from myconvnet_tpu.eval.evaluators import Evaluator

_METRICS = ("absrel", "rmse", "rmse_log", "log10",
            "delta1", "delta2", "delta3")


class DepthEvaluator(Evaluator):
    """Streaming Eigen-protocol depth metrics.

    ``metric`` picks the headline score: ``absrel`` (default, lower is
    better), ``rmse``, ``rmse_log``, ``log10`` (lower) or ``delta1`` /
    ``delta2`` / ``delta3`` (higher).  ``report()`` returns all seven.
    """

    def __init__(self, metric: str = "absrel",
                 min_depth: float = 1e-3, max_depth: float = np.inf,
                 median_scaling: bool = False):
        if metric not in _METRICS:
            raise ValueError(f"unknown depth metric {metric!r}; "
                             f"valid: {list(_METRICS)}")
        self.metric = metric
        self.min_depth = float(min_depth)
        self.max_depth = float(max_depth)
        self.median_scaling = bool(median_scaling)
        self.reset()

    name = "depth"

    @property
    def higher_is_better(self) -> bool:
        return self.metric.startswith("delta")

    def reset(self):
        self._sums = dict.fromkeys(_METRICS, 0.0)
        self._images = 0

    def update(self, preds, labels):
        p_all = np.asarray(preds, np.float64)
        t_all = np.asarray(labels, np.float64)
        for p, t in zip(p_all, t_all):  # per image, then mean-of-images
            mask = (t > max(self.min_depth, 0.0)) & (t < self.max_depth)
            if not mask.any():
                continue
            pv, tv = p[mask], t[mask]
            if self.median_scaling:
                pv = pv * (np.median(tv) / max(np.median(pv), 1e-12))
            pv = np.clip(pv, self.min_depth,
                         None if np.isinf(self.max_depth)
                         else self.max_depth)
            err = pv - tv
            log_err = np.log(pv) - np.log(tv)
            ratio = np.maximum(pv / tv, tv / pv)
            s = self._sums
            s["absrel"] += float(np.mean(np.abs(err) / tv))
            s["rmse"] += float(np.sqrt(np.mean(err * err)))
            s["rmse_log"] += float(np.sqrt(np.mean(log_err * log_err)))
            s["log10"] += float(np.mean(np.abs(np.log10(pv / tv))))
            s["delta1"] += float(np.mean(ratio < 1.25))
            s["delta2"] += float(np.mean(ratio < 1.25 ** 2))
            s["delta3"] += float(np.mean(ratio < 1.25 ** 3))
            self._images += 1

    def report(self, names=None) -> dict:
        """All seven Eigen metrics.  ``names`` is accepted (and
        ignored) for the uniform ``test.py --report`` call shape."""
        del names
        n = max(self._images, 1)
        return {k: self._sums[k] / n for k in _METRICS}

    def score(self) -> float:
        return self.report()[self.metric]
