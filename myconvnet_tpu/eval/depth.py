"""Monocular-depth metrics (fourteenth task family; the reference has
no dense-regression metrics — SURVEY.md §2; mount empty, §0).

The standard Eigen protocol over valid pixels (gt > 0): AbsRel,
RMSE, RMSE(log), log10, and the threshold accuracies
delta < 1.25 / 1.25^2 / 1.25^3.  Accumulation is streaming sums on
host numpy (per eval batch the reductions are microseconds next to
the forward pass), matching every other evaluator's
``update(outputs, labels)`` contract — predictions ``[N, H, W, 1]``
meters, labels ``[N, H, W, 1]`` meters with 0 = invalid.

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
        self._sums = dict.fromkeys(
            ("absrel", "sq_err", "sq_log_err", "log10",
             "d1", "d2", "d3"), 0.0)
        self._count = 0

    def update(self, preds, labels):
        p_all = np.asarray(preds, np.float64)
        t_all = np.asarray(labels, np.float64)
        for p, t in zip(p_all, t_all):  # per image: median scaling +
            mask = (t > max(self.min_depth, 0.0)) & (t < self.max_depth)
            if not mask.any():
                continue
            pv, tv = p[mask], t[mask]
            if self.median_scaling:
                pv = pv * (np.median(tv) / max(np.median(pv), 1e-12))
            pv = np.clip(pv, self.min_depth,
                         None if np.isinf(self.max_depth)
                         else self.max_depth)
            n = pv.size
            err = pv - tv
            log_err = np.log(pv) - np.log(tv)
            ratio = np.maximum(pv / tv, tv / pv)
            s = self._sums
            s["absrel"] += float(np.sum(np.abs(err) / tv))
            s["sq_err"] += float(np.sum(err * err))
            s["sq_log_err"] += float(np.sum(log_err * log_err))
            s["log10"] += float(np.sum(np.abs(np.log10(pv / tv))))
            s["d1"] += float(np.sum(ratio < 1.25))
            s["d2"] += float(np.sum(ratio < 1.25 ** 2))
            s["d3"] += float(np.sum(ratio < 1.25 ** 3))
            self._count += n

    def report(self, names=None) -> dict:
        """All seven Eigen metrics.  ``names`` is accepted (and
        ignored) for the uniform ``test.py --report`` call shape."""
        del names
        n = max(self._count, 1)
        s = self._sums
        return {"absrel": s["absrel"] / n,
                "rmse": float(np.sqrt(s["sq_err"] / n)),
                "rmse_log": float(np.sqrt(s["sq_log_err"] / n)),
                "log10": s["log10"] / n,
                "delta1": s["d1"] / n,
                "delta2": s["d2"] / n,
                "delta3": s["d3"] / n}

    def score(self) -> float:
        return self.report()[self.metric]
