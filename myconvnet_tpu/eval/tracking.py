"""Tracking metrics (sixteenth task family; the reference has no
tracking — SURVEY.md §2; mount empty, §0).

Center-localization error of the response peak, the primitive under
every tracking benchmark's precision plot (OTB precision@20px etc.):
the predicted target offset is the argmax response cell mapped back to
search-crop pixels, scored against the ground-truth offset.  Host
numpy next to the forward pass, FlowEvaluator-style.
"""

from __future__ import annotations

import numpy as np

from myconvnet_tpu.eval.evaluators import Evaluator


class TrackingEvaluator(Evaluator):
    """Streaming center-error / precision metrics.

    ``update(responses, offsets)``: ``[N, R, R]`` response logits and
    ``[N, 2]`` (dx, dy) ground-truth pixel offsets.  ``metric`` picks
    the headline: ``cerr`` (mean center error px, default, lower) or
    ``p8``/``p16`` (precision within 8/16 px, higher).
    """

    name = "tracking"

    def __init__(self, metric: str = "cerr", stride: int = 4):
        if metric not in ("cerr", "p8", "p16"):
            raise ValueError(f"unknown tracking metric {metric!r}; "
                             "valid: ['cerr', 'p8', 'p16']")
        self.metric = metric
        self.higher_is_better = metric != "cerr"
        self.stride = int(stride)
        self.reset()

    def reset(self):
        self._err_sum = 0.0
        self._within = {8.0: 0, 16.0: 0}
        self._n = 0

    def update(self, responses, offsets):
        r = np.asarray(responses, np.float64)
        off = np.asarray(offsets, np.float64)
        n, rh, rw = r.shape
        flat = r.reshape(n, -1).argmax(axis=1)
        iy, ix = np.divmod(flat, rw)
        px = (ix - (rw - 1) / 2.0) * self.stride
        py = (iy - (rh - 1) / 2.0) * self.stride
        err = np.sqrt((px - off[:, 0]) ** 2 + (py - off[:, 1]) ** 2)
        self._err_sum += float(err.sum())
        for t in self._within:
            self._within[t] += int((err <= t).sum())
        self._n += n

    def report(self, names=None) -> dict:
        del names
        n = max(self._n, 1)
        return {"cerr": self._err_sum / n,
                "p8": self._within[8.0] / n,
                "p16": self._within[16.0] / n}

    def score(self) -> float:
        return self.report()[self.metric]
