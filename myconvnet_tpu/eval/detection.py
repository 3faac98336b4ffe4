"""Detection metrics: VOC-style mean average precision.

Beyond the reference inventory — the evaluator for the detection task
family (train/detection.py), on the uniform Evaluator surface
(eval/evaluators.py, SURVEY.md §2#7).

Matching and the PR curve run host-side in numpy at eval time (detection
eval is inherently ragged — per-image variable object counts — and is a
once-per-validation cost, not a step cost; the per-batch device work is
the jitted post-process in train/detection.py).  AP uses all-point
interpolation by default (VOC2010+/COCO style) with the VOC2007
11-point variant as an option.
"""

from __future__ import annotations

import numpy as np

from myconvnet_tpu.eval.evaluators import Evaluator


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N, M] IoU, numpy."""
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: np.clip(x[:, 2] - x[:, 0], 0, None) * \
        np.clip(x[:, 3] - x[:, 1], 0, None)  # noqa: E731
    union = area(a)[:, None] + area(b)[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def average_precision(recall: np.ndarray, precision: np.ndarray,
                      interpolation: str = "all") -> float:
    """AP from a PR curve (recall ascending)."""
    if interpolation == "11point":
        ap = 0.0
        for t in np.linspace(0.0, 1.0, 11):
            mask = recall >= t
            ap += (precision[mask].max() if mask.any() else 0.0) / 11.0
        return float(ap)
    # all-point: area under the monotone-precision envelope
    r = np.concatenate([[0.0], recall, [1.0]])
    p = np.concatenate([[0.0], precision, [0.0]])
    p = np.maximum.accumulate(p[::-1])[::-1]
    steps = np.where(r[1:] != r[:-1])[0]
    return float(np.sum((r[steps + 1] - r[steps]) * p[steps + 1]))


class MeanAPEvaluator(Evaluator):
    """mAP at a fixed IoU threshold (default 0.5 — PASCAL VOC).

    ``update(preds, targets)`` takes one batch:
      preds   = (boxes [B,D,4], scores [B,D], labels [B,D], valid [B,D])
                — the output of train/detection.make_postprocess;
      targets = (gt_boxes [B,M,4], gt_labels [B,M]) with label -1 padding.
    Labels share one id space (0 background, 1..C-1 foreground).
    """

    name = "mAP"

    def __init__(self, num_classes: int, iou_threshold: float = 0.5,
                 interpolation: str = "all"):
        if interpolation not in ("all", "11point"):
            raise ValueError(f"unknown interpolation {interpolation!r}; "
                             "valid: ['all', '11point']")
        self.num_classes = num_classes
        self.iou_threshold = iou_threshold
        self.interpolation = interpolation
        self.reset()

    def reset(self):
        self._dets: list[tuple] = []  # (img, label, score, box)
        self._gts: list[tuple] = []  # (img, label, box)
        self._n_img = 0

    def update(self, preds, targets):
        """Labels <= -2 in the targets mark VOC ``difficult`` objects
        (encoded -(class_id + 1), subsets/voc.py) — kept as ignore
        zones: a detection matched to one is neither TP nor FP."""
        boxes, scores, labels, valid = (np.asarray(t) for t in preds)
        gt_boxes, gt_labels = (np.asarray(t) for t in targets)
        for b in range(boxes.shape[0]):
            img = self._n_img
            self._n_img += 1
            for d in range(boxes.shape[1]):
                if valid[b, d]:
                    self._dets.append((img, int(labels[b, d]),
                                       float(scores[b, d]), boxes[b, d]))
            for m in range(gt_boxes.shape[1]):
                lab = int(gt_labels[b, m])
                if lab >= 1:
                    self._gts.append((img, lab, gt_boxes[b, m], False))
                elif lab <= -2:  # difficult: -(class_id + 1)
                    self._gts.append((img, -lab - 1, gt_boxes[b, m],
                                      True))

    def per_class_ap(self, iou_threshold: float | None = None
                     ) -> dict[int, float]:
        """AP per foreground class that has ground truth (at
        ``iou_threshold``, defaulting to the evaluator's own)."""
        thr = self.iou_threshold if iou_threshold is None else iou_threshold
        aps = {}
        for c in range(1, self.num_classes):
            gts = [(i, box, diff) for i, lab, box, diff in self._gts
                   if lab == c]
            n_real = sum(1 for _, _, diff in gts if not diff)
            if not n_real:
                continue
            dets = sorted((d for d in self._dets if d[1] == c),
                          key=lambda d: -d[2])
            # per image: gt boxes + difficult flags + matched flags
            by_img: dict[int, list] = {}
            for i, box, diff in gts:
                by_img.setdefault(i, []).append((box, diff))
            matched = {i: np.zeros(len(v), bool) for i, v in by_img.items()}
            tp = np.zeros(len(dets))
            fp = np.zeros(len(dets))
            ign = np.zeros(len(dets), bool)
            for k, (img, _, _, box) in enumerate(dets):
                cand = by_img.get(img)
                if cand is None:
                    fp[k] = 1
                    continue
                ious = _iou_matrix(
                    box[None], np.stack([b for b, _ in cand]))[0]
                best = int(np.argmax(ious))
                if ious[best] >= thr:
                    if cand[best][1]:          # difficult: devkit-style
                        ign[k] = 1             # ignore — no TP, no FP
                    elif not matched[img][best]:
                        matched[img][best] = True
                        tp[k] = 1
                    else:
                        fp[k] = 1
                else:
                    fp[k] = 1
            if not dets:
                aps[c] = 0.0
                continue
            keep = ~ign
            ctp, cfp = np.cumsum(tp[keep]), np.cumsum(fp[keep])
            recall = ctp / n_real
            precision = ctp / np.maximum(ctp + cfp, 1e-9)
            aps[c] = average_precision(recall, precision,
                                       self.interpolation)
        return aps

    def score(self) -> float:
        aps = self.per_class_ap()
        return float(np.mean(list(aps.values()))) if aps else 0.0


class COCOMeanAPEvaluator(MeanAPEvaluator):
    """COCO-style mAP: AP averaged over IoU thresholds 0.50:0.05:0.95.

    Same accumulation as :class:`MeanAPEvaluator` (detections and ground
    truth are threshold-independent); only scoring re-runs the matching
    per threshold.  ``per_threshold()`` exposes the mAP curve — its 0.5
    entry equals the VOC number, the 0.75 entry is COCO's strict AP75.
    """

    name = "mAP@[.5:.95]"
    IOU_THRESHOLDS = tuple(np.arange(0.5, 1.0, 0.05).round(2))

    def reset(self):
        super().reset()
        self._sweep_rev = 0
        self._sweep_cache: tuple[int, dict] | None = None

    def update(self, preds, targets):
        super().update(preds, targets)
        self._sweep_rev += 1

    def per_threshold(self) -> dict[float, float]:
        """The mAP-vs-IoU curve.  The 10-threshold matching sweep is the
        expensive part, so it is cached per accumulation revision —
        score() and a subsequent curve printout share one sweep."""
        if self._sweep_cache is not None and \
                self._sweep_cache[0] == self._sweep_rev:
            return self._sweep_cache[1]
        out = {}
        for t in self.IOU_THRESHOLDS:
            aps = self.per_class_ap(float(t))
            out[float(t)] = (float(np.mean(list(aps.values())))
                             if aps else 0.0)
        self._sweep_cache = (self._sweep_rev, out)
        return out

    def score(self) -> float:
        per = self.per_threshold()
        return float(np.mean(list(per.values()))) if per else 0.0
