"""Panoptic quality (PQ) — the panoptic-segmentation metric.

Beyond the reference inventory — the evaluator for the Panoptic FPN
family (models/panoptic.py), Kirillov et al. 2019:

    PQ_c = sum_TP IoU / (|TP| + |FP|/2 + |FN|/2),   PQ = mean_c PQ_c
    (SQ = sum_TP IoU / |TP|, RQ = |TP| / (|TP| + |FP|/2 + |FN|/2))

Matching theorem: at IoU > 0.5 a predicted segment can overlap at most
one gt segment that much, so greedy matching is exact.

The MERGE (the paper's inference heuristic) happens here, host-side:
instances paste by descending score (a later instance only claims
still-free pixels and is dropped when most of its mask is already
taken), then stuff classes fill the remaining pixels from the semantic
argmax, dropped under a minimum area.  Class namespaces: things carry
the detection label space (1..C-1), stuff segments the semantic
channel space (1..S-1; channel 0 is the "thing" indicator and never
forms a stuff segment) — the two never collide because they are scored
as separate class keys.

Void/ignore (255 in gt_sem) pixels are excluded from all IoU
computations, and a predicted segment majority-covered by void is
removed rather than counted as FP — the official metric's rule.
"""

from __future__ import annotations

import numpy as np

from myconvnet_tpu.eval.detection import _paste_det_mask
from myconvnet_tpu.eval.evaluators import Evaluator

IGNORE = 255


def merge_panoptic(boxes: np.ndarray, scores: np.ndarray,
                   labels: np.ndarray, valid: np.ndarray,
                   masks: np.ndarray, sem: np.ndarray, *,
                   num_stuff: int = 2,
                   overlap_threshold: float = 0.5,
                   stuff_min_area: int = 64,
                   score_threshold: float = 0.5):
    """One image's detections + semantic map -> panoptic segments.

    Returns (seg_map [H,W] int32 segment ids, segments) where segments
    is a list of (kind, class_id) aligned with ids 1..len; 0 = no
    segment.  ``sem`` is the [H,W] semantic argmax (channel 0 =
    things).
    """
    H, W = sem.shape
    seg_map = np.zeros((H, W), np.int32)
    segments: list[tuple[str, int]] = []
    order = np.argsort(-scores)
    for d in order:
        if not valid[d] or scores[d] < score_threshold:
            continue
        rs, cs, win = _paste_det_mask(boxes[d], masks[d] >= 0.5, (H, W))
        area = int(win.sum())
        if area == 0:
            continue
        free = win & (seg_map[rs, cs] == 0)
        if int(free.sum()) / area < overlap_threshold:
            continue  # mostly claimed by higher-scored instances
        segments.append(("thing", int(labels[d])))
        seg_map[rs, cs][free] = len(segments)  # slice view: in place
    for s in range(1, num_stuff):
        region = (sem == s) & (seg_map == 0)
        if int(region.sum()) >= stuff_min_area:
            segments.append(("stuff", s))
            seg_map[region] = len(segments)
    return seg_map, segments


def _gt_panoptic(gt_labels: np.ndarray, gt_inst: np.ndarray,
                 gt_sem: np.ndarray):
    """Gt segments in the same representation: things from the
    instance map (difficult mark-encoded rows become void), stuff from
    the semantic map outside instances."""
    seg_map = np.zeros(gt_inst.shape, np.int32)
    segments: list[tuple[str, int]] = []
    void = gt_sem == IGNORE
    for m, lab in enumerate(gt_labels):
        lab = int(lab)
        pix = gt_inst == m + 1
        if lab >= 1:
            segments.append(("thing", lab))
            seg_map[pix] = len(segments)
        elif lab <= -2:
            void |= pix
    for s in range(1, int(gt_sem[~void].max(initial=0)) + 1):
        region = (gt_sem == s) & (gt_inst == 0) & ~void
        if region.any():
            segments.append(("stuff", s))
            seg_map[region] = len(segments)
    return seg_map, segments, void


class PanopticQualityEvaluator(Evaluator):
    """PQ/SQ/RQ over streamed batches.

    ``update(preds, targets)``:
      preds   = (boxes, scores, labels, valid, masks [B,D,s,s],
                 sem [B,H,W] semantic argmax) — the panoptic recipe's
                 predict output;
      targets = (gt_boxes, gt_labels, gt_inst [B,H,W], gt_sem [B,H,W]).
    ``num_stuff`` bounds the stuff channels the merge scans;
    ``num_classes`` is stored for constructor uniformity with the
    other detection evaluators (class keys come from the data).
    """

    name = "PQ"

    def __init__(self, num_classes: int, num_stuff: int = 2, *,
                 stuff_min_area: int = 64,
                 score_threshold: float = 0.5):
        self.num_classes = num_classes
        self.num_stuff = num_stuff
        self.stuff_min_area = stuff_min_area
        self.score_threshold = score_threshold
        self.reset()

    def reset(self):
        #   class key -> [iou_sum, tp, fp, fn]
        self._acc: dict[tuple[str, int], np.ndarray] = {}

    def _row(self, key):
        if key not in self._acc:
            self._acc[key] = np.zeros(4)
        return self._acc[key]

    def update(self, preds, targets):
        boxes, scores, labels, valid, masks, sem = (np.asarray(t)
                                                    for t in preds)
        gt_boxes, gt_labels, gt_inst, gt_sem = (np.asarray(t)
                                                for t in targets)
        for b in range(sem.shape[0]):
            self._one_image(boxes[b], scores[b], labels[b], valid[b],
                            masks[b], sem[b], gt_labels[b], gt_inst[b],
                            gt_sem[b])

    def _one_image(self, boxes, scores, labels, valid, masks, sem,
                   gt_labels, gt_inst, gt_sem):
        pmap, psegs = merge_panoptic(
            boxes, scores, labels, valid, masks, sem,
            num_stuff=self.num_stuff,
            stuff_min_area=self.stuff_min_area,
            score_threshold=self.score_threshold)
        gmap, gsegs, void = _gt_panoptic(gt_labels, gt_inst, gt_sem)
        keep = ~void
        # pair intersection counts via a joint histogram over kept px
        joint = pmap[keep].astype(np.int64) * (len(gsegs) + 1) \
            + gmap[keep]
        cnt = np.bincount(joint,
                          minlength=(len(psegs) + 1) * (len(gsegs) + 1))
        cnt = cnt.reshape(len(psegs) + 1, len(gsegs) + 1)
        p_area = cnt.sum(axis=1)
        g_area = cnt.sum(axis=0)
        # official rule: a predicted segment mostly lying on void
        # pixels is removed from scoring entirely
        p_total = np.bincount(pmap.reshape(-1),
                              minlength=len(psegs) + 1)
        p_void_frac = 1.0 - p_area / np.maximum(p_total, 1)
        matched_p = np.zeros(len(psegs) + 1, bool)
        matched_g = np.zeros(len(gsegs) + 1, bool)
        for pi in range(1, len(psegs) + 1):
            for gi in range(1, len(gsegs) + 1):
                if psegs[pi - 1] != gsegs[gi - 1]:
                    continue  # classes must agree
                inter = cnt[pi, gi]
                union = p_area[pi] + g_area[gi] - inter
                if union <= 0:
                    continue
                iou = inter / union
                if iou > 0.5:
                    row = self._row(psegs[pi - 1])
                    row[0] += iou
                    row[1] += 1
                    matched_p[pi] = matched_g[gi] = True
        for pi in range(1, len(psegs) + 1):
            if not matched_p[pi] and p_void_frac[pi] <= 0.5 \
                    and p_area[pi] > 0:
                self._row(psegs[pi - 1])[2] += 1
        for gi in range(1, len(gsegs) + 1):
            if not matched_g[gi] and g_area[gi] > 0:
                self._row(gsegs[gi - 1])[3] += 1

    def per_class(self) -> dict[tuple[str, int], dict[str, float]]:
        out = {}
        for key, (iou_sum, tp, fp, fn) in sorted(self._acc.items()):
            denom = tp + fp / 2.0 + fn / 2.0
            if denom == 0:
                continue
            out[key] = dict(
                pq=iou_sum / denom,
                sq=iou_sum / tp if tp else 0.0,
                rq=tp / denom)
        return out

    def score(self) -> float:
        per = self.per_class()
        return (float(np.mean([v["pq"] for v in per.values()]))
                if per else 0.0)
