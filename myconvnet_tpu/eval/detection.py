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
    # devkit matching (single argmax over real + ignore rows) unless a
    # subclass opts into pycocotools' real-gts-first order
    match_real_first = False

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
            # gt rows are (img, lab, box, diff, *extra) — subclasses may
            # carry payload past the devkit fields (mask evaluators
            # append the instance id); same for det rows past index 3
            gts = [(g[0], g[2:]) for g in self._gts if g[1] == c]
            n_real = sum(1 for _, cand in gts if not cand[1])
            if not n_real:
                continue
            dets = sorted((d for d in self._dets if d[1] == c),
                          key=lambda d: -d[2])
            # per image: gt (box, diff, *extra) rows + matched flags
            by_img: dict[int, list] = {}
            for i, cand in gts:
                by_img.setdefault(i, []).append(cand)
            matched = {i: np.zeros(len(v), bool) for i, v in by_img.items()}
            tp = np.zeros(len(dets))
            fp = np.zeros(len(dets))
            ign = np.zeros(len(dets), bool)
            for k, det in enumerate(dets):
                img = det[0]
                cand = by_img.get(img)
                if cand is None:
                    fp[k] = 1
                    continue
                ious = self._candidate_ious(det, cand)
                if self.match_real_first:
                    # pycocotools order: real gts absorb matches first;
                    # ignore rows only take leftovers.  Needed when the
                    # ignore-row similarity lives on a different scale
                    # than the real one (keypoint OKS vs the box-IoU
                    # fallback) — a single argmax would let an ignore
                    # row hijack a should-be TP.
                    real = np.asarray([not cc[1] for cc in cand])
                    riou = np.where(real, ious, -np.inf)
                    if real.any() and riou.max() >= thr:
                        best = int(np.argmax(riou))
                        if not matched[img][best]:
                            matched[img][best] = True
                            tp[k] = 1
                        else:
                            fp[k] = 1
                    elif (~real).any() and \
                            np.where(~real, ious, -np.inf).max() >= thr:
                        ign[k] = 1
                    else:
                        fp[k] = 1
                    continue
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

    def _candidate_ious(self, det: tuple, cand: list) -> np.ndarray:
        """IoU of one detection row against an image's candidate gt rows
        ((box, diff, *extra) tuples).  The box-overlap default; mask
        evaluators override this with mask overlap."""
        return _iou_matrix(det[3][None], np.stack([c[0] for c in cand]))[0]

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
        self._sweep_cache: tuple[tuple, dict] | None = None

    def per_threshold(self) -> dict[float, float]:
        """The mAP-vs-IoU curve.  The 10-threshold matching sweep is the
        expensive part, so it is cached per accumulation state — keyed
        on the accumulator sizes rather than an update-counter so that
        SUBCLASS update() overrides (mask/keypoint evaluators) also
        invalidate it; score() and a subsequent curve printout share
        one sweep."""
        key = (self._n_img, len(self._dets), len(self._gts))
        if self._sweep_cache is not None and \
                self._sweep_cache[0] == key:
            return self._sweep_cache[1]
        out = {}
        for t in self.IOU_THRESHOLDS:
            aps = self.per_class_ap(float(t))
            out[float(t)] = (float(np.mean(list(aps.values())))
                             if aps else 0.0)
        self._sweep_cache = (key, out)
        return out

    def score(self) -> float:
        per = self.per_threshold()
        return float(np.mean(list(per.values()))) if per else 0.0


# ------------------------------------------------------- instance masks


def _paste_det_mask(box: np.ndarray, mask: np.ndarray,
                    hw: tuple[int, int]) -> tuple[slice, slice, np.ndarray]:
    """Rasterize a box-local [s,s] bool mask onto the image pixel grid:
    returns (row_slice, col_slice, window bool array) covering exactly
    the box extent — the host-side nearest-sample counterpart of
    ops/roi.paste_masks, windowed so eval never allocates [D,H,W]."""
    H, W = hw
    s = mask.shape[0]
    x1, y1, x2, y2 = np.clip(box, 0.0, 1.0)
    r0, r1 = int(np.floor(y1 * H)), int(np.ceil(y2 * H))
    c0, c1 = int(np.floor(x1 * W)), int(np.ceil(x2 * W))
    r1, c1 = min(max(r1, r0), H), min(max(c1, c0), W)
    if r1 == r0 or c1 == c0:
        return slice(r0, r0), slice(c0, c0), np.zeros((0, 0), bool)
    ys = (np.arange(r0, r1) + 0.5) / H
    xs = (np.arange(c0, c1) + 0.5) / W
    my = (ys - y1) / max(y2 - y1, 1e-9) * s - 0.5
    mx = (xs - x1) / max(x2 - x1, 1e-9) * s - 0.5
    iy = np.clip(np.round(my).astype(int), 0, s - 1)
    ix = np.clip(np.round(mx).astype(int), 0, s - 1)
    win = mask[np.ix_(iy, ix)]
    win &= ((ys >= y1) & (ys <= y2))[:, None]
    win &= ((xs >= x1) & (xs <= x2))[None, :]
    return slice(r0, r1), slice(c0, c1), win


class MaskMeanAPEvaluator(MeanAPEvaluator):
    """Instance-segmentation mAP: the VOC matching protocol with MASK
    IoU (pasted detection mask vs gt instance pixels) instead of box
    IoU — the Mask R-CNN paper's metric.

    ``update(preds, targets)``:
      preds   = (boxes [B,D,4], scores [B,D], labels [B,D], valid [B,D],
                 masks [B,D,s,s] probabilities in [0,1]) — the detection
                 postprocess output + train/rcnn.make_mask_predict;
      targets = (gt_boxes [B,M,4], gt_labels [B,M], gt_inst [B,H,W])
                where gt_inst stores gt row k as id k+1 (subsets/voc.py
                instance sources).
    Each image keeps ONE instance-id map; per-detection masks stay in
    box-local [s,s] form and overlap is computed inside the union
    window, so eval memory is O(images * H * W), not O(dets * H * W).
    """

    name = "mask mAP"

    def reset(self):
        super().reset()
        self._inst: dict[int, np.ndarray] = {}   # img -> [H,W] id map
        self._gt_area: dict[tuple[int, int], int] = {}
        # pasted windows are threshold-independent; cache them per det
        # row so the COCO 10-threshold sweep pastes each mask ONCE
        # (keyed by the det tuple's identity — rows live in self._dets)
        self._paste_cache: dict[int, tuple] = {}

    def update(self, preds, targets):
        """Negative gt labels <= -2 mark VOC ``difficult`` instances
        (encoded -(class_id + 1), subsets/voc.py "mark" convention) —
        scored as ignore zones like the box-detection path."""
        boxes, scores, labels, valid, masks = (np.asarray(t)
                                               for t in preds)
        gt_boxes, gt_labels, gt_inst = (np.asarray(t) for t in targets)
        for b in range(boxes.shape[0]):
            img = self._n_img
            self._n_img += 1
            self._inst[img] = gt_inst[b].astype(np.int32)
            for d in range(boxes.shape[1]):
                if valid[b, d]:
                    self._dets.append((img, int(labels[b, d]),
                                       float(scores[b, d]), boxes[b, d],
                                       masks[b, d] >= 0.5))
            for m in range(gt_boxes.shape[1]):
                lab = int(gt_labels[b, m])
                if lab == -1:
                    continue
                diff = lab <= -2
                self._gts.append((img, -lab - 1 if diff else lab,
                                  gt_boxes[b, m], diff, m))
                self._gt_area[(img, m)] = int(
                    (gt_inst[b] == m + 1).sum())

    def _pasted(self, det: tuple):
        got = self._paste_cache.get(id(det))
        if got is None:
            rs, cs, win = _paste_det_mask(det[3], det[4],
                                          self._inst[det[0]].shape)
            got = (rs, cs, win, int(win.sum()))
            self._paste_cache[id(det)] = got
        return got

    def _candidate_ious(self, det: tuple, cand: list) -> np.ndarray:
        img = det[0]
        inst = self._inst[img]
        rs, cs, win, det_area = self._pasted(det)
        ious = np.zeros(len(cand))
        for j, (_, _, row) in enumerate(cand):
            gt_area = self._gt_area[(img, row)]
            inter = int((win & (inst[rs, cs] == row + 1)).sum())
            union = det_area + gt_area - inter
            ious[j] = inter / union if union > 0 else 0.0
        return ious


class COCOMaskMeanAPEvaluator(MaskMeanAPEvaluator, COCOMeanAPEvaluator):
    """Mask mAP averaged over IoU thresholds 0.50:0.05:0.95 — mask-IoU
    accumulation (MaskMeanAPEvaluator) under the COCO threshold sweep
    (COCOMeanAPEvaluator's per_threshold/score via the MRO)."""

    name = "mask mAP@[.5:.95]"


# ----------------------------------------------------------- keypoints


class KeypointMeanAPEvaluator(MeanAPEvaluator):
    """Keypoint mAP: the VOC matching protocol with OKS (object
    keypoint similarity — the COCO keypoints metric) in place of box
    IoU.

    ``update(preds, targets)``:
      preds   = (boxes [B,D,4], scores [B,D], labels [B,D], valid
                 [B,D], kps [B,D,K,3]) — the detection postprocess
                 output + train/rcnn.decode_keypoints;
      targets = (gt_boxes [B,M,4], gt_labels [B,M], gt_kps [B,M,K,3]
                 with the COCO visibility flag in channel 2).
    OKS = mean over labeled gt keypoints of
    exp(-d^2 / (2 s^2 (2 sigma_i)^2)) — pycocotools' formula, with
    per-keypoint ``sigmas`` (uniform 0.079 when None — pass
    subsets.coco.COCO_KP_SIGMAS for the person skeleton) and s^2 = gt
    BOX area (the sources carry no segmentation area; COCO proper uses
    the segmentation area, which is smaller, so thresholds here are
    mildly stricter).  Instances with zero labeled keypoints are
    ignore zones (neither TP nor FP); matching follows pycocotools'
    real-gts-first order so a box-IoU-scored ignore row can never
    hijack a detection whose OKS clears the threshold on a real gt.
    """

    name = "keypoint mAP"
    match_real_first = True

    def __init__(self, num_classes: int = 2, iou_threshold: float = 0.5,
                 interpolation: str = "all", sigmas=None):
        self.sigmas = None if sigmas is None else np.asarray(
            sigmas, np.float64)
        super().__init__(num_classes, iou_threshold, interpolation)

    def update(self, preds, targets):
        boxes, scores, labels, valid, kps = (np.asarray(t)
                                             for t in preds)
        gt_boxes, gt_labels, gt_kps = (np.asarray(t) for t in targets)
        for b in range(boxes.shape[0]):
            img = self._n_img
            self._n_img += 1
            for d in range(boxes.shape[1]):
                if valid[b, d]:
                    self._dets.append((img, int(labels[b, d]),
                                       float(scores[b, d]), boxes[b, d],
                                       kps[b, d]))
            for m in range(gt_boxes.shape[1]):
                if int(gt_labels[b, m]) >= 1:
                    # zero labeled keypoints -> devkit-style ignore
                    diff = not bool((gt_kps[b, m, :, 2] > 0).any())
                    self._gts.append((img, int(gt_labels[b, m]),
                                      gt_boxes[b, m], diff,
                                      gt_kps[b, m]))

    def _candidate_ious(self, det: tuple, cand: list) -> np.ndarray:
        kp = det[4]
        oks = np.zeros(len(cand))
        for j, (gbox, _, gkp) in enumerate(cand):
            vis = gkp[:, 2] > 0
            if not vis.any():
                # ignore-zone rows still need a matchable score: fall
                # back to box IoU (pycocotools uses the annotation
                # area similarly for crowd rows)
                oks[j] = _iou_matrix(det[3][None], gbox[None])[0, 0]
                continue
            s2 = max((gbox[2] - gbox[0]) * (gbox[3] - gbox[1]), 1e-9)
            sig = (self.sigmas if self.sigmas is not None
                   else np.full(gkp.shape[0], 0.079))
            k2 = (2.0 * sig) ** 2  # pycocotools: kappa_i = 2 sigma_i
            d2 = ((kp[:, 0] - gkp[:, 0]) ** 2
                  + (kp[:, 1] - gkp[:, 1]) ** 2)
            e = d2 / (2.0 * s2 * k2 + 1e-12)
            oks[j] = float(np.exp(-e)[vis].mean())
        return oks


class COCOKeypointMeanAPEvaluator(KeypointMeanAPEvaluator,
                                  COCOMeanAPEvaluator):
    """Keypoint mAP averaged over OKS thresholds 0.50:0.05:0.95 —
    OKS accumulation under the COCO threshold sweep (via the MRO,
    like COCOMaskMeanAPEvaluator)."""

    name = "keypoint mAP@[.5:.95]"

    def __init__(self, num_classes: int = 2,
                 interpolation: str = "all", sigmas=None):
        KeypointMeanAPEvaluator.__init__(
            self, num_classes, iou_threshold=0.5,
            interpolation=interpolation, sigmas=sigmas)
