"""Bounding-box ops for detection: IoU, encode/decode, anchors, NMS.

Beyond the reference inventory (SURVEY.md §2 has no detection task) —
added as the third-plus task family on the same substrate.  Everything
here is static-shape and branch-free so it jits cleanly on TPU:

* IoU is a broadcasted [N, M] tensor op (no loops).
* Box encode/decode use the standard SSD center-form parameterization
  with (0.1, 0.2) variances.
* Anchor grids are precomputed host-side (numpy, cached) — they are
  compile-time constants of the recipe, like the resize interpolation
  matrices in ops/resize.py.
* NMS is the TPU formulation: a fixed-trip-count ``lax.fori_loop`` of
  argmax-select + IoU-mask-suppress, returning a padded index list and
  a validity mask instead of a dynamic-length result.  No sorting
  networks, no gathers beyond one row per iteration.

Boxes are ``[..., 4]`` in normalized ``(x1, y1, x2, y2)`` order unless a
function says otherwise.
"""

from __future__ import annotations

from functools import lru_cache
from math import sqrt

import jax
import jax.numpy as jnp
import numpy as np


def box_area(boxes: jax.Array) -> jax.Array:
    """[..., 4] xyxy -> [...] area (clamped at zero for degenerate boxes)."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU.  a: [N, 4], b: [M, 4] (xyxy) -> [N, M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def aligned_giou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise generalized IoU of paired boxes (Rezatofighi et al.
    2019).  a, b: [..., 4] xyxy -> [...] in [-1, 1]: IoU minus the
    fraction of the smallest enclosing box not covered by the union —
    a gradient signal even for disjoint boxes, which is why ``1 -
    giou`` works as a regression loss where IoU alone saturates.
    """
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    iou = inter / jnp.maximum(union, 1e-9)
    elt = jnp.minimum(a[..., :2], b[..., :2])
    erb = jnp.maximum(a[..., 2:], b[..., 2:])
    ewh = jnp.maximum(erb - elt, 0.0)
    enclose = jnp.maximum(ewh[..., 0] * ewh[..., 1], 1e-9)
    return iou - (enclose - union) / enclose


def _to_center(boxes: jax.Array) -> tuple[jax.Array, jax.Array]:
    """xyxy -> (center [.., 2], size [.., 2])."""
    size = boxes[..., 2:] - boxes[..., :2]
    center = boxes[..., :2] + 0.5 * size
    return center, size


def encode_boxes(boxes: jax.Array, anchors: jax.Array,
                 variances: tuple[float, float] = (0.1, 0.2)) -> jax.Array:
    """Ground-truth xyxy -> SSD regression targets relative to anchors.

    t = ((cx - acx)/aw/v0, (cy - acy)/ah/v0, log(w/aw)/v1, log(h/ah)/v1)
    """
    bc, bs = _to_center(boxes)
    ac, as_ = _to_center(anchors)
    as_ = jnp.maximum(as_, 1e-9)
    txy = (bc - ac) / as_ / variances[0]
    twh = jnp.log(jnp.maximum(bs, 1e-9) / as_) / variances[1]
    return jnp.concatenate([txy, twh], axis=-1)


def decode_boxes(deltas: jax.Array, anchors: jax.Array,
                 variances: tuple[float, float] = (0.1, 0.2)) -> jax.Array:
    """Inverse of encode_boxes: regression output -> xyxy boxes."""
    ac, as_ = _to_center(anchors)
    cxy = deltas[..., :2] * variances[0] * as_ + ac
    wh = jnp.exp(deltas[..., 2:] * variances[1]) * as_
    return jnp.concatenate([cxy - 0.5 * wh, cxy + 0.5 * wh], axis=-1)


# --------------------------------------------------------------- anchors

# SSD300 spec: (feature-map size, scale, next scale, aspect ratios).
# Scales follow the paper's s_min=0.2 -> s_max=0.9 progression with the
# conventional 0.1 stem scale; 8732 anchors total.
SSD300_SPEC = (
    (38, 0.10, 0.20, (2.0,)),
    (19, 0.20, 0.37, (2.0, 3.0)),
    (10, 0.37, 0.54, (2.0, 3.0)),
    (5, 0.54, 0.71, (2.0, 3.0)),
    (3, 0.71, 0.88, (2.0,)),
    (1, 0.88, 1.05, (2.0,)),
)


def _cell_grid(fm: int, whs) -> np.ndarray:
    """One pyramid level's anchors -> [fm*fm*len(whs), 4] xyxy.

    Cell-major — [row, col, variant] — the ordering contract every
    detection head relies on: a head's [H, W, a*k] output reshaped to
    [H*W*a, k] lines up with this grid element-for-element.
    """
    centers = (np.arange(fm, dtype=np.float32) + 0.5) / fm
    cx, cy = np.meshgrid(centers, centers)  # [row, col] grids
    cxy = np.stack([cx, cy], axis=-1)[:, :, None, :]  # [fm, fm, 1, 2]
    wh = np.asarray(whs, np.float32)[None, None, :, :]  # [1, 1, k, 2]
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)
    return boxes.reshape(-1, 4)


@lru_cache(maxsize=8)
def ssd_anchors(spec=SSD300_SPEC, clip: bool = True) -> np.ndarray:
    """Anchor grid for an SSD feature pyramid -> [A, 4] normalized xyxy.

    Per cell: one s×s square, one sqrt(s·s')×… square, and a ±aspect
    pair per ratio — 4 or 6 anchors per cell as in the paper (8732 for
    the SSD300 spec).  Host-side numpy; a compile-time constant.
    Cell-major (see :func:`_cell_grid`).
    """
    out = []
    for fm, s, s_next, ratios in spec:
        whs = [(s, s), (sqrt(s * s_next),) * 2]
        for r in ratios:
            whs.append((s * sqrt(r), s / sqrt(r)))
            whs.append((s / sqrt(r), s * sqrt(r)))
        out.append(_cell_grid(fm, whs))
    anchors = np.concatenate(out, axis=0).astype(np.float32)
    if clip:
        anchors = np.clip(anchors, 0.0, 1.0)
    return anchors


# SSD512 spec (the paper's larger model): seven maps, the conventional
# Caffe-SSD scale progression (0.04 stem, 0.1 -> 0.9 over the rest);
# 4/6/6/6/6/4/4 anchors per cell -> 24564 total.
SSD512_SPEC = (
    (64, 0.04, 0.10, (2.0,)),
    (32, 0.10, 0.26, (2.0, 3.0)),
    (16, 0.26, 0.42, (2.0, 3.0)),
    (8, 0.42, 0.58, (2.0, 3.0)),
    (4, 0.58, 0.74, (2.0, 3.0)),
    (2, 0.74, 0.90, (2.0,)),
    (1, 0.90, 1.06, (2.0,)),
)


# RetinaNet-style FPN anchor spec: (feature-map size, base size,
# octave fractions, aspect ratios) per pyramid level.  Base sizes are
# normalized (4 * stride / image_size, the paper's 32..512 px areas on
# strides 8..128 at 512 input); 9 anchors per cell.
RETINA512_SPEC = tuple(
    (fm, base, (0.0, 1 / 3, 2 / 3), (0.5, 1.0, 2.0))
    for fm, base in ((64, 0.0625), (32, 0.125), (16, 0.25),
                     (8, 0.5), (4, 1.0)))


@lru_cache(maxsize=8)
def retina_anchors(spec=RETINA512_SPEC, clip: bool = False) -> np.ndarray:
    """Anchor grid for an octave-scaled FPN pyramid -> [A, 4] xyxy.

    Per cell: ``len(octaves) * len(ratios)`` anchors with
    ``wh = base * 2^octave * (sqrt(r), 1/sqrt(r))`` — octave-major,
    ratio-minor variant order, which must match the head's channel
    layout (models/retinanet.py emits [H, W, a*k] in the same order).
    Cell-major (see :func:`_cell_grid`); unclipped by default (the
    paper keeps out-of-frame anchors and lets matching handle them).
    """
    out = []
    for fm, base, octaves, ratios in spec:
        whs = [(base * 2.0 ** o * sqrt(r), base * 2.0 ** o / sqrt(r))
               for o in octaves for r in ratios]
        out.append(_cell_grid(fm, whs))
    anchors = np.concatenate(out, axis=0).astype(np.float32)
    if clip:
        anchors = np.clip(anchors, 0.0, 1.0)
    return anchors


# ------------------------------------------------------------------- NMS

def nms(boxes: jax.Array, scores: jax.Array, iou_threshold: float = 0.45,
        max_out: int = 100, score_threshold: float = -jnp.inf,
        method: str = "jacobi") -> tuple[jax.Array, jax.Array]:
    """Static-shape non-maximum suppression.

    boxes [N, 4] xyxy, scores [N] -> (indices [max_out], valid [max_out]).
    Semantics are the classic greedy sweep: take the highest-scoring
    surviving box, emit it, kill every box with IoU above the threshold.
    Entries past the surviving count have ``valid == False`` (their index
    is arbitrary — always mask before use).

    ``method="jacobi"`` (default) computes the SAME keep-set without the
    per-box sequential loop — blocked Jacobi fixpoint iteration over

        keep[i] = live[i] and not any(keep[j] and iou[j, i] > t, j < i)

    Sort by score, split into 128-wide blocks.  Blocks resolve in
    order: one matmul stripe suppresses a block by the (final) decided
    prefix, then whole-vector sweeps iterate the recursion WITHIN the
    block to fixpoint.  The recursion's strict triangular dependency
    gives a unique solution, so any fixpoint is the exact greedy
    answer; a block converges in its suppression-chain depth (a flat
    single-block Jacobi is also exact but re-reads the full [N, N]
    matrix once per chain link — measured slower than sequential at
    N=1000 on dense candidates, PERF_NOTES.md).  The block loop stops
    early once ``max_out`` boxes are kept: every kept prefix box
    outranks the unprocessed tail, so the emission cut never reaches an
    undecided block — on detector outputs that is usually after ONE
    block.  ``method="sequential"`` keeps the fori-loop form as the
    reference/fallback.
    """
    if method == "sequential":
        return _nms_sequential(boxes, scores, iou_threshold, max_out,
                               score_threshold)
    n = boxes.shape[0]
    k = min(max_out, n)
    G = min(128, n)               # block width (lane-register friendly)
    nb = -(-n // G)               # blocks over the sorted candidates
    N = nb * G
    order = jnp.argsort(-scores)  # stable: equal scores keep index order,
    # matching the sequential argmax's first-occurrence tie-break
    s = scores[order]
    iou = box_iou(boxes[order], boxes[order])  # [n, n] once
    live = s > score_threshold
    if N > n:                     # pad to whole blocks: dead, no overlap
        s = jnp.pad(s, (0, N - n), constant_values=-jnp.inf)
        live = jnp.pad(live, (0, N - n))
        iou = jnp.pad(iou, ((0, N - n), (0, N - n)))
    # sup[j, i]: candidate j (higher-scored, j < i) overlaps i enough to
    # suppress it if j itself survives.  Strictly upper-triangular.
    # bf16 storage (0/1 exact; the einsums accumulate f32): the matrix
    # is the loop's whole HBM traffic.
    sup = jnp.triu(iou > iou_threshold, 1).astype(jnp.bfloat16)

    def _hits(vec, mat):          # any higher-scored keeper overlaps?
        return jnp.einsum("j,jg->g", vec, mat,
                          preferred_element_type=jnp.float32) > 0

    def block(carry):
        keep_f, b, kept = carry
        lo = b * G
        blk_live = jax.lax.dynamic_slice(live, (lo,), (G,))
        # suppression by the decided prefix (final — keep_f is zero past
        # it), one [N, G] stripe:
        stripe = jax.lax.dynamic_slice(sup, (0, lo), (N, G))
        blk_live &= ~_hits(keep_f, stripe)
        # within-block fixpoint: the greedy recursion restricted to the
        # block (strict triangular dependency -> unique solution, so any
        # fixpoint is the exact greedy answer; converges in the block's
        # suppression-chain depth)
        sup_blk = jax.lax.dynamic_slice(sup, (lo, lo), (G, G))

        def sweep(c):
            kb, _ = c
            new = blk_live & ~_hits(kb.astype(jnp.bfloat16), sup_blk)
            return new.astype(jnp.float32), jnp.any(new != (kb > 0))

        kb, _ = jax.lax.while_loop(
            lambda c: c[1], sweep,
            (blk_live.astype(jnp.float32), jnp.array(True)))
        keep_f = jax.lax.dynamic_update_slice(
            keep_f, kb.astype(jnp.bfloat16), (lo,))
        return keep_f, b + 1, kept + jnp.sum(kb).astype(jnp.int32)

    def more(carry):
        _, b, kept = carry
        # stop early once max_out boxes are decided-kept: every kept box
        # in the prefix outranks anything in the unprocessed tail, so
        # the emission cut below never reaches an undecided block
        return (b < nb) & (kept < max_out)

    keep_f, _, _ = jax.lax.while_loop(
        more, block, (jnp.zeros((N,), jnp.bfloat16), 0, 0))
    keep = keep_f > 0
    # emit kept entries in score order (s is sorted descending, so
    # top_k over the keep-masked scores preserves emission order and
    # breaks score ties by lowest sorted index, like the greedy sweep)
    vals, pos = jax.lax.top_k(jnp.where(keep, s, -jnp.inf), k)
    valid = vals > -jnp.inf
    idxs = jnp.pad(order, (0, N - n))[pos].astype(jnp.int32)
    if k < max_out:
        idxs = jnp.pad(idxs, (0, max_out - k))
        valid = jnp.pad(valid, (0, max_out - k))
    return idxs, valid


def _nms_sequential(boxes, scores, iou_threshold, max_out,
                    score_threshold):
    """The fori-loop greedy sweep (reference form for the Jacobi path)."""
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)  # [N, N] once, reused every iteration
    live = scores > score_threshold

    def body(_, carry):
        alive, idxs, valid, k = carry
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        ok = masked[best] > -jnp.inf
        idxs = idxs.at[k].set(best)
        valid = valid.at[k].set(ok)
        # suppress the winner (unconditionally) + everything overlapping it
        alive = alive & (iou[best] <= iou_threshold) & ok
        alive = alive.at[best].set(False)
        return alive, idxs, valid, k + 1

    init = (live, jnp.zeros((max_out,), jnp.int32),
            jnp.zeros((max_out,), bool), 0)
    _, idxs, valid, _ = jax.lax.fori_loop(0, min(max_out, n), body, init)
    return idxs, valid


def batched_nms(boxes: jax.Array, scores: jax.Array, labels: jax.Array,
                iou_threshold: float = 0.45, max_out: int = 100,
                score_threshold: float = -jnp.inf
                ) -> tuple[jax.Array, jax.Array]:
    """Class-aware NMS: boxes of different labels never suppress each
    other (the torchvision trick — offset each class into its own
    disjoint coordinate region, then one plain NMS)."""
    offsets = labels.astype(boxes.dtype)[:, None] * 4.0
    return nms(boxes + offsets, scores, iou_threshold, max_out,
               score_threshold)
