"""Evaluators: task metrics with a uniform score/is_better interface.

Rebuild of the reference's ``evaluators.py`` (SURVEY.md §2#7): accuracy /
top-k / error-rate for classification, mIoU + pixel accuracy for
segmentation.  The batch-level accumulators are jittable pure functions
(so validation can run fully on-device and only the final scalar crosses
to host); the Evaluator classes own direction ("higher is better") and
the best-checkpoint comparison, mirroring the reference's
``score``/``is_better``/``worst_score`` surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------- jittable batch metrics

def top_k_correct(logits: jax.Array, labels: jax.Array, k: int = 1
                  ) -> jax.Array:
    """Number of top-k-correct predictions (int32 scalar).  Spatial
    logits/labels ([N,H,W,C]/[N,H,W]) count per-element — callers must
    normalize by element count, not batch size."""
    if k == 1:
        pred = jnp.argmax(logits, axis=-1)
        return jnp.sum((pred == labels).astype(jnp.int32))
    flat_logits = logits.reshape(-1, logits.shape[-1])
    flat_labels = labels.reshape(-1)
    topk = jax.lax.top_k(flat_logits, k)[1]
    hit = jnp.any(topk == flat_labels[:, None], axis=-1)
    return jnp.sum(hit.astype(jnp.int32))


def confusion_matrix(pred: jax.Array, labels: jax.Array, num_classes: int,
                     ignore_label: int | None = None) -> jax.Array:
    """[C, C] confusion counts (rows = truth) — one-hot matmul, MXU-friendly,
    no scatter."""
    valid = jnp.ones(labels.shape, jnp.float32) if ignore_label is None \
        else (labels != ignore_label).astype(jnp.float32)
    labels = jnp.where(valid > 0, labels, 0)
    t = jax.nn.one_hot(labels.reshape(-1), num_classes,
                       dtype=jnp.float32) * valid.reshape(-1, 1)
    p = jax.nn.one_hot(pred.reshape(-1), num_classes, dtype=jnp.float32)
    return jnp.dot(t.T, p, preferred_element_type=jnp.float32)


def miou_from_confusion(cm: jax.Array) -> jax.Array:
    inter = jnp.diag(cm)
    union = jnp.sum(cm, 0) + jnp.sum(cm, 1) - inter
    iou = inter / jnp.maximum(union, 1.0)
    present = (jnp.sum(cm, 1) > 0).astype(jnp.float32)
    return jnp.sum(iou * present) / jnp.maximum(jnp.sum(present), 1.0)


def pixel_accuracy_from_confusion(cm: jax.Array) -> jax.Array:
    return jnp.sum(jnp.diag(cm)) / jnp.maximum(jnp.sum(cm), 1.0)


# ------------------------------------------------------- Evaluator classes

class Evaluator:
    """Uniform interface (reference evaluators.py surface):
    accumulate batches -> score() -> is_better(curr, best)."""

    name = "metric"
    higher_is_better = True

    def reset(self) -> None:
        raise NotImplementedError

    def update(self, outputs, labels) -> None:
        raise NotImplementedError

    def score(self) -> float:
        raise NotImplementedError

    def worst_score(self) -> float:
        return -np.inf if self.higher_is_better else np.inf

    def is_better(self, curr: float, best: float) -> bool:
        return curr > best if self.higher_is_better else curr < best


class AccuracyEvaluator(Evaluator):
    name = "accuracy"

    def __init__(self, k: int = 1):
        self.k = k
        if k > 1:
            self.name = f"top{k}_accuracy"
        self.reset()

    def reset(self):
        self._correct = 0
        self._total = 0

    def update(self, logits, labels):
        self._correct += int(top_k_correct(jnp.asarray(logits),
                                           jnp.asarray(labels), self.k))
        # element count, not batch size: spatial labels ([N,H,W]) score
        # per pixel, keeping accuracy in [0, 1] for every logits rank
        self._total += int(np.size(labels))

    def score(self) -> float:
        return self._correct / max(self._total, 1)


class ErrorRateEvaluator(AccuracyEvaluator):
    name = "error_rate"
    higher_is_better = False

    def score(self) -> float:
        return 1.0 - super().score()


class MeanIoUEvaluator(Evaluator):
    name = "miou"

    def __init__(self, num_classes: int, ignore_label: int | None = 255):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.reset()

    def reset(self):
        self._cm = np.zeros((self.num_classes, self.num_classes), np.float64)

    def update(self, logits_or_pred, labels):
        arr = jnp.asarray(logits_or_pred)
        pred = jnp.argmax(arr, -1) if arr.ndim == 4 else arr
        self._cm += np.asarray(confusion_matrix(
            pred, jnp.asarray(labels), self.num_classes, self.ignore_label))

    def score(self) -> float:
        return float(miou_from_confusion(jnp.asarray(self._cm)))

    def pixel_accuracy(self) -> float:
        return float(pixel_accuracy_from_confusion(jnp.asarray(self._cm)))

    def per_class_iou(self) -> np.ndarray:
        """[C] IoU per class (NaN for classes absent from the truth)."""
        cm = self._cm
        inter = np.diag(cm)
        union = cm.sum(0) + cm.sum(1) - inter
        present = cm.sum(1) > 0
        iou = np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)
        return np.where(present, iou, np.nan)


class ConfusionMatrixEvaluator(Evaluator):
    """Classification evaluator that keeps the full confusion matrix:
    scores overall accuracy (best-checkpoint driver) and exposes
    per-class precision/recall/F1 + a formatted report — the per-class
    observability layer over the same MXU-friendly one-hot-matmul
    accumulator the mIoU evaluator uses."""

    name = "accuracy"

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self._cm = np.zeros((self.num_classes, self.num_classes),
                            np.float64)

    def update(self, logits, labels):
        arr = jnp.asarray(logits)
        labels = jnp.asarray(labels)
        pred = jnp.argmax(arr, -1) if arr.ndim > labels.ndim else arr
        self._cm += np.asarray(confusion_matrix(
            pred, labels, self.num_classes))

    def score(self) -> float:
        return float(self._cm.trace() / max(self._cm.sum(), 1.0))

    @property
    def matrix(self) -> np.ndarray:
        """[C, C] counts, rows = truth, cols = prediction."""
        return self._cm.copy()

    def per_class(self) -> dict[str, np.ndarray]:
        """precision/recall/f1/support arrays ([C]); zero where a class
        has no predictions/truth."""
        cm = self._cm
        tp = np.diag(cm)
        pred_tot = cm.sum(0)
        true_tot = cm.sum(1)
        precision = np.where(pred_tot > 0, tp / np.maximum(pred_tot, 1e-12),
                             0.0)
        recall = np.where(true_tot > 0, tp / np.maximum(true_tot, 1e-12),
                          0.0)
        f1 = np.where(precision + recall > 0,
                      2 * precision * recall
                      / np.maximum(precision + recall, 1e-12), 0.0)
        return {"precision": precision, "recall": recall, "f1": f1,
                "support": true_tot}

    def macro_f1(self) -> float:
        pc = self.per_class()
        present = pc["support"] > 0
        return float(pc["f1"][present].mean()) if present.any() else 0.0

    def top_confusions(self, k: int = 10,
                       class_names: list[str] | None = None
                       ) -> list[tuple[str, str, int]]:
        """The k most frequent off-diagonal (truth, predicted, count)
        cells — the error-analysis shortlist."""
        cm = self._cm.copy()
        np.fill_diagonal(cm, 0)
        names = class_names or [str(i) for i in range(self.num_classes)]
        flat = cm.ravel()
        order = np.argsort(flat)[::-1][:k]
        out = []
        for idx in order:
            if flat[idx] <= 0:
                break
            t, p = divmod(int(idx), self.num_classes)
            out.append((names[t], names[p], int(flat[idx])))
        return out

    def report(self, class_names: list[str] | None = None) -> str:
        """sklearn-style per-class text report."""
        pc = self.per_class()
        names = class_names or [str(i) for i in range(self.num_classes)]
        width = max(12, max(len(n) for n in names) + 2)
        lines = [f"{'':<{width}}{'precision':>10}{'recall':>10}"
                 f"{'f1':>10}{'support':>10}"]
        for i, n in enumerate(names):
            lines.append(
                f"{n:<{width}}{pc['precision'][i]:>10.4f}"
                f"{pc['recall'][i]:>10.4f}{pc['f1'][i]:>10.4f}"
                f"{int(pc['support'][i]):>10d}")
        lines.append(f"{'accuracy':<{width}}{'':>10}{'':>10}"
                     f"{self.score():>10.4f}"
                     f"{int(self._cm.sum()):>10d}")
        lines.append(f"{'macro f1':<{width}}{'':>10}{'':>10}"
                     f"{self.macro_f1():>10.4f}{'':>10}")
        return "\n".join(lines)


class JointEvaluator(Evaluator):
    """Fan one stream of (outputs, labels) updates into several
    evaluators: the FIRST is primary (its score drives best-checkpoint
    selection and is what ``score()`` returns); ``report()`` delegates
    to the first member that has one.  Lets e.g. a top-k accuracy score
    and a confusion-matrix report accumulate in one evaluation pass
    (test.py --topk --report) instead of one silently replacing the
    other."""

    def __init__(self, *members: Evaluator):
        if not members:
            raise ValueError("JointEvaluator needs at least one member")
        self.members = members
        self.name = members[0].name
        self.higher_is_better = members[0].higher_is_better

    def reset(self):
        for m in self.members:
            m.reset()

    def update(self, outputs, labels):
        for m in self.members:
            m.update(outputs, labels)

    def score(self) -> float:
        return self.members[0].score()

    def report(self, class_names=None) -> str:
        for m in self.members[1:] + self.members[:1]:
            if hasattr(m, "report"):
                return m.report(class_names)
        raise AttributeError("no member evaluator exposes report()")


class LossEvaluator(Evaluator):
    """Tracks mean loss (GAN path, where no accuracy exists)."""

    name = "loss"
    higher_is_better = False

    def reset(self):
        self._sum = 0.0
        self._n = 0

    def __init__(self):
        self.reset()

    def update(self, loss, _labels=None):
        self._sum += float(jnp.sum(jnp.asarray(loss)))
        self._n += max(int(np.size(loss)), 1)

    def score(self) -> float:
        return self._sum / max(self._n, 1)


def decode_predictions(logits, class_names: list[str], top: int = 5
                       ) -> list[list[tuple[str, float]]]:
    """Human-readable top-k: [[(class_name, prob), ...] per image]."""
    logits = jnp.asarray(logits)
    probs = np.asarray(jax.nn.softmax(logits.astype(jnp.float32), -1))
    out = []
    for row in probs:
        idx = np.argsort(row)[::-1][:top]
        out.append([(class_names[i], float(row[i])) for i in idx])
    return out


def make_evaluator(name: str, **kwargs) -> Evaluator:
    table = {"accuracy": AccuracyEvaluator, "error_rate": ErrorRateEvaluator,
             "miou": MeanIoUEvaluator, "loss": LossEvaluator,
             "confusion": ConfusionMatrixEvaluator}
    try:
        return table[name](**kwargs)
    except KeyError as e:
        raise ValueError(f"unknown evaluator {name!r}; "
                         f"valid: {sorted(table)}") from e
