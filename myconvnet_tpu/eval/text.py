"""Text-recognition metrics: character error rate + sequence accuracy
(thirteenth task family; the reference has no sequence metrics —
SURVEY.md §2; mount empty, §0).

CER = sum(edit_distance(pred, truth)) / sum(len(truth)) — the corpus-
level (not per-sample-averaged) convention, matching the standard
scene-text/ASR protocol.  Decoding (greedy best-path or prefix beam,
``ops/ctc.py``) and the Levenshtein DP run on host: per eval batch
they are microseconds next to the forward pass, and keeping them off
the device means the jitted eval step stays the shared logits/labels
program every other evaluator uses.
"""

from __future__ import annotations

import numpy as np

from myconvnet_tpu.eval.evaluators import Evaluator
from myconvnet_tpu.ops.ctc import ctc_beam_decode, ctc_greedy_decode


def edit_distance(a, b) -> int:
    """Levenshtein distance between two symbol sequences (numpy DP)."""
    a, b = list(a), list(b)
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = np.arange(len(b) + 1)
    for i, ca in enumerate(a, 1):
        curr = np.empty(len(b) + 1, prev.dtype)
        curr[0] = i
        for j, cb in enumerate(b, 1):
            curr[j] = min(prev[j] + 1, curr[j - 1] + 1,
                          prev[j - 1] + (ca != cb))
        prev = curr
    return int(prev[-1])


def _strip_pad(labels: np.ndarray, pad: int = 0) -> list[list[int]]:
    return [[int(v) for v in row if v != pad] for row in labels]


class CharErrorRateEvaluator(Evaluator):
    """Corpus-level CER over CTC frame logits (lower is better).

    ``update(logits, labels)``: logits ``[N, T, C]``, labels ``[N, L]``
    right-padded with 0 — the contract every trainer eval step already
    emits, so this plugs into ``ConvNet.evaluate`` unchanged.
    """

    name = "cer"
    higher_is_better = False

    def __init__(self, decoder: str = "greedy", beam_width: int = 8):
        if decoder not in ("greedy", "beam"):
            raise ValueError(f"unknown decoder {decoder!r}; valid: "
                             "['greedy', 'beam']")
        self.decoder = decoder
        self.beam_width = beam_width
        self.reset()

    def reset(self):
        self._edits = 0
        self._chars = 0
        self._seq_correct = 0
        self._seqs = 0

    def _decode(self, logits) -> list[list[int]]:
        if self.decoder == "beam":
            return ctc_beam_decode(logits, beam_width=self.beam_width)
        return ctc_greedy_decode(logits)

    def update(self, logits, labels):
        preds = self._decode(np.asarray(logits))
        truths = _strip_pad(np.asarray(labels))
        for p, t in zip(preds, truths):
            self._edits += edit_distance(p, t)
            # empty truths still count one unit so CER stays bounded
            self._chars += max(len(t), 1)
            self._seq_correct += int(p == t)
            self._seqs += 1

    def score(self) -> float:
        return self._edits / max(self._chars, 1)

    @property
    def sequence_accuracy(self) -> float:
        """Exact-match rate (the CRNN paper's headline metric)."""
        return self._seq_correct / max(self._seqs, 1)


class SequenceAccuracyEvaluator(CharErrorRateEvaluator):
    """Exact-match word accuracy (higher is better) — same
    accumulation, opposite headline."""

    name = "seq_accuracy"
    higher_is_better = True

    def score(self) -> float:
        return self.sequence_accuracy
