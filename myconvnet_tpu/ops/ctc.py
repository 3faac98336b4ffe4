"""Connectionist Temporal Classification (Graves et al., 2006).

Loss machinery for the OCR family (the reference is a TF-1.x image
framework with no sequence losses — SURVEY.md §2; mount empty, §0).
TPU mapping notes:

* The forward (alpha) recursion runs as ONE ``lax.scan`` over time with
  static ``[N, 2L+1]`` state — no data-dependent shapes anywhere, so
  the whole loss jits into the training program.
* Per-frame emission probabilities for the extended label sequence are
  read with a one-hot einsum (``[N,T,C] x [N,S,C] -> [T,N,S]``), the
  repo's standard gather-free idiom: S and C are small, the MXU eats
  it, and no scatter/gather lowering is hit.
* ``-inf`` is represented as a large-negative constant so the
  log-sum-exp in the recursion never produces NaN gradients for
  impossible states (``-inf - -inf`` hazards).

Label convention: ``labels[n]`` is right-padded with ``blank`` (=0 by
default); charsets therefore index their symbols from 1.  An all-pad
row is a legal empty target (the all-blank path scores it).

Parity: tested against ``torch.nn.functional.ctc_loss`` (values AND
gradients) in tests/test_ocr.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e30  # effective log(0); keeps logsumexp grads NaN-free


def _logsumexp3(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    m = jnp.maximum(jnp.maximum(a, b), c)
    # m can legitimately be _NEG (all paths impossible): anchor it so
    # the exponent stays 0 instead of overflowing
    m_safe = jnp.maximum(m, _NEG)
    return m_safe + jnp.log(jnp.exp(a - m_safe) + jnp.exp(b - m_safe)
                            + jnp.exp(c - m_safe))


def ctc_loss(logits: jax.Array, labels: jax.Array, *, blank: int = 0,
             logit_lengths: jax.Array | None = None,
             reduction: str = "mean_label") -> jax.Array:
    """CTC negative log-likelihood.

    Args:
      logits: ``[N, T, C]`` unnormalized scores (C includes the blank).
      labels: ``[N, L]`` int targets, right-padded with ``blank``.
      blank: the blank/pad class id (default 0).
      logit_lengths: optional ``[N]`` valid frame counts; frames past
        the length emit blank with probability 1 (log-prob 0), which
        leaves the likelihood exactly equal to the truncated-sequence
        one while keeping every shape static.
      reduction: ``'mean_label'`` (torch's ``'mean'``: each sample's
        NLL divided by its label length, then batch-averaged),
        ``'mean'`` (batch mean of raw NLLs), ``'sum'`` or ``'none'``.

    Returns: scalar loss (or ``[N]`` NLLs for ``'none'``), f32.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    n, t, c = logp.shape
    l = labels.shape[1]
    s = 2 * l + 1
    labels = labels.astype(jnp.int32)
    # extended sequence: blank, y1, blank, y2, ..., yL, blank
    ext = jnp.full((n, s), blank, jnp.int32).at[:, 1::2].set(labels)
    # the s-2 -> s skip is allowed only into a non-blank state that
    # differs from the symbol two back (repeated chars need the blank)
    skip = jnp.concatenate(
        [jnp.zeros((n, 2), bool),
         (ext[:, 2:] != blank) & (ext[:, 2:] != ext[:, :-2])], axis=1)
    label_len = jnp.sum((labels != blank).astype(jnp.int32), axis=1)

    if logit_lengths is not None:
        frame_ok = (jnp.arange(t)[None, :]
                    < jnp.asarray(logit_lengths)[:, None])
        blank_row = jnp.full((c,), _NEG, logp.dtype).at[blank].set(0.0)
        logp = jnp.where(frame_ok[..., None], logp, blank_row)

    # per-state emission log-probs, gather-free: [T, N, S].  HIGHEST
    # precision: this einsum SELECTS log-probs (one-hot operand), and
    # the TPU's default bf16 matmul would round every emission to 8
    # mantissa bits — measured ~1e-2 NLL error vs the f64 recursion
    emit = jnp.einsum("ntc,nsc->tns", logp,
                      jax.nn.one_hot(ext, c, dtype=logp.dtype),
                      precision=jax.lax.Precision.HIGHEST)

    alpha0 = jnp.full((n, s), _NEG, logp.dtype)
    alpha0 = alpha0.at[:, 0].set(emit[0, :, 0])
    if s > 1:
        alpha0 = alpha0.at[:, 1].set(
            jnp.where(label_len > 0, emit[0, :, 1], _NEG))

    def step(alpha, emit_t):
        p1 = jnp.pad(alpha, ((0, 0), (1, 0)),
                     constant_values=_NEG)[:, :-1]
        p2 = jnp.pad(alpha, ((0, 0), (2, 0)),
                     constant_values=_NEG)[:, :-2]
        p2 = jnp.where(skip, p2, _NEG)
        return _logsumexp3(alpha, p1, p2) + emit_t, None

    alpha, _ = jax.lax.scan(step, alpha0, emit[1:])

    # final states: the last blank (s = 2*len) and last symbol (2*len-1)
    idx_last = 2 * label_len
    idx_prev = jnp.maximum(idx_last - 1, 0)
    sel_last = jax.nn.one_hot(idx_last, s, dtype=alpha.dtype)
    sel_prev = jax.nn.one_hot(idx_prev, s, dtype=alpha.dtype)
    a_last = jnp.sum(alpha * sel_last, axis=1)
    a_prev = jnp.where(label_len > 0,
                       jnp.sum(alpha * sel_prev, axis=1), _NEG)
    m = jnp.maximum(jnp.maximum(a_last, a_prev), _NEG)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    nll = -ll
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "mean_label":
        return jnp.mean(nll / jnp.maximum(label_len, 1).astype(nll.dtype))
    raise ValueError(f"unknown reduction {reduction!r}; valid: "
                     "['mean_label', 'mean', 'sum', 'none']")


# ----------------------------------------------------------------- decoding

def best_path(logits) -> np.ndarray:
    """Frame-wise argmax path ``[N, T]`` (host numpy)."""
    return np.argmax(np.asarray(logits), axis=-1)


def collapse(path, *, blank: int = 0) -> list[int]:
    """Collapse one frame path: merge repeats, then drop blanks."""
    out: list[int] = []
    prev = None
    for p in np.asarray(path).tolist():
        if p != prev and p != blank:
            out.append(int(p))
        prev = p
    return out


def ctc_greedy_decode(logits, *, blank: int = 0) -> list[list[int]]:
    """Greedy (best-path) decode: ``[N, T, C]`` -> list of N symbol
    sequences.  Host-side: decoding is a per-eval-batch epilogue, not
    part of the jitted program."""
    return [collapse(p, blank=blank) for p in best_path(logits)]


def ctc_beam_decode(logits, *, beam_width: int = 8,
                    blank: int = 0) -> list[list[int]]:
    """Prefix beam search (Hannun et al., 2014) without an LM.

    Host-side numpy over log-probs; exact for beam_width >= number of
    distinct prefixes.  Used by eval when the recipe asks for it —
    greedy is the default (the CRNN paper reports both)."""
    logp_all = np.asarray(jax.nn.log_softmax(
        jnp.asarray(logits, jnp.float32), axis=-1))
    results = []
    for logp in logp_all:  # [T, C]
        # beams: prefix tuple -> (log p ending in blank, log p ending
        # in non-blank)
        beams = {(): (0.0, -np.inf)}
        for frame in logp:
            order = np.argsort(frame)[::-1][:max(beam_width, 2)]
            new: dict[tuple, list[float]] = {}

            def add(prefix, pb, pnb):
                old = new.get(prefix)
                if old is None:
                    new[prefix] = [pb, pnb]
                else:
                    old[0] = np.logaddexp(old[0], pb)
                    old[1] = np.logaddexp(old[1], pnb)

            for prefix, (pb, pnb) in beams.items():
                total = np.logaddexp(pb, pnb)
                for sym in order:
                    p = float(frame[sym])
                    if sym == blank:
                        add(prefix, total + p, -np.inf)
                    elif prefix and sym == prefix[-1]:
                        # repeat: extends the non-blank ending only
                        # via a blank in between
                        add(prefix, -np.inf, pnb + p)
                        add(prefix + (int(sym),), -np.inf, pb + p)
                    else:
                        add(prefix + (int(sym),), -np.inf, total + p)
            beams = dict(sorted(
                new.items(),
                key=lambda kv: -np.logaddexp(kv[1][0], kv[1][1])
            )[:beam_width])
        best = max(beams.items(),
                   key=lambda kv: np.logaddexp(kv[1][0], kv[1][1]))[0]
        results.append(list(best))
    return results
