"""Inference-graph optimization: fold BN into adjacent convs.

A serving-path optimization with no reference equivalent (the reference
serves the training graph; SURVEY.md §3.3).  For frozen inference,
``conv -> BN`` collapses into a single conv with adjusted weights:

    w' = w * gamma * rstd        (per output channel)
    b' = beta + (b - mean) * gamma * rstd

halving elementwise HBM traffic at the BN sites and letting XLA fuse the
remaining activation straight into the conv epilogue.

Works on our param/state trees by name convention: a scope ``<s>/conv*``
followed by ``<s>/bn*`` (or sibling ``conv_x``/``bn_x`` pairs as used by
the model zoo).
"""

from __future__ import annotations

import numpy as np

from myconvnet_tpu.core.module import Params, State


def _fold_one(w, b, gamma, beta, mean, var, eps):
    rstd = 1.0 / np.sqrt(np.asarray(var, np.float64) + eps)
    scale = np.asarray(gamma, np.float64) * rstd
    w2 = np.asarray(w, np.float64) * scale  # broadcast over last axis
    b0 = np.zeros_like(scale) if b is None else np.asarray(b, np.float64)
    b2 = np.asarray(beta, np.float64) + (b0 - np.asarray(mean, np.float64)
                                         ) * scale
    return w2.astype(np.float32), b2.astype(np.float32)


def _pair_scopes(params: Params, state: State):
    """Yield (conv_scope, bn_scope) pairs by the zoo's naming convention:
    bn scope = conv scope with 'conv' -> 'bn' (same suffix), in the same
    parent path."""
    for scope in params:
        leaf = scope.rsplit("/", 1)[-1]
        if not leaf.startswith("conv"):
            continue
        suffix = leaf[len("conv"):]
        parent = scope[: -len(leaf)]
        bn_scope = f"{parent}bn{suffix}"
        if bn_scope in params and bn_scope in state:
            yield scope, bn_scope


def fold_batch_norms(params: Params, state: State,
                     eps_by_scope: float | dict = 1e-5
                     ) -> tuple[Params, State]:
    """Return (folded_params, remaining_state).

    Folded convs gain/update their bias; folded BN entries are removed
    from both trees.  Use with a model applied in eval mode with
    ``fold_bn=True`` support, or via :func:`strip_folded_bn_apply`.
    """
    new_p = {k: dict(v) for k, v in params.items()}
    new_s = {k: dict(v) for k, v in state.items()}
    folded = []
    for conv_scope, bn_scope in _pair_scopes(params, state):
        bnp, bns = params[bn_scope], state[bn_scope]
        if "gamma" not in bnp or "moving_mean" not in bns:
            continue
        w = new_p[conv_scope]["w"]
        if w.shape[-1] != bnp["gamma"].shape[0]:
            continue  # BN does not normalize this conv's output
        b = new_p[conv_scope].get("b")
        w2, b2 = _fold_one(w, b, bnp["gamma"], bnp["beta"],
                           bns["moving_mean"], bns["moving_var"],
                           _eps_for(eps_by_scope, bn_scope))
        new_p[conv_scope]["w"] = w2
        new_p[conv_scope]["b"] = b2
        del new_p[bn_scope]
        del new_s[bn_scope]
        folded.append(bn_scope)
    return new_p, new_s


def _eps_for(eps_by_scope, scope):
    if isinstance(eps_by_scope, dict):
        return eps_by_scope.get(scope, 1e-5)
    return float(eps_by_scope)


def folded_scope_count(params: Params, state: State) -> int:
    return sum(1 for _ in _pair_scopes(params, state))


def verify_folding(model, params: Params, state: State, sample_x,
                   atol: float = 1e-4, eps: float | dict = 1e-5) -> float:
    """Fold, run both graphs in eval mode, return max abs output delta.

    Name-convention pairing is validated by channel-count guards, but a
    coincidental channel match in a skip-pattern architecture could fold
    a wrong pair — this check makes folding safe to apply blindly.
    Raises if the delta exceeds ``atol``.
    """
    import jax.numpy as jnp

    y_ref, _ = model.apply(params, state, None, sample_x, False)
    fp, fs = fold_batch_norms(params, state, eps)
    y_fold, _ = model.apply(fp, fs, None, sample_x, False)
    err = float(jnp.max(jnp.abs(jnp.asarray(y_ref, jnp.float32) -
                                jnp.asarray(y_fold, jnp.float32))))
    if err > atol:
        raise ValueError(f"BN folding changed outputs by {err} (> {atol}); "
                         "do not serve the folded graph")
    return err
