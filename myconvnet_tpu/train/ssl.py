"""Self-supervised pretraining: MAE (masked reconstruction) and SimCLR
(contrastive) — the fifth task family, beyond the reference's supervised
scope (mount empty, SURVEY.md §0).

TPU shape of each step:

* ONE jitted program per step, like every other family: on-device view
  augmentation + forward + backward + update.  The MAE encoder sees only
  the visible tokens (models/mae.py); the SimCLR similarity matrix is a
  single [2N, D] x [D, 2N] MXU matmul.
* Under a data mesh the batch shards over the ``data`` axis and GSPMD
  inserts the collectives.  For SimCLR this matters semantically: the
  NT-Xent loss is defined over the FULL batch, so the z @ z.T contraction
  makes XLA all-gather the embeddings — every chip contrasts against all
  global negatives automatically, with no hand-written collective (the
  large-batch behavior SimCLR needs).
* Pretraining quality is tracked without labels via the loss, and with a
  small labeled bank via :func:`knn_eval` (cosine-kNN probe — one matmul,
  the standard cheap SSL monitor; a full linear probe = fine-tune with
  ``optimizer.freeze`` afterwards).

Losses sum over many bf16 terms, so both objectives compute in f32
(same policy as the detection losses and ops/attention.py softmax).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu.core.module import Params, Transformed
from myconvnet_tpu.train.optim import Optimizer
from myconvnet_tpu.train.trainer import TrainState


# ----------------------------------------------------------------- MAE

def masked_mse(pred: jax.Array, target: jax.Array,
               mask: jax.Array) -> jax.Array:
    """Mean squared error over MASKED patches only (the MAE objective).

    pred/target: [B, N, D], mask: [B, N] with 1 = masked.  f32 math.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    per_patch = jnp.mean(jnp.square(pred - target), axis=-1)  # [B, N]
    return jnp.sum(per_patch * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_mae_step(model: Transformed, optimizer: Optimizer,
                  augment_fn: Callable | None = None) -> Callable:
    """One fused MAE step: (TrainState, x_u8) -> (TrainState, metrics).

    ``augment_fn(key, x_u8) -> x_float`` is the on-device view chain
    (crop/flip/normalize); the model is an ``models.mae`` forward
    returning (pred, target, mask).
    """

    def step(state: TrainState, x):
        if isinstance(x, tuple):
            x = x[0]                       # labeled iterators: drop y
        base = jax.random.wrap_key_data(state.rng)
        key = jax.random.fold_in(base, state.step)
        k_aug, k_model = jax.random.split(key)
        if augment_fn is not None:
            x = augment_fn(k_aug, x)

        def loss_fn(params):
            (pred, target, mask), new_state = model.apply(
                params, state.model_state, k_model, x, True)
            return masked_mse(pred, target, mask), new_state

        (loss, new_mstate), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_params, new_opt = optimizer.update(
            grads, state.opt_state, state.params, state.step)
        new = TrainState(new_params, new_mstate, new_opt,
                         state.step + 1, state.rng)
        return new, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,))


# -------------------------------------------------------------- SimCLR

def nt_xent(z: jax.Array, temperature: float = 0.5
            ) -> tuple[jax.Array, jax.Array]:
    """Normalized-temperature cross entropy (Chen et al., 2020).

    z: [2N, D] — rows i and i+N are the two views of example i.
    Returns (loss, contrastive top-1 accuracy).  One MXU matmul for the
    similarity matrix; softmax statistics in f32.
    """
    two_n = z.shape[0]
    n = two_n // 2
    z = z.astype(jnp.float32)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
    sim = (z @ z.T) / temperature                       # [2N, 2N]
    sim = jnp.where(jnp.eye(two_n, dtype=bool), -1e9, sim)
    labels = jnp.concatenate(
        [jnp.arange(n) + n, jnp.arange(n)])             # positive index
    logp = jax.nn.log_softmax(sim, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))
    acc = jnp.mean((jnp.argmax(sim, axis=-1) == labels)
                   .astype(jnp.float32))
    return loss, acc


def make_simclr_step(model: Transformed, optimizer: Optimizer,
                     view_fn: Callable,
                     temperature: float = 0.5) -> Callable:
    """One fused SimCLR step: (TrainState, x_u8) -> (TrainState, metrics).

    ``view_fn(key, x_u8) -> x_float`` draws ONE stochastic view; the step
    draws two with independent keys and runs them as a single [2N, ...]
    batch, so BN statistics and the projector see both views together
    (the paper's setup) and the model compiles once.
    """

    def step(state: TrainState, x):
        if isinstance(x, tuple):
            x = x[0]
        base = jax.random.wrap_key_data(state.rng)
        key = jax.random.fold_in(base, state.step)
        k1, k2, k_model = jax.random.split(key, 3)
        views = jnp.concatenate([view_fn(k1, x), view_fn(k2, x)], axis=0)

        def loss_fn(params):
            z, new_state = model.apply(params, state.model_state,
                                       k_model, views, True)
            loss, acc = nt_xent(z, temperature)
            return loss, (new_state, acc)

        (loss, (new_mstate, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_params, new_opt = optimizer.update(
            grads, state.opt_state, state.params, state.step)
        new = TrainState(new_params, new_mstate, new_opt,
                         state.step + 1, state.rng)
        return new, {"loss": loss, "contrast_acc": acc}

    return jax.jit(step, donate_argnums=(0,))


# ------------------------------------------------------- encoder export

def export_encoder_npz(params: Params, path: str,
                       exclude: tuple[str, ...] = (
                           "decoder", "projector", "logits", "head",
                           "fc1", "fc2")) -> str:
    """Write the ENCODER subset of a param tree as a flat ``scope::name``
    npz — the warm-start file ``pretrained=dict(path=...)`` consumes
    (models/pretrained.load_npz_weights, subset restore).

    ``exclude`` drops scopes whose top-level component matches: the MAE
    decoder, the SimCLR projector, and throwaway classifier heads never
    belong in a downstream warm start.
    """
    flat = {}
    for scope_path, bucket in params.items():
        top = scope_path.split("/", 1)[0]
        if top in exclude:
            continue
        for pname, arr in bucket.items():
            flat[f"{scope_path}::{pname}"] = np.asarray(arr)
    np.savez(path, **flat)
    return path


# ------------------------------------------------------------- kNN probe

def knn_classify(bank_z: jax.Array, bank_y: jax.Array, query_z: jax.Array,
                 *, k: int = 20, num_classes: int = 10,
                 temperature: float = 0.07) -> jax.Array:
    """Weighted cosine-kNN prediction (the standard SSL monitor, Wu et
    al. 2018).  bank_z: [M, D], bank_y: [M] int, query_z: [Q, D].
    Returns predicted labels [Q].  One [Q, D] x [D, M] matmul.
    """
    bz = bank_z.astype(jnp.float32)
    bz = bz / jnp.maximum(jnp.linalg.norm(bz, axis=-1, keepdims=True),
                          1e-12)
    qz = query_z.astype(jnp.float32)
    qz = qz / jnp.maximum(jnp.linalg.norm(qz, axis=-1, keepdims=True),
                          1e-12)
    sim = qz @ bz.T                                     # [Q, M]
    k = min(k, bz.shape[0])
    top_sim, top_idx = jax.lax.top_k(sim, k)
    top_y = bank_y[top_idx]                             # [Q, k]
    weights = jnp.exp(top_sim / temperature)
    onehot = jax.nn.one_hot(top_y, num_classes)         # [Q, k, C]
    votes = jnp.sum(weights[:, :, None] * onehot, axis=1)
    return jnp.argmax(votes, axis=-1)


def knn_eval(feats_fn: Callable, state: Any, bank_iter, query_iter, *,
             k: int = 20, num_classes: int = 10,
             max_bank: int = 4096, max_query: int = 2048) -> float:
    """kNN top-1 of frozen features: embed a labeled bank and a query
    split with ``feats_fn(state, x_u8) -> [N, D]``, classify by weighted
    cosine-kNN.  Host loop over batches; the embeddings and the vote are
    on-device.
    """
    def embed(it, cap):
        zs, ys, seen = [], [], 0
        for x, y in it:
            if seen >= cap:
                break
            z = feats_fn(state, x)
            zs.append(np.asarray(z))
            ys.append(np.asarray(y))
            seen += len(zs[-1])
        return (np.concatenate(zs)[:cap], np.concatenate(ys)[:cap])

    bank_z, bank_y = embed(bank_iter, max_bank)
    query_z, query_y = embed(query_iter, max_query)
    pred = knn_classify(jnp.asarray(bank_z), jnp.asarray(bank_y),
                        jnp.asarray(query_z), k=k,
                        num_classes=num_classes)
    return float(np.mean(np.asarray(pred) == query_y))
