"""Stage splits of real models for pipeline parallelism.

SURVEY.md §2#12 notes the reference has data parallelism only; pipeline
parallelism is a rebuild extension (parallel/pipeline.py).  This module
turns zoo architectures into lists of pure per-stage apply functions so
an ACTUAL model — not a toy — trains through the heterogeneous GPipe
(``pipeline_hetero``).

The split VGG is the classic (no-BN) variant with the GAP head and no
dropout: the pipelined trunk must be stateless and deterministic
(BN moving statistics would need per-stage mutable state threaded
through the scan; classic VGG needs neither).
"""

from __future__ import annotations

import jax

from myconvnet_tpu import nn
from myconvnet_tpu.core.module import transform
from myconvnet_tpu.models.vgg import VGG_CFG


def _chunk(items, n):
    """Split into n contiguous chunks of near-equal length."""
    k, r = divmod(len(items), n)
    out, i = [], 0
    for c in range(n):
        step = k + (1 if c < r else 0)
        out.append(items[i:i + step])
        i += step
    return out


def vgg_stages(num_classes: int, depth: int = 16, n_stages: int = 2):
    """VGG split into ``n_stages`` contiguous pipeline stages.

    Returns (stage_aps, stage_inits): ``stage_aps[i]`` is a pure
    ``(params_tree, x) -> y``; ``stage_inits[i]`` is ``(key, x) ->
    params_tree``.  Composing the stages sequentially IS the vgg
    forward (use_bn=False, dropout off, GAP head) — the pipeline parity
    test relies on exactly this equivalence.
    """
    if depth not in VGG_CFG:
        raise ValueError(f"unsupported VGG depth {depth}")
    chunks = _chunk(list(VGG_CFG[depth]), n_stages)

    stage_aps, stage_inits = [], []
    for si, chunk in enumerate(chunks):
        last = si == n_stages - 1

        def fwd(x, chunk=tuple(chunk), last=last):
            for item in chunk:
                if item == "M":
                    x = nn.max_pool(x, 2, 2)
                else:
                    x = nn.conv(x, item, 3)
                    x = nn.relu(x)
            if last:
                x = nn.gap(x)
                x = nn.dense(x, num_classes, name="logits")
            return x

        t = transform(fwd)

        def ap(params, x, _t=t):
            out, _ = _t.apply(params, {}, None, x)
            return out

        def init(key, x, _t=t):
            params, _ = _t.init(key, x)
            return params

        stage_aps.append(ap)
        stage_inits.append(init)
    return stage_aps, stage_inits


def init_stage_params(stage_aps, stage_inits, key, sample_mb):
    """Initialize every stage by chaining shapes through the pipeline
    (each stage's input is the previous stage's output)."""
    params = []
    x = sample_mb
    for i, (ap, ini) in enumerate(zip(stage_aps, stage_inits)):
        p = ini(jax.random.fold_in(key, i), x)
        params.append(p)
        x = ap(p, x)
    return params
