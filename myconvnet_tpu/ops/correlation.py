"""Correlation (cost) volume for optical flow (FlowNetC, Dosovitskiy
et al., 2015 — fifteenth task family; the reference framework has no
flow ops, SURVEY.md §2; mount empty, §0).

TPU mapping: the volume is a STATIC Python loop over the (2d+1)^2
displacement grid — each displacement is one padded static slice of
the second feature map, an elementwise multiply with the first, and a
channel-mean.  No gathers, no dynamic shapes; XLA fuses the whole
stack into a handful of elementwise kernels over the feature tensors
(the channel reduction keeps the output (2d+1)^2-channel map small —
at d=4 that is 81 channels, the paper's setting at stride-8
features).  Out-of-frame displacements contribute zeros, matching
the zero-padding semantics of the original CUDA kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def correlation_volume(f1: jax.Array, f2: jax.Array, *,
                       max_displacement: int = 4) -> jax.Array:
    """``[N,H,W,C] x [N,H,W,C] -> [N,H,W,(2d+1)^2]`` cost volume.

    Channel k = dy*(2d+1)+dx holds ``mean_c(f1[y,x,c] *
    f2[y+dy-d, x+dx-d, c])`` (displacements scan top-left to
    bottom-right; the center channel d*(2d+1)+d is the plain local
    dot product).  Computes in f32: the costs are means of C
    products and bf16 accumulation loses the ranking resolution the
    matching needs.
    """
    if f1.shape != f2.shape:
        raise ValueError(f"feature shapes differ: {f1.shape} vs "
                         f"{f2.shape}")
    d = int(max_displacement)
    if d < 0:
        raise ValueError(f"max_displacement must be >= 0, got {d}")
    a = f1.astype(jnp.float32)
    b = f2.astype(jnp.float32)
    n, h, w, c = a.shape
    # zero-pad once; every displacement is then a static slice
    bp = jnp.pad(b, ((0, 0), (d, d), (d, d), (0, 0)))
    out = []
    for dy in range(2 * d + 1):
        for dx in range(2 * d + 1):
            shifted = jax.lax.dynamic_slice(
                bp, (0, dy, dx, 0), (n, h, w, c))  # static start values
            out.append(jnp.mean(a * shifted, axis=-1))
    return jnp.stack(out, axis=-1)
