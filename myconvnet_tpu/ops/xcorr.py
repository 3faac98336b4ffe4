"""Siamese cross-correlation (SiamFC's scoring op; the reference
framework has no tracking ops, SURVEY.md §2; mount empty, §0).

``out[n, y, x] = sum_{dy, dx, c} search[n, y+dy, x+dx, c]
                                 * exemplar[n, dy, dx, c]``

— the exemplar's feature map slides over the search feature map as a
per-sample correlation kernel ("valid" extent, so the output is
``[N, H-h+1, W-w+1]``).

TPU mapping: the kernel differs PER SAMPLE, which a stock conv cannot
express without unrolling the batch.  Instead the op is decomposed
over the exemplar's static ``h*w`` spatial taps — each tap is an
elementwise multiply of a shifted search slice with one exemplar
pixel-vector, reduced over channels.  All slices are static (XLA
fuses the whole sum into a few HBM sweeps), no gathers, no dynamic
shapes; at SiamFC's operating point (exemplar features 6x6-8x8) this
is 36-64 fused FMA terms — the same trick as ops/correlation.py with
the roles of "displacement grid" and "kernel" swapped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_correlate(search: jax.Array, exemplar: jax.Array,
                    ) -> jax.Array:
    """``[N,H,W,C] x [N,h,w,C] -> [N, H-h+1, W-w+1]`` per-sample valid
    cross-correlation.  Accumulates in f32 (bf16 inputs welcome — each
    term is a C-length dot whose bf16 sum would lose mantissa at
    SiamFC's C=128-256)."""
    if search.ndim != 4 or exemplar.ndim != 4:
        raise ValueError(f"need [N,H,W,C] x [N,h,w,C], got "
                         f"{search.shape} x {exemplar.shape}")
    n, hs, ws, c = search.shape
    ne, he, we, ce = exemplar.shape
    if n != ne or c != ce:
        raise ValueError(f"search {search.shape} and exemplar "
                         f"{exemplar.shape} disagree on N/C")
    if he > hs or we > ws:
        raise ValueError(f"exemplar {exemplar.shape} larger than "
                         f"search {search.shape}")
    oh, ow = hs - he + 1, ws - we + 1
    s = search.astype(jnp.float32)
    e = exemplar.astype(jnp.float32)
    out = jnp.zeros((n, oh, ow), jnp.float32)
    for dy in range(he):
        for dx in range(we):
            # [N, oh, ow, C] . [N, 1, 1, C] -> channel-reduced tap
            tap = jax.lax.slice(s, (0, dy, dx, 0), (n, dy + oh, dx + ow, c))
            out = out + jnp.einsum("nyxc,nc->nyx", tap, e[:, dy, dx, :])
    return out
