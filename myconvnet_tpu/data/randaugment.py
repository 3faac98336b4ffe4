"""RandAugment (Cubuk et al.) as a branch-free on-device batch transform.

The reference's augmentation chain stops at crop/flip/jitter (SURVEY.md
§2#5); RandAugment is the standard stronger policy for the zoo's
ImageNet recipes (EfficientNet et al.).  TPU-first shape of the idea:

* NO per-image Python control flow — every op in the pool is computed
  for the whole batch and the per-image choice is a ``jnp.where`` fold.
  XLA fuses the pool into a handful of elementwise passes; wall-clock is
  pool-size HBM sweeps per layer, a few ms at batch 256 (augmentation is
  <5% of a train step; see PERF_NOTES.md).
* Ops map to elementwise math, separable one-hot matmuls (translate
  reuses the crop machinery's axis-matrix trick), or the Pallas affine
  resampler (rotate via 3-shear, shear-x/y — bounded dynamic lane-rolls
  in VMEM, ops/pallas/affine.py; round 2 closed the canonical-pool
  geometry gap).  Even PIL's equalize (usually skipped on TPU as
  scatter-shaped) is here, as broadcast-compare reduction passes.  The
  pool is a config knob, so recipes can subset (e.g. drop the
  geometry/histogram ops to shave the where-fold's cost).

Magnitude semantics follow the paper: one global ``magnitude`` M in
[0, 30] scaled per-op onto its natural range, with a random sign for
signed ops, and ``num_layers`` ops applied sequentially per image.
Input/output: [N,H,W,C] float in [0, 1] (pre-normalization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAX_MAGNITUDE = 30.0


def _blend(a: jax.Array, b: jax.Array, factor: jax.Array) -> jax.Array:
    """PIL enhance convention: factor 0 -> a (degenerate), 1 -> b
    (identity-side is b here); linear extrapolation allowed, clipped."""
    return jnp.clip(a + (b - a) * factor, 0.0, 1.0)


def _gray(x: jax.Array) -> jax.Array:
    coef = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.sum(x * coef, axis=-1, keepdims=True)


# Every op: (x [N,H,W,C] in [0,1], mag01 [N,1,1,1] signed in [-1,1]) -> x.

def op_identity(x, mag01):
    return x


def op_brightness(x, mag01):
    return _blend(jnp.zeros_like(x), x, 1.0 + 0.9 * mag01)


def op_contrast(x, mag01):
    mean = jnp.mean(_gray(x), axis=(1, 2, 3), keepdims=True)
    return _blend(jnp.broadcast_to(mean, x.shape), x, 1.0 + 0.9 * mag01)


def op_color(x, mag01):
    g = jnp.broadcast_to(_gray(x), x.shape)
    return _blend(g, x, 1.0 + 0.9 * mag01)


def op_sharpness(x, mag01):
    # PIL smooth kernel [[1,1,1],[1,5,1],[1,1,1]]/13, edges kept (the
    # blur applies to the interior only) — a 3x3 depthwise conv
    k = jnp.asarray([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]],
                    jnp.float32) / 13.0
    n, h, w, c = x.shape
    xf = jnp.moveaxis(x, -1, 1).reshape(n * c, 1, h, w)
    blur = jax.lax.conv_general_dilated(
        xf.astype(jnp.float32), k[None, None], (1, 1), "SAME")
    blur = jnp.moveaxis(blur.reshape(n, c, h, w), 1, -1).astype(x.dtype)
    interior = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True) \
        if h > 2 and w > 2 else jnp.zeros((h, w), bool)
    blur = jnp.where(interior[None, :, :, None], blur, x)
    return _blend(blur, x, 1.0 + 0.9 * mag01)


def op_posterize(x, mag01):
    # keep 8..4 bits as |magnitude| grows (AutoAugment range)
    bits = 8.0 - jnp.abs(mag01) * 4.0
    levels = jnp.exp2(jnp.floor(bits))
    q = jnp.floor(x * 255.0 / (256.0 / levels)) * (256.0 / levels) / 255.0
    return jnp.clip(q, 0.0, 1.0)


def op_solarize(x, mag01):
    thresh = 1.0 - jnp.abs(mag01)
    return jnp.where(x < thresh, x, 1.0 - x)


def op_solarize_add(x, mag01):
    # add up to 110/256 below the 0.5 threshold (TF AutoAugment op)
    add = jnp.abs(mag01) * (110.0 / 255.0)
    return jnp.where(x < 0.5, jnp.clip(x + add, 0.0, 1.0), x)


def op_invert(x, mag01):
    return 1.0 - x


def op_autocontrast(x, mag01):
    lo = jnp.min(x, axis=(1, 2), keepdims=True)
    hi = jnp.max(x, axis=(1, 2), keepdims=True)
    scale = 1.0 / jnp.maximum(hi - lo, 1e-5)
    stretched = jnp.clip((x - lo) * scale, 0.0, 1.0)
    return jnp.where(hi > lo, stretched, x)


def op_equalize(x, mag01):
    """PIL ``ImageOps.equalize`` (per-image, per-channel histogram
    equalization), batched and gather-free: both the 256-bin histogram
    and the LUT application are broadcast-compare passes that XLA fuses
    into reductions (no scatter, no per-pixel gather — the reason this
    op is usually skipped on TPU).  Magnitude-free like autocontrast.

    Bit-exact vs PIL on 8-bit content (the input is binned to 256
    levels; integer arithmetic stays exact in f32 at these ranges, with
    an epsilon dominating fp division error below the 1/step result
    granularity)."""
    _, h, w, c = x.shape
    bins = jnp.clip(jnp.round(x.astype(jnp.float32) * 255.0),
                    0, 255).astype(jnp.int32)
    iota = jnp.arange(256, dtype=jnp.int32)
    eq = (bins[..., None] == iota).astype(jnp.float32)  # fused into sums
    hist = jnp.sum(eq, axis=(1, 2))                     # [N, C, 256]

    nz = hist > 0
    last_idx = jnp.argmax(jnp.where(nz, iota[None, None, :], -1), -1)
    last_count = jnp.sum(
        hist * (iota[None, None, :] == last_idx[..., None]), -1)
    step = jnp.floor((h * w - last_count) / 255.0)      # [N, C]
    cum = jnp.cumsum(hist, axis=-1) - hist              # counts BELOW bin
    lut = jnp.floor((cum + jnp.floor(step / 2.0)[..., None])
                    / jnp.maximum(step, 1.0)[..., None] + 1e-4)
    lut = jnp.clip(lut, 0.0, 255.0)
    out = jnp.sum(eq * lut[:, None, None, :, :], -1) / 255.0
    identity = (step < 1.0) | (jnp.sum(nz, -1) <= 1)    # PIL no-op cases
    return jnp.where(identity[:, None, None, :], x,
                     out.astype(x.dtype))


def _translate_matrix(shift: jax.Array, size: int) -> jax.Array:
    """One-hot shift matrices [N, size, size]: out[i] = in[i + shift]
    (out-of-frame rows all-zero -> fill handled by caller)."""
    i = jnp.arange(size, dtype=jnp.float32)
    src = i[None, :] + shift[:, None]          # [N, size]
    j = jnp.arange(size, dtype=jnp.float32)
    return (jnp.round(src)[:, :, None] == j[None, None, :]).astype(
        jnp.float32)


def _translate(x, shift_px, axis: int, fill: float = 0.5):
    n = x.shape[0]
    size = x.shape[axis]
    m = _translate_matrix(shift_px, size)      # [N, out, in]
    xf = x.astype(jnp.float32)
    if axis == 1:
        y = jnp.einsum("noi,nihc->nohc", m, xf, precision="highest")
    else:
        y = jnp.einsum("noi,nhic->nhoc", m, xf, precision="highest")
    cover = jnp.sum(m, -1)                     # [N, out]
    cover = cover[:, :, None, None] if axis == 1 else cover[:, None, :, None]
    return (y + (1.0 - cover) * fill).astype(x.dtype)


def op_translate_x(x, mag01):
    shift = mag01[:, 0, 0, 0] * (x.shape[2] / 3.0)
    return _translate(x, shift, axis=2)


def op_translate_y(x, mag01):
    shift = mag01[:, 0, 0, 0] * (x.shape[1] / 3.0)
    return _translate(x, shift, axis=1)


# -- geometry via the Pallas affine resampler (ops/pallas/affine.py):
# rotate / shear close the canonical-pool gap (round 2).  The kernel
# sweeps bounded dynamic lane-rolls in VMEM — no gathers, no extra HBM
# traffic; interpret mode covers CPU runs.

_SHEAR_MAX = 0.3            # AutoAugment shear range at M=30
_ROTATE_MAX = 30.0          # degrees at M=30


def _affine_interpret():
    return jax.default_backend() not in ("tpu", "axon")


def op_shear_x(x, mag01):
    from myconvnet_tpu.ops.pallas.affine import shear_x
    return shear_x(x, mag01[:, 0, 0, 0] * _SHEAR_MAX,
                   max_abs_slope=_SHEAR_MAX,
                   interpret=_affine_interpret())


def op_shear_y(x, mag01):
    from myconvnet_tpu.ops.pallas.affine import shear_y
    return shear_y(x, mag01[:, 0, 0, 0] * _SHEAR_MAX,
                   max_abs_slope=_SHEAR_MAX,
                   interpret=_affine_interpret())


def op_rotate(x, mag01):
    import math

    from myconvnet_tpu.ops.pallas.affine import rotate
    rad = mag01[:, 0, 0, 0] * (_ROTATE_MAX * math.pi / 180.0)
    return rotate(x, rad,
                  max_abs_radians=_ROTATE_MAX * math.pi / 180.0,
                  interpret=_affine_interpret())


POOL = {
    "identity": op_identity,
    "autocontrast": op_autocontrast,
    "equalize": op_equalize,
    "invert": op_invert,
    "posterize": op_posterize,
    "solarize": op_solarize,
    "solarize_add": op_solarize_add,
    "color": op_color,
    "contrast": op_contrast,
    "brightness": op_brightness,
    "sharpness": op_sharpness,
    "translate_x": op_translate_x,
    "translate_y": op_translate_y,
    "rotate": op_rotate,
    "shear_x": op_shear_x,
    "shear_y": op_shear_y,
}
# signed ops draw a random direction per image
SIGNED = {"color", "contrast", "brightness", "sharpness",
          "translate_x", "translate_y", "rotate", "shear_x", "shear_y"}
# the paper's canonical 14-op pool (full geometry + equalize)
CANONICAL_OPS = ("identity", "autocontrast", "equalize", "rotate",
                 "solarize", "color", "posterize", "contrast",
                 "brightness", "sharpness", "shear_x", "shear_y",
                 "translate_x", "translate_y")
# cheap pool: the where-fold computes EVERY op for every image each
# layer, so the expensive ops (geometry: 3 resample passes each;
# equalize: 2x 256-bin passes) would tax every layer by their full
# cost.  Measured at batch 256 / 224^2 on v5e: cheap fold ~19 ms,
# full canonical fold hundreds of ms (PERF_NOTES.md).  Recipes wanting
# the paper-exact pool pass ops=CANONICAL_OPS.
FAST_OPS = ("identity", "autocontrast", "invert", "posterize",
            "solarize", "solarize_add", "color", "contrast",
            "brightness", "sharpness", "translate_x", "translate_y")
DEFAULT_OPS = FAST_OPS


def rand_augment(key: jax.Array, x: jax.Array, *, num_layers: int = 2,
                 magnitude: float = 9.0,
                 ops: tuple[str, ...] | None = None,
                 backend: str = "xla",
                 interpret: bool | None = None) -> jax.Array:
    """Apply ``num_layers`` randomly-chosen pool ops per image at global
    ``magnitude`` (0..30).  x: [N,H,W,C] float in [0,1].

    ``backend="xla"`` (default): the full 12-op pool as a where-fold —
    every op computed, select keeps one.  ``backend="pallas"``: the
    scalar-elementwise 8-op subset with TRUE per-image branching in a
    TPU kernel (ops/pallas/randaugment_ew.py) — one HBM sweep per layer
    instead of |pool|.  ``interpret`` forces the kernel's interpreter
    mode (tests on CPU); default: interpret off on TPU backends.
    """
    if backend == "pallas":
        from myconvnet_tpu.ops.pallas.randaugment_ew import (PALLAS_POOL,
                                                             apply_layer)
        ops = PALLAS_POOL if ops is None else ops
        bad = set(ops) - set(PALLAS_POOL)
        if bad:
            raise ValueError(
                f"ops {sorted(bad)} need lane-crossing work; use "
                f"backend='xla' (pallas pool: {PALLAS_POOL})")
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        n = x.shape[0]
        mag = jnp.float32(magnitude) / _MAX_MAGNITUDE
        index_of = {name: PALLAS_POOL.index(name) for name in ops}
        table = jnp.asarray([index_of[name] for name in ops], jnp.int32)
        for layer in range(num_layers):
            k_op, k_sign, key = jax.random.split(key, 3)
            idx = table[jax.random.randint(k_op, (n,), 0, len(ops))]
            sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (n,)),
                             1.0, -1.0)
            x = apply_layer(x, idx, mag * sign, interpret=interpret)
        return x
    if backend != "xla":
        raise ValueError(f"unknown backend {backend!r}")
    ops = DEFAULT_OPS if ops is None else ops
    fns = [POOL[name] for name in ops]
    n = x.shape[0]
    mag = jnp.float32(magnitude) / _MAX_MAGNITUDE
    for layer in range(num_layers):
        k_op, k_sign, key = jax.random.split(key, 3)
        idx = jax.random.randint(k_op, (n,), 0, len(fns))
        sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (n,)),
                         1.0, -1.0)
        mag01 = (mag * sign)[:, None, None, None]
        out = x
        for k, (name, fn) in enumerate(zip(ops, fns)):
            m = mag01 if name in SIGNED else jnp.abs(mag01)
            out = jnp.where((idx == k)[:, None, None, None], fn(x, m), out)
        x = out
    return x


# ------------------------------------------------------------ AutoAugment
#
# The predecessor policy (Cubuk et al. 2018): 25 learned sub-policies of
# two (op, probability, level) steps; each image draws one sub-policy
# and applies its steps with their probabilities.  Same branch-free
# realization as RandAugment: per step, a where-fold over the DISTINCT
# ops that column uses (with per-image magnitudes — every POOL op
# already takes a [N,1,1,1] magnitude).  Level semantics: level/10 maps
# onto the same op ranges the RA pool uses at |mag01|=1 (these coincide
# with the AutoAugment ranges: 0.3 shear, 30deg rotation, 0.1-1.9
# enhancement factors, 4-8 posterize bits); signed ops mirror randomly,
# following the reference implementations.

# the published ImageNet policy (torchvision layout); levels None ->
# magnitude-free ops
AUTOAUGMENT_IMAGENET = (
    (("posterize", 0.4, 8), ("rotate", 0.6, 9)),
    (("solarize", 0.6, 5), ("autocontrast", 0.6, None)),
    (("equalize", 0.8, None), ("equalize", 0.6, None)),
    (("posterize", 0.6, 7), ("posterize", 0.6, 6)),
    (("equalize", 0.4, None), ("solarize", 0.2, 4)),
    (("equalize", 0.4, None), ("rotate", 0.8, 8)),
    (("solarize", 0.6, 3), ("equalize", 0.6, None)),
    (("posterize", 0.8, 5), ("equalize", 1.0, None)),
    (("rotate", 0.2, 3), ("solarize", 0.6, 8)),
    (("equalize", 0.6, None), ("posterize", 0.4, 6)),
    (("rotate", 0.8, 8), ("color", 0.4, 0)),
    (("rotate", 0.4, 9), ("equalize", 0.6, None)),
    (("equalize", 0.0, None), ("equalize", 0.8, None)),
    (("invert", 0.6, None), ("equalize", 1.0, None)),
    (("color", 0.6, 4), ("contrast", 1.0, 8)),
    (("rotate", 0.8, 8), ("color", 1.0, 2)),
    (("color", 0.8, 8), ("solarize", 0.8, 7)),
    (("sharpness", 0.4, 7), ("invert", 0.6, None)),
    (("shear_x", 0.6, 5), ("equalize", 1.0, None)),
    (("color", 0.4, 0), ("equalize", 0.6, None)),
    (("equalize", 0.4, None), ("solarize", 0.2, 4)),
    (("solarize", 0.6, 5), ("autocontrast", 0.6, None)),
    (("invert", 0.6, None), ("equalize", 1.0, None)),
    (("color", 0.6, 4), ("contrast", 1.0, 8)),
    (("equalize", 0.8, None), ("equalize", 0.6, None)),
)

_AA_POLICIES = {"imagenet": AUTOAUGMENT_IMAGENET}


def auto_augment(key: jax.Array, x: jax.Array, *,
                 policy="imagenet") -> jax.Array:
    """AutoAugment: each image draws one sub-policy and applies its two
    (op, prob, level) steps.  ``policy``: a registered name or a custom
    table of ``((op, p, level), (op, p, level))`` rows (ops from POOL;
    level 0-9 or None).  x: [N,H,W,C] float in [0,1]."""
    if isinstance(policy, str):
        if policy not in _AA_POLICIES:
            raise ValueError(
                f"unknown AutoAugment policy {policy!r}; registered: "
                f"{sorted(_AA_POLICIES)} (or pass a custom sub-policy "
                "table)")
        table = _AA_POLICIES[policy]
    else:
        table = policy
    n = x.shape[0]
    k_sp, key = jax.random.split(key)
    sp = jax.random.randint(k_sp, (n,), 0, len(table))

    for col in (0, 1):
        steps = [row[col] for row in table]
        names = sorted({name for name, _, _ in steps})
        index_of = {name: i for i, name in enumerate(names)}
        op_ids = jnp.asarray([index_of[name] for name, _, _ in steps])
        probs = jnp.asarray([p for _, p, _ in steps], jnp.float32)
        mags = jnp.asarray([0.0 if lv is None else lv / 10.0
                            for _, _, lv in steps], jnp.float32)

        k_apply, k_sign, key = jax.random.split(key, 3)
        idx = op_ids[sp]                       # [N] op per image
        run = jax.random.bernoulli(k_apply, probs[sp])
        sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, (n,)),
                         1.0, -1.0)
        mag01 = (mags[sp] * sign)[:, None, None, None]
        out = x
        for k, name in enumerate(names):
            m = mag01 if name in SIGNED else jnp.abs(mag01)
            sel = ((idx == k) & run)[:, None, None, None]
            out = jnp.where(sel, POOL[name](x, m), out)
        x = out
    return x
