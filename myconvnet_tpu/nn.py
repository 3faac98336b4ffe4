"""Layer library: the rebuild of the reference's ConvNet layer helpers.

The reference's ``ConvNet`` base class exposes conv_layer / fc_layer /
batch_norm / pooling / activation / dropout helpers that append TF-1.x ops
to a graph (reference: convnet.py; mount empty — SURVEY.md §2#1).  Here each
helper is a small callable that requests parameters through
``core.module`` and computes with the NHWC/MXU-friendly ops in
``myconvnet_tpu.ops``.  Models are plain forward functions; see
``myconvnet_tpu/models``.

All layers respect the active precision Policy: parameters are stored in
``param_dtype`` (f32) and cast to ``compute_dtype`` (bf16 on TPU) at use.
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from myconvnet_tpu.core import initializers as init
from myconvnet_tpu.core.module import (auto_name, current_scope_in_params,
                                       get_state, next_rng_key, param,
                                       param_exists, scope, set_state,
                                       shared_scope, tag_intermediate)
from myconvnet_tpu.core.precision import current_policy
from myconvnet_tpu.ops.batch_norm import (batch_norm_inference,
                                          batch_norm_train)
from myconvnet_tpu.core.quantize import (activation_absmax, calibrating,
                                          fake_quant, int8_active,
                                          observe_activation, qat_active)
from myconvnet_tpu.ops.conv import (conv2d, conv2d_transpose,
                                    depthwise_conv2d)
from myconvnet_tpu.ops.quantized import qconv2d, qdense
from myconvnet_tpu.ops.pool import (adaptive_avg_pool2d, avg_pool2d,
                                    global_avg_pool, max_pool2d)

_IntOrPair = Union[int, Sequence[int]]


def scope_named(name: str) -> scope:
    """Open a (auto-numbered) parameter scope, e.g. per-stage/per-block."""
    return scope(auto_name(name))


def scope_shared(name: str) -> shared_scope:
    """Open a WEIGHT-SHARED scope: repeat visits reuse the same params
    (core.module.shared_scope) — e.g. one detection head applied to
    every FPN level."""
    return shared_scope(name)


# ---------------------------------------------------------------- conv / fc

def conv(x: jax.Array, features: int, kernel_size: _IntOrPair, *,
         stride: _IntOrPair = 1, padding: str = "SAME",
         dilation: _IntOrPair = 1, groups: int = 1, use_bias: bool = True,
         weight_standardization: bool = False,
         spectral_norm: bool = False,
         w_init=None, b_init=None, name: str = "conv") -> jax.Array:
    """Conv layer (reference conv_layer equivalent). NHWC in/out.

    ``weight_standardization`` (Qiao et al.; the BiT/GroupNorm companion
    for batch-independent training): standardize each output channel's
    filter to zero mean / unit variance at use time.  Pure elementwise
    work on the (tiny) weight tensor — XLA folds it into the conv's
    weight load, costing nothing per step.
    """
    pol = current_policy()
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) \
        else tuple(kernel_size)
    cin = x.shape[-1]
    with scope(auto_name(name)):
        w = param("w", (kh, kw, cin // groups, features), pol.param_dtype,
                  w_init or init.he_normal())
        if weight_standardization:
            wf = w.astype(jnp.float32)
            mean = jnp.mean(wf, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(wf, axis=(0, 1, 2), keepdims=True)
            w = ((wf - mean) * jax.lax.rsqrt(var + 1e-10)).astype(w.dtype)
        if spectral_norm:
            w = _spectral_normalize(w)
        if calibrating():
            observe_activation(x)
        if qat_active() and not int8_active():
            # fake-quantize weights (per-out-channel) and activations
            # (per-tensor) with straight-through gradients
            w = fake_quant(w, axis=-1)
            x = fake_quant(x)
        if int8_active():
            y = qconv2d(x, w, stride=stride, padding=padding,
                        dilation=dilation, groups=groups,
                        x_absmax=activation_absmax())
        else:
            y = conv2d(pol.cast_to_compute(x), pol.cast_to_compute(w),
                       stride=stride, padding=padding, dilation=dilation,
                       groups=groups, precision=pol.lax_precision)
        # pick up a bias injected by BN folding even when the model was
        # written with use_bias=False (models/folding.py)
        if use_bias or param_exists("b"):
            b = param("b", (features,), pol.param_dtype,
                      b_init or init.zeros)
            y = y + pol.cast_to_compute(b)
    # named so selective rematerialization policies can pin conv
    # outputs as the saved set (core.module.remat(policy="conv"):
    # keep the MXU results, recompute the elementwise BN/act tensors
    # in backward).  Identity outside a checkpoint region.
    return checkpoint_name(y, "conv_out")


def conv1d(x: jax.Array, features: int, kernel_size: int = 3, *,
           stride: int = 1, padding: str = "SAME", dilation: int = 1,
           groups: int = 1, use_bias: bool = True, w_init=None,
           b_init=None, name: str = "conv1d") -> jax.Array:
    """1-D conv layer for the audio family, NWC in/out
    (ops/audio.py).  x: [N,T,Cin]."""
    from myconvnet_tpu.ops.audio import conv1d as conv1d_op
    pol = current_policy()
    cin = x.shape[-1]
    with scope(auto_name(name)):
        w = param("w", (int(kernel_size), cin // groups, features),
                  pol.param_dtype, w_init or init.he_normal())
        y = conv1d_op(pol.cast_to_compute(x), pol.cast_to_compute(w),
                      stride=stride, padding=padding, dilation=dilation,
                      groups=groups, precision=pol.lax_precision)
        if use_bias or param_exists("b"):
            b = param("b", (features,), pol.param_dtype,
                      b_init or init.zeros)
            y = y + pol.cast_to_compute(b)
    return checkpoint_name(y, "conv_out")


def conv3d(x: jax.Array, features: int, kernel_size=3, *,
           stride=1, padding: str = "SAME", dilation=1,
           use_bias: bool = True, w_init=None, b_init=None,
           name: str = "conv3d") -> jax.Array:
    """3-D conv layer for the video family, NDHWC in/out
    (ops/conv3d.py).  x: [N,D,H,W,Cin]."""
    from myconvnet_tpu.ops.conv3d import conv3d as conv3d_op
    pol = current_policy()
    kd, kh, kw = (kernel_size,) * 3 if isinstance(kernel_size, int) \
        else tuple(kernel_size)
    cin = x.shape[-1]
    with scope(auto_name(name)):
        w = param("w", (kd, kh, kw, cin, features), pol.param_dtype,
                  w_init or init.he_normal())
        y = conv3d_op(pol.cast_to_compute(x), pol.cast_to_compute(w),
                      stride=stride, padding=padding, dilation=dilation,
                      precision=pol.lax_precision)
        if use_bias or param_exists("b"):
            b = param("b", (features,), pol.param_dtype,
                      b_init or init.zeros)
            y = y + pol.cast_to_compute(b)
    return checkpoint_name(y, "conv_out")


def conv_transpose(x: jax.Array, features: int, kernel_size: _IntOrPair, *,
                   stride: _IntOrPair = 2, padding: str = "SAME",
                   use_bias: bool = True, w_init=None,
                   name: str = "conv_transpose") -> jax.Array:
    pol = current_policy()
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) \
        else tuple(kernel_size)
    cin = x.shape[-1]
    with scope(auto_name(name)):
        w = param("w", (kh, kw, cin, features), pol.param_dtype,
                  w_init or init.normal(0.02))
        y = conv2d_transpose(pol.cast_to_compute(x), pol.cast_to_compute(w),
                             stride=stride, padding=padding,
                             precision=pol.lax_precision)
        if use_bias:
            b = param("b", (features,), pol.param_dtype, init.zeros)
            y = y + pol.cast_to_compute(b)
    return y


def depthwise_conv(x: jax.Array, kernel_size: _IntOrPair = 3, *,
                   stride: _IntOrPair = 1, padding: str = "SAME",
                   dilation: _IntOrPair = 1, multiplier: int = 1,
                   use_bias: bool = False, w_init=None,
                   name: str = "depthwise_conv") -> jax.Array:
    pol = current_policy()
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) \
        else tuple(kernel_size)
    c = x.shape[-1]
    with scope(auto_name(name)):
        w = param("w", (kh, kw, c, multiplier), pol.param_dtype,
                  w_init or init.he_normal())
        y = depthwise_conv2d(pol.cast_to_compute(x), pol.cast_to_compute(w),
                             stride=stride, padding=padding,
                             dilation=dilation, precision=pol.lax_precision)
        if use_bias:
            b = param("b", (c * multiplier,), pol.param_dtype, init.zeros)
            y = y + pol.cast_to_compute(b)
    return y


def dense(x: jax.Array, features: int, *, use_bias: bool = True,
          spectral_norm: bool = False,
          w_init=None, name: str = "dense") -> jax.Array:
    """Fully-connected layer (reference fc_layer equivalent)."""
    pol = current_policy()
    cin = x.shape[-1]
    with scope(auto_name(name)):
        w = param("w", (cin, features), pol.param_dtype,
                  w_init or init.glorot_uniform())
        if spectral_norm:
            w = _spectral_normalize(w)
        if calibrating():
            observe_activation(x)
        if qat_active() and not int8_active():
            w = fake_quant(w, axis=-1)
            x = fake_quant(x)
        if int8_active():
            y = qdense(x, w, x_absmax=activation_absmax())
        else:
            # no preferred_element_type: breaks dot/conv transpose rules
            # under bf16; TPU accumulates bf16 matmuls in f32 regardless
            y = jnp.dot(pol.cast_to_compute(x), pol.cast_to_compute(w),
                        precision=pol.lax_precision)
        if use_bias:
            b = param("b", (features,), pol.param_dtype, init.zeros)
            y = y + pol.cast_to_compute(b)
    return y


def _spectral_normalize(w: jax.Array) -> jax.Array:
    """Divide ``w`` by its leading singular value, estimated with one
    persistent power iteration per apply (SNGAN, Miyato et al.).  The
    iteration vector rides in layer state under "sn_u"; u/v are treated
    as constants for the gradient (standard practice), so backward cost
    is one elementwise divide."""
    out = w.shape[-1]
    w_mat = w.astype(jnp.float32).reshape(-1, out)          # [in, out]
    u = get_state("sn_u", (out,), jnp.float32,
                  lambda s, d: jnp.ones(s, d) / jnp.sqrt(s[0]))

    def l2(x):
        return x * jax.lax.rsqrt(jnp.sum(jnp.square(x)) + 1e-12)

    v = l2(w_mat @ u)
    u_new = l2(w_mat.T @ v)
    set_state("sn_u", jax.lax.stop_gradient(u_new))
    sigma = jnp.einsum("i,io,o->", jax.lax.stop_gradient(v), w_mat,
                       jax.lax.stop_gradient(u_new))
    return (w_mat / jnp.maximum(sigma, 1e-12)).reshape(w.shape) \
        .astype(w.dtype)


# ------------------------------------------------------------ normalization

def batch_norm(x: jax.Array, *, train: bool, momentum: float = 0.99,
               eps: float = 1e-3, scale: bool = True, offset: bool = True,
               gamma_init=None, name: str = "bn") -> jax.Array:
    """Fused BN layer with moving-statistics state (TF-semantics EMA)."""
    pol = current_policy()
    c = x.shape[-1]
    with scope(auto_name(name)):
        if not train and not current_scope_in_params():
            # BN folded into the preceding conv (models/folding.py):
            # the scope was deliberately removed -> identity
            return x
        gamma = param("gamma", (c,), jnp.float32,
                      gamma_init or init.ones) if scale else jnp.ones(
                          c, jnp.float32)
        beta = param("beta", (c,), jnp.float32,
                     init.zeros) if offset else jnp.zeros(c, jnp.float32)
        mov_mean = get_state("moving_mean", (c,), jnp.float32,
                             lambda s, d: jnp.zeros(s, d))
        mov_var = get_state("moving_var", (c,), jnp.float32,
                            lambda s, d: jnp.ones(s, d))
        if train:
            y, mean, var = batch_norm_train(x, gamma, beta, eps)
            set_state("moving_mean",
                      momentum * mov_mean + (1.0 - momentum) * mean)
            set_state("moving_var",
                      momentum * mov_var + (1.0 - momentum) * var)
        else:
            y = batch_norm_inference(x, gamma, beta, mov_mean, mov_var, eps)
    return y.astype(pol.compute_dtype)


def layer_norm(x: jax.Array, *, eps: float = 1e-6,
               name: str = "ln") -> jax.Array:
    pol = current_policy()
    c = x.shape[-1]
    with scope(auto_name(name)):
        gamma = param("gamma", (c,), jnp.float32, init.ones)
        beta = param("beta", (c,), jnp.float32, init.zeros)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    return y.astype(pol.compute_dtype)


def instance_norm(x: jax.Array, *, eps: float = 1e-5,
                  name: str = "in") -> jax.Array:
    """Instance norm (pix2pix-style generators)."""
    pol = current_policy()
    c = x.shape[-1]
    with scope(auto_name(name)):
        gamma = param("gamma", (c,), jnp.float32, init.ones)
        beta = param("beta", (c,), jnp.float32, init.zeros)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    return y.astype(pol.compute_dtype)


def group_norm(x: jax.Array, *, groups: int = 32, eps: float = 1e-5,
               gamma_init=None, name: str = "gn") -> jax.Array:
    """Group norm (Wu & He) — batch-independent normalization for the
    small-per-device-batch regimes (spatial partitioning, pipeline
    microbatches) where BN statistics starve.  groups=1 -> layer-norm
    over (H,W,C); groups=C -> instance norm."""
    pol = current_policy()
    c = x.shape[-1]
    if c % groups != 0:
        raise ValueError(f"channels {c} not divisible by groups {groups}")
    with scope(auto_name(name)):
        gamma = param("gamma", (c,), jnp.float32, gamma_init or init.ones)
        beta = param("beta", (c,), jnp.float32, init.zeros)
        xf = x.astype(jnp.float32)
        n, h, w, _ = xf.shape
        xg = xf.reshape(n, h, w, groups, c // groups)
        mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4),
                       keepdims=True)
        y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(n, h, w, c)
        y = y * gamma + beta
    return y.astype(pol.compute_dtype)


# ----------------------------------------------------------------- dropout

def dropout(x: jax.Array, rate: float, *, train: bool) -> jax.Array:
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(next_rng_key(), keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# -------------------------------------------------------------- activations

def relu(x):
    return jax.nn.relu(x)


def relu6(x):
    return jnp.minimum(jax.nn.relu(x), 6.0)


def leaky_relu(x, alpha: float = 0.2):
    return jax.nn.leaky_relu(x, alpha)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def swish(x):
    return jax.nn.silu(x)


def gelu(x):
    return jax.nn.gelu(x)


ACTIVATIONS: dict[str, Callable] = {
    "relu": relu, "relu6": relu6, "lrelu": leaky_relu,
    "leaky_relu": leaky_relu, "sigmoid": sigmoid, "tanh": tanh,
    "swish": swish, "silu": swish, "gelu": gelu,
    "linear": lambda x: x, "none": lambda x: x,
}


def activation(x, kind: str):
    return ACTIVATIONS[kind](x)


def pixel_shuffle(x: jax.Array, scale: int) -> jax.Array:
    """Depth-to-space (PixelShuffle): [N, H, W, C*r²] -> [N, H*r, W*r, C].

    The super-resolution upsampler (Shi et al., ESPCN): a conv produces
    r² sub-pixel channels and this pure reshape+transpose interleaves
    them — no gather, no transposed conv, and the preceding conv is a
    dense MXU matmul at the LOW resolution (r² cheaper than computing
    at the output resolution)."""
    n, h, w, c = x.shape
    r = int(scale)
    if c % (r * r):
        raise ValueError(f"channels {c} not divisible by scale² {r * r}")
    out_c = c // (r * r)
    x = x.reshape(n, h, w, r, r, out_c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * r, w * r, out_c)


def conv_bn_relu(x: jax.Array, features: int, kernel_size: _IntOrPair,
                 *, train: bool, stride: _IntOrPair = 1,
                 dilation: _IntOrPair = 1, momentum: float = 0.9,
                 eps: float = 1e-5, name: str = "cbr") -> jax.Array:
    """conv(use_bias=False) -> BN -> ReLU — the segmentation heads'
    shared building block (scope layout: <name>/conv, <name>/bn)."""
    with scope_named(name):
        x = conv(x, features, kernel_size, stride=stride,
                 dilation=dilation, use_bias=False, name="conv")
        x = batch_norm(x, train=train, momentum=momentum, eps=eps,
                       name="bn")
    return relu(x)


def drop_path(x: jax.Array, rate: float, *, train: bool) -> jax.Array:
    """Stochastic depth (Huang et al.): drop the WHOLE residual branch
    per sample with probability ``rate`` (scaled at train time so eval
    is identity).  The standard deep-network regularizer that dropout
    does not replace — one bernoulli per example, broadcast over the
    feature map."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(next_rng_key(), keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ----------------------------------------------------------------- pooling

max_pool = max_pool2d
avg_pool = avg_pool2d
adaptive_avg_pool = adaptive_avg_pool2d
gap = global_avg_pool
