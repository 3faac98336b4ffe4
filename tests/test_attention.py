"""Flash-attention Pallas kernel vs einsum reference.

On the CPU test fleet (conftest forces platform=cpu) the kernel runs in
interpret mode with exact f32 math, so tolerances are tight.  On a real
chip both paths ride the MXU's default bf16 pass and agree to ~3e-3 —
that check lives in the chip bench, not here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu.ops.attention import (attention_reference,
                                         multi_head_attention)
from myconvnet_tpu.ops.pallas.flash_attention import flash_attention


def _rand_qkv(b, h, l, d, seed=0, dtype=jnp.float32):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (b, h, l, d), dtype),
            jax.random.normal(kk, (b, h, l, d), dtype),
            jax.random.normal(kv, (b, h, l, d), dtype))


@pytest.mark.parametrize("b,h,l,d", [(2, 3, 64, 32),
                                     (1, 2, 100, 16),   # L % block_q != 0
                                     (2, 4, 197, 64)])  # ViT-B/16 @224
def test_flash_matches_reference_forward(b, h, l, d):
    q, k, v = _rand_qkv(b, h, l, d, seed=l)
    ref = attention_reference(q, k, v)
    out = flash_attention(q, k, v, block_q=32, interpret=True)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_flash_matches_reference_gradients():
    b, h, l, d = 2, 2, 96, 32
    q, k, v = _rand_qkv(b, h, l, d, seed=7)
    g = jax.random.normal(jax.random.PRNGKey(9), (b, h, l, d))

    def loss_ref(q, k, v):
        return jnp.vdot(attention_reference(q, k, v), g)

    def loss_flash(q, k, v):
        return jnp.vdot(flash_attention(q, k, v, block_q=32,
                                        interpret=True), g)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gr, gf):
        np.testing.assert_allclose(a, b_, rtol=5e-5, atol=5e-5)


def test_flash_gradients_nondivisible_length():
    # Padded tail blocks must not leak into dK/dV of real positions.
    b, h, l, d = 1, 2, 70, 16
    q, k, v = _rand_qkv(b, h, l, d, seed=11)
    g = jnp.ones((b, h, l, d))
    gr = jax.grad(lambda q, k, v: jnp.vdot(
        attention_reference(q, k, v), g), argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(lambda q, k, v: jnp.vdot(
        flash_attention(q, k, v, block_q=32, interpret=True), g),
        argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gr, gf):
        np.testing.assert_allclose(a, b_, rtol=5e-5, atol=5e-5)


def test_flash_bf16_inputs():
    q, k, v = _rand_qkv(1, 2, 64, 32, seed=3, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v, block_q=32, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(out.astype(np.float32),
                               ref.astype(np.float32), rtol=2e-2, atol=2e-2)


def test_flash_custom_scale():
    q, k, v = _rand_qkv(1, 1, 64, 32, seed=5)
    out = flash_attention(q, k, v, scale=0.05, block_q=32, interpret=True)
    ref = attention_reference(q, k, v, scale=0.05)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_flash_shape_validation():
    q, k, v = _rand_qkv(1, 1, 32, 16)
    with pytest.raises(ValueError):
        flash_attention(q[0], k[0], v[0])
    with pytest.raises(ValueError):
        flash_attention(q, k[:, :, :16], v)


def test_mha_dropout_reference_path():
    q, k, v = _rand_qkv(1, 2, 48, 16, seed=13)
    rng = jax.random.PRNGKey(0)
    out = multi_head_attention(q, k, v, dropout_rate=0.5, dropout_rng=rng,
                               use_flash=False)
    assert out.shape == q.shape
    # dropout is actually dropping: output differs from the exact path
    exact = multi_head_attention(q, k, v, use_flash=False)
    assert not np.allclose(out, exact)
    with pytest.raises(ValueError):
        multi_head_attention(q, k, v, dropout_rate=0.5, dropout_rng=rng,
                             use_flash=True)
    with pytest.raises(ValueError):
        attention_reference(q, k, v, dropout_rate=0.5)


def test_mha_dispatch_default_cpu():
    # On the CPU fleet the default dispatch takes the reference path.
    q, k, v = _rand_qkv(1, 1, 32, 16, seed=17)
    out = multi_head_attention(q, k, v)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
