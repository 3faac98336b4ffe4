import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu import models
from myconvnet_tpu.core import transform


@pytest.mark.slow
def test_inception_v3_param_count_and_forward():
    """torchvision inception_v3 (aux_logits removed) = 23.83M params."""
    net = transform(lambda x, train: models.inception_v3(x, 1000,
                                                         train=train))
    x = jnp.zeros((1, 96, 96, 3))
    params, state = net.init(jax.random.key(0), x, False)
    n = sum(int(np.prod(p.shape)) for b in params.values()
            for p in b.values()) / 1e6
    assert abs(n - 23.83) < 0.15, n
    y, _ = net.apply(params, state, None, x, False)
    assert y.shape == (1, 1000)


def test_inception_registered():
    assert models.get_model("inception_v3") is models.inception_v3
