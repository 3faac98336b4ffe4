"""Pretrained-weight import: torch-style state_dict -> our param tree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myconvnet_tpu import models
from myconvnet_tpu.core import transform
from myconvnet_tpu.models.pretrained import (import_torch_resnet,
                                             load_npz_weights)


def _fake_torch_resnet18_sd(params, state):
    """Build a torch-layout state_dict with DISTINCT values from shapes of
    our resnet18 tree (reverse the mapping)."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv_to_torch(w):
        return np.transpose(w, (3, 2, 0, 1))  # HWIO -> OIHW

    def add_conv(tkey, scope):
        w = rng.randn(*params[scope]["w"].shape).astype(np.float32)
        sd[tkey] = conv_to_torch(w)

    def add_bn(tpre, scope):
        c = params[scope]["gamma"].shape[0]
        sd[f"{tpre}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{tpre}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{tpre}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{tpre}.running_var"] = rng.rand(c).astype(np.float32) + 0.1

    add_conv("conv1.weight", "stem/conv")
    add_bn("bn1", "stem/bn")
    from myconvnet_tpu.models.resnet import STAGE_BLOCKS
    for si, n in enumerate(STAGE_BLOCKS[18]):
        for b in range(n):
            tpre = f"layer{si + 1}.{b}"
            spre = f"stage{si + 1}/block{b + 1}"
            for li, letter in enumerate(("a", "b")):
                add_conv(f"{tpre}.conv{li + 1}.weight",
                         f"{spre}/conv_{letter}")
                add_bn(f"{tpre}.bn{li + 1}", f"{spre}/bn_{letter}")
            if f"{spre}/conv_proj" in params:
                add_conv(f"{tpre}.downsample.0.weight", f"{spre}/conv_proj")
                add_bn(f"{tpre}.downsample.1", f"{spre}/bn_proj")
    nc, cf = params["logits"]["w"].shape[1], params["logits"]["w"].shape[0]
    sd["fc.weight"] = rng.randn(nc, cf).astype(np.float32)
    sd["fc.bias"] = rng.randn(nc).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def r18():
    net = transform(lambda x, train=False: models.resnet(x, 10, 18,
                                                         train=train))
    params, state = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    return net, params, state


def test_import_torch_resnet18(r18):
    net, params, state = r18
    sd = _fake_torch_resnet18_sd(params, state)
    new_p, new_s = import_torch_resnet(sd, params, state, depth=18)
    # conv weights transposed correctly
    np.testing.assert_allclose(
        new_p["stem/conv"]["w"],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    # BN stats landed in state
    np.testing.assert_allclose(new_s["stem/bn"]["moving_mean"],
                               sd["bn1.running_mean"])
    # head mapped
    np.testing.assert_allclose(new_p["logits"]["w"],
                               sd["fc.weight"].T)
    # the imported net runs
    y, _ = net.apply(new_p, new_s, None, jnp.ones((1, 32, 32, 3)))
    assert np.isfinite(np.asarray(y)).all()


def test_import_shape_mismatch_raises(r18):
    net, params, state = r18
    sd = _fake_torch_resnet18_sd(params, state)
    sd["conv1.weight"] = sd["conv1.weight"][:, :, :3, :3]
    with pytest.raises(ValueError, match="stem/conv"):
        import_torch_resnet(sd, params, state, depth=18)


def test_load_npz_subset(tmp_path, r18):
    net, params, state = r18
    w = np.full_like(np.asarray(params["stem/conv"]["w"]), 0.5)
    path = str(tmp_path / "w.npz")
    np.savez(path, **{"stem/conv::w": w})
    new_p = load_npz_weights(path, params)
    np.testing.assert_allclose(new_p["stem/conv"]["w"], 0.5)
    # untouched elsewhere
    np.testing.assert_allclose(new_p["logits"]["w"], params["logits"]["w"])


def test_load_npz_shape_error(tmp_path, r18):
    net, params, state = r18
    path = str(tmp_path / "w.npz")
    np.savez(path, **{"stem/conv::w": np.zeros((1, 1, 1, 1), np.float32)})
    with pytest.raises(ValueError, match="shape"):
        load_npz_weights(path, params)


def test_torch_export_import_roundtrip():
    """export_torch_resnet o import_torch_resnet == identity (params,
    BN stats, head)."""
    import jax
    import jax.numpy as jnp

    from myconvnet_tpu import models
    from myconvnet_tpu.core import transform
    from myconvnet_tpu.models.pretrained import (export_torch_resnet,
                                                 import_torch_resnet)

    net = transform(lambda x, train=False: models.resnet18(
        x, 10, train=train))
    params, state = net.init(jax.random.key(3),
                             jnp.zeros((1, 32, 32, 3)), False)
    sd = export_torch_resnet(params, state, depth=18)
    assert "conv1.weight" in sd and "fc.weight" in sd
    assert sd["conv1.weight"].shape[1] == 3  # OIHW
    p2, s2 = import_torch_resnet(sd, params, state, depth=18)
    for scope in params:
        for name in params[scope]:
            np.testing.assert_array_equal(
                np.asarray(p2[scope][name]),
                np.asarray(params[scope][name]),
                err_msg=f"{scope}/{name}")
    for scope in state:
        for name in state[scope]:
            np.testing.assert_array_equal(
                np.asarray(s2[scope][name]),
                np.asarray(state[scope][name]),
                err_msg=f"{scope}/{name}")


def test_torch_export_loads_into_torchvision_like_shapes():
    """The exported dict matches torch's expected parameter shapes for
    the same depth (cross-check against torch's own resnet18)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("torchvision")
    import jax
    import jax.numpy as jnp
    from torchvision.models import resnet18 as tv_resnet18

    from myconvnet_tpu import models
    from myconvnet_tpu.core import transform
    from myconvnet_tpu.models.pretrained import export_torch_resnet

    net = transform(lambda x, train=False: models.resnet18(
        x, 1000, train=train))
    params, state = net.init(jax.random.key(0),
                             jnp.zeros((1, 32, 32, 3)), False)
    sd = export_torch_resnet(params, state, depth=18)
    model = tv_resnet18()
    want = model.state_dict()
    for k, v in sd.items():
        assert k in want, k
        assert tuple(want[k].shape) == tuple(v.shape), (
            k, want[k].shape, v.shape)
    # and it actually loads
    model.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
        strict=False)


@pytest.mark.slow
def test_torch_export_rejects_se_params():
    """SE gates have no torchvision slot: export must refuse rather
    than silently dropping them."""
    import jax
    import jax.numpy as jnp

    from myconvnet_tpu import models
    from myconvnet_tpu.core import transform
    from myconvnet_tpu.models.pretrained import export_torch_resnet

    net = transform(lambda x, train=False: models.se_resnet50(
        x, 10, train=train))
    params, state = net.init(jax.random.key(0),
                             jnp.zeros((1, 32, 32, 3)), False)
    with pytest.raises(ValueError, match="no torchvision"):
        export_torch_resnet(params, state, depth=50)
