"""Config loading + recipe builders for the five BASELINE recipes."""

import os

import numpy as np
import pytest

from myconvnet_tpu import recipes

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    "configs/cifar10_smallnet.py",
    "configs/imagenet_resnet50.py",
    "configs/imagenet_vgg16.py",
    "configs/imagenet_densenet121.py",
    "configs/voc_deeplabv3plus.py",
    "configs/imagenet_efficientnet_b0.py",
    "configs/imagenet_mobilenet_v2.py",
    "configs/imagenet_mobilenet_v3.py",
    "configs/imagenet_resnext50.py",
    "configs/cifar100_resnet18.py",
    "configs/cifar10_wrn28_10.py",
    "configs/imagenet_resnet50_lars.py",
    "configs/dcgan_cifar10.py",
    "configs/pix2pix.py",
    "configs/voc_unet.py",
    "configs/voc_pspnet.py",
    "configs/cyclegan.py",
    "configs/fashion_mnist_smallnet.py",
    "configs/svhn_smallnet.py",
    "configs/sngan_cifar10.py",
    "configs/imagenet_vit_b16.py",
]


@pytest.mark.parametrize("path", CONFIGS)
def test_configs_load(path):
    cfg = recipes.load_config(path)
    assert cfg["task"] in ("classification", "segmentation", "gan")
    assert cfg["batch_size"] > 0 and cfg["total_steps"] > 0


def test_load_config_overrides():
    cfg = recipes.load_config("configs/cifar10_smallnet.py",
                              total_steps=5, batch_size=4)
    assert cfg["total_steps"] == 5 and cfg["batch_size"] == 4
    # None overrides are ignored
    cfg2 = recipes.load_config("configs/cifar10_smallnet.py",
                               total_steps=None)
    assert cfg2["total_steps"] == 20000


def test_make_optimizer_from_config():
    cfg = recipes.load_config("configs/imagenet_resnet50.py")
    opt = recipes.make_optimizer(cfg["optimizer"])
    params = {"a": {"w": np.ones(3, np.float32)}}
    state = opt.init(params)
    assert state is not None


def test_build_classifier_synthetic():
    cfg = recipes.load_config("configs/cifar10_smallnet.py", total_steps=2,
                              batch_size=4)
    net, train_set, val_set = recipes.build_classifier(cfg, synthetic=True)
    assert len(train_set) > 0 and len(val_set) > 0
    x, y = train_set.source.get_batch(np.arange(4))
    assert x.shape == (4, 32, 32, 3)


def test_build_gan_dcgan():
    cfg = recipes.load_config("configs/dcgan_cifar10.py", batch_size=4,
                              total_steps=1)
    cfg["generator_kwargs"] = dict(base_features=32)
    cfg["discriminator_kwargs"] = dict(base_features=16)
    cfg["latent_dim"] = 16
    state, step, data_iter_fn, kind = recipes.build_gan(cfg,
                                                        synthetic=True)
    assert kind == "dcgan"
    batch = next(data_iter_fn())
    assert batch.shape == (4, 32, 32, 3)
    assert float(batch.min()) >= -1.0 and float(batch.max()) <= 1.0
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["d_loss"]))


def test_unknown_dataset_raises():
    cfg = recipes.load_config("configs/cifar10_smallnet.py")
    cfg["dataset"] = "stl10"
    with pytest.raises(ValueError, match="unknown dataset"):
        recipes.make_sources(cfg, synthetic=True)


def test_resnext_mix_recipe_trains_synthetic():
    """The mix/erase config keys reach the jitted step (tiny shapes)."""
    cfg = recipes.load_config("configs/imagenet_resnext50.py",
                              total_steps=2, batch_size=4)
    cfg["model"] = "smallnet"          # keep the CPU smoke cheap
    cfg["model_kwargs"] = dict(width=4, dropout_rate=0.0)
    cfg["input_hw"] = (16, 16)
    cfg["num_classes"] = 5
    cfg["dataset"] = "cifar10"
    cfg["augment"]["out_hw"] = (16, 16)
    cfg["precision"] = "f32"
    net, train_set, _ = recipes.build_classifier(cfg, synthetic=True)
    assert net.mix is not None and net.erase_prob == 0.25
    opt = recipes.make_optimizer(cfg["optimizer"])
    state = net.train(train_set, batch_size=4, total_steps=2,
                      optimizer=opt)
    assert int(state.step) == 2


def test_lars_recipe_optimizer_builds():
    cfg = recipes.load_config("configs/imagenet_resnet50_lars.py")
    opt = recipes.make_optimizer(cfg["optimizer"])
    params = {"a": {"w": np.ones((3, 3, 4, 8), np.float32)}}
    assert opt.init(params) is not None


def test_cifar100_synthetic_source():
    from myconvnet_tpu.subsets import cifar100
    src = cifar100.make_source(None, "train", synthetic=True,
                               synthetic_n=64)
    x, y = src.get_batch(np.arange(16))
    assert x.shape == (16, 32, 32, 3) and x.dtype == np.uint8
    assert y.min() >= 0 and y.max() < 100
    coarse = cifar100.make_source(None, "val", synthetic=True,
                                  synthetic_n=64, coarse=True)
    _, yc = coarse.get_batch(np.arange(16))
    assert yc.max() < 20


def test_cifar100_recipe_builds_and_trains():
    cfg = recipes.load_config("configs/cifar100_resnet18.py",
                              total_steps=2, batch_size=8)
    cfg["model"] = "smallnet"
    cfg["model_kwargs"] = dict(width=4, dropout_rate=0.0)
    cfg["input_hw"] = (16, 16)
    cfg["augment"]["out_hw"] = (16, 16)
    cfg["precision"] = "f32"
    net, train_set, val_set = recipes.build_classifier(cfg, synthetic=True)
    opt = recipes.make_optimizer(cfg["optimizer"])
    state = net.train(train_set, batch_size=8, total_steps=2,
                      optimizer=opt)
    assert int(state.step) == 2


def test_fashion_mnist_source_and_class_names():
    cfg = recipes.load_config("configs/fashion_mnist_smallnet.py",
                              total_steps=2, batch_size=8)
    train_src, val_src = recipes.make_sources(cfg, synthetic=True)
    x, y = train_src.get_batch(np.arange(8))
    assert x.shape == (8, 28, 28, 3)
    # the recipe layer attaches garment names from the dataset key
    assert train_src.class_names[0] == "t-shirt/top"
    assert len(val_src.class_names) == 10


def test_load_config_json_roundtrip(tmp_path):
    """A persisted config.json reloads as a runnable recipe."""
    import json

    cfg = recipes.load_config("configs/cifar10_smallnet.py",
                              total_steps=7)
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg, default=str))
    cfg2 = recipes.load_config(str(p), batch_size=4)
    assert cfg2["total_steps"] == 7 and cfg2["batch_size"] == 4
    assert cfg2["model"] == cfg["model"]


def test_svhn_mat_roundtrip_and_synthetic(tmp_path):
    savemat = pytest.importorskip("scipy.io").savemat

    from myconvnet_tpu.subsets import svhn

    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 256, (32, 32, 3, 6), np.uint8)
    labels = np.asarray([[1], [2], [10], [10], [5], [9]], np.uint8)
    savemat(str(tmp_path / "train_32x32.mat"), {"X": imgs, "y": labels})
    x, y = svhn.read_subset(str(tmp_path), "train")
    assert x.shape == (6, 32, 32, 3)
    np.testing.assert_array_equal(x[0], imgs[..., 0])
    np.testing.assert_array_equal(y, [1, 2, 0, 0, 5, 9])  # 10 -> 0
    src = svhn.make_source(None, "train", synthetic=True, synthetic_n=32)
    xb, yb = src.get_batch(np.arange(8))
    assert xb.shape == (8, 32, 32, 3) and xb.dtype == np.uint8
    # recipe wiring
    cfg = recipes.load_config("configs/cifar10_smallnet.py")
    cfg["dataset"] = "svhn"
    tr, va = recipes.make_sources(cfg, synthetic=True)
    assert len(tr) > 0 and len(va) > 0


def test_cls_loss_focal_knob():
    cfg = recipes.load_config("configs/cifar10_smallnet.py",
                              total_steps=2, batch_size=8)
    cfg["model_kwargs"] = dict(width=4, dropout_rate=0.0)
    cfg["cls_loss"] = "focal"
    net, train_set, _ = recipes.build_classifier(cfg, synthetic=True)
    state = net.train(train_set, batch_size=8, total_steps=2)
    assert int(state.step) == 2
    cfg["cls_loss"] = "poly"
    with pytest.raises(ValueError, match="unknown cls_loss"):
        recipes.build_classifier(cfg, synthetic=True)


def test_apply_overrides_literals_strings_and_dotted_keys():
    cfg = dict(total_steps=10, optimizer=dict(name="adam", wd=0.1),
               model_kwargs=dict(width=4))
    out = recipes.apply_overrides(cfg, [
        "total_steps=25",                       # int literal
        "model=srresnet",                       # raw-string fallback
        "model_kwargs={'width': 64, 'blocks': 16}",  # dict literal
        "optimizer.name=sgd",                   # dotted descent
        "optimizer.lr.kind=cosine",             # creates nested dicts
        "use_ema=True",                         # bool literal
    ])
    assert out is cfg
    assert cfg["total_steps"] == 25 and cfg["model"] == "srresnet"
    assert cfg["model_kwargs"] == {"width": 64, "blocks": 16}
    assert cfg["optimizer"]["name"] == "sgd"
    assert cfg["optimizer"]["wd"] == 0.1        # siblings untouched
    assert cfg["optimizer"]["lr"] == {"kind": "cosine"}
    assert cfg["use_ema"] is True
    assert recipes.apply_overrides(cfg, None) is cfg
    with pytest.raises(ValueError, match="KEY=VALUE"):
        recipes.apply_overrides(cfg, ["oops"])


def test_every_shipped_config_loads_and_is_registered():
    """Sweep ALL of configs/: each recipe must load, name a task the
    registry knows (train.py now fails fast on unregistered tasks),
    and build its evaluator when it rides an evaluator path."""
    import glob
    import os

    paths = sorted(glob.glob(os.path.join(REPO, "configs", "*.py")))
    assert len(paths) >= 50
    for path in paths:
        cfg = recipes.load_config(path)
        assert cfg["task"] in recipes.TASKS, (path, cfg["task"])
        assert cfg.get("batch_size", 1) > 0, path
        if recipes.TASKS[cfg["task"]] == "convnet" \
                or cfg["task"] == "detection":
            ev = recipes.build_evaluator(cfg)
            assert ev is not None, path


def test_registry_rows_resolve_builders():
    """Every convnet-kind registry row resolves to a callable builder
    and every step-loop kind has a train.py adapter."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "_train_mod", os.path.join(REPO, "train.py"))
    train_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_mod)
    for task, kind in recipes.TASKS.items():
        if kind == "convnet":
            assert callable(recipes.convnet_builder(task)), task
        else:
            assert kind in train_mod.STEPLOOP_ADAPTERS, (task, kind)
