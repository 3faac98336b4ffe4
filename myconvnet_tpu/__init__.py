"""myconvnet_tpu — TPU-native image training/inference framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
dooyounggo/MyConvNet (TF-1.x single-node vision framework): ConvNet-style
build/train/predict API, on-device augmentation pipeline, classification /
segmentation / GAN model families, data-parallel scaling over a TPU mesh.
See SURVEY.md at the repo root for the reference analysis.
"""

__version__ = "0.1.0"

# Lazy top-level API (PEP 562): `from myconvnet_tpu import ConvNet,
# DataSet, ...` without paying every submodule's import cost up front.
_LAZY = {
    "ConvNet": ("myconvnet_tpu.models.base", "ConvNet"),
    "DataSet": ("myconvnet_tpu.data.pipeline", "DataSet"),
    "ArraySource": ("myconvnet_tpu.data.pipeline", "ArraySource"),
    "FileSource": ("myconvnet_tpu.data.pipeline", "FileSource"),
    "AugmentConfig": ("myconvnet_tpu.data.augment", "AugmentConfig"),
    "MixConfig": ("myconvnet_tpu.data.mix", "MixConfig"),
    "transform": ("myconvnet_tpu.core", "transform"),
    "models": ("myconvnet_tpu.models", None),
    "optim": ("myconvnet_tpu.train.optim", None),
    "serving": ("myconvnet_tpu.serving", None),
    "recipes": ("myconvnet_tpu.recipes", None),
}


def __getattr__(name):
    import importlib
    try:
        module_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute "
                             f"{name!r}") from None
    module = importlib.import_module(module_name)
    value = module if attr is None else getattr(module, attr)
    globals()[name] = value
    return value


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
