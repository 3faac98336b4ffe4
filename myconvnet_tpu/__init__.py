"""myconvnet_tpu — TPU-native image training/inference framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
dooyounggo/MyConvNet (TF-1.x single-node vision framework): ConvNet-style
build/train/predict API, on-device augmentation pipeline, classification /
segmentation / GAN model families, data-parallel scaling over a TPU mesh.
See SURVEY.md at the repo root for the reference analysis.
"""

__version__ = "0.1.0"
