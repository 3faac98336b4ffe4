from myconvnet_tpu.subsets import cifar10, imagenet, pairs, voc

__all__ = ["cifar10", "imagenet", "pairs", "voc"]
