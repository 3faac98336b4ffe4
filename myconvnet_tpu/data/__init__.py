from myconvnet_tpu.data.augment import (AugmentConfig, augment_eval,
                                        augment_train, batched_crop_resize,
                                        color_jitter, normalize)
from myconvnet_tpu.data.mix import (MixConfig, mixup_cutmix,
                                    random_erasing)
from myconvnet_tpu.data.pipeline import (ArraySource, DataSet, FileSource,
                                         Prefetcher, batch_indices,
                                         decode_image)

__all__ = ["AugmentConfig", "augment_eval", "augment_train",
           "batched_crop_resize", "color_jitter", "normalize",
           "MixConfig", "mixup_cutmix", "random_erasing",
           "ArraySource", "DataSet", "FileSource", "Prefetcher",
           "batch_indices", "decode_image"]
