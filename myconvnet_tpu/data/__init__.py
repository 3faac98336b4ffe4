from myconvnet_tpu.data.augment import (AugmentConfig, augment_eval,
                                        augment_train, batched_crop_resize,
                                        color_jitter, normalize)
from myconvnet_tpu.data.pipeline import (ArraySource, DataSet, FileSource,
                                         Prefetcher, batch_indices,
                                         decode_image)

__all__ = ["AugmentConfig", "augment_eval", "augment_train",
           "batched_crop_resize", "color_jitter", "normalize",
           "ArraySource", "DataSet", "FileSource", "Prefetcher",
           "batch_indices", "decode_image"]
