from myconvnet_tpu.ops.attention import (attention_reference,
                                         multi_head_attention)
from myconvnet_tpu.ops.batch_norm import (batch_norm_inference,
                                          batch_norm_train)
from myconvnet_tpu.ops.boxes import (batched_nms, box_iou, decode_boxes,
                                     encode_boxes, nms, ssd_anchors)
from myconvnet_tpu.ops.conv import (conv2d, conv2d_transpose,
                                    depthwise_conv2d)
from myconvnet_tpu.ops.pool import avg_pool2d, global_avg_pool, max_pool2d
from myconvnet_tpu.ops.resize import (resize_bilinear, resize_nearest,
                                      upsample2x_nearest)

__all__ = [
    "batch_norm_inference", "batch_norm_train", "conv2d", "conv2d_transpose",
    "depthwise_conv2d", "avg_pool2d", "global_avg_pool", "max_pool2d",
    "resize_bilinear", "resize_nearest", "upsample2x_nearest",
    "box_iou", "encode_boxes", "decode_boxes", "ssd_anchors", "nms",
    "batched_nms", "attention_reference", "multi_head_attention",
]
