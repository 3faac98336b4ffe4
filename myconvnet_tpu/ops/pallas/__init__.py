from myconvnet_tpu.ops.pallas.bn_act import (bn_inference_fused,
                                             fused_scale_shift_act)
from myconvnet_tpu.ops.pallas.flash_attention import flash_attention
from myconvnet_tpu.ops.pallas.normalize_u8 import normalize_u8

__all__ = ["bn_inference_fused", "fused_scale_shift_act", "flash_attention",
           "normalize_u8"]
