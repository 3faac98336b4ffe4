from myconvnet_tpu.utils.logging import MetricLogger
from myconvnet_tpu.utils.mfu import (compiled_flops, conv_flops,
                                     device_peak_flops, mfu)

__all__ = ["MetricLogger", "compiled_flops", "conv_flops",
           "device_peak_flops", "mfu"]
