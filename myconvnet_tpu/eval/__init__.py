from myconvnet_tpu.eval.evaluators import (AccuracyEvaluator,
                                           ErrorRateEvaluator, Evaluator,
                                           LossEvaluator, MeanIoUEvaluator,
                                           make_evaluator)

from myconvnet_tpu.eval.seg_inference import (multiscale_logits,
                                              sliding_window_logits)

__all__ = ["AccuracyEvaluator", "ErrorRateEvaluator", "Evaluator",
           "LossEvaluator", "MeanIoUEvaluator", "make_evaluator",
           "multiscale_logits", "sliding_window_logits"]
