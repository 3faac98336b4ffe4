from myconvnet_tpu.eval.evaluators import (AccuracyEvaluator,
                                           ErrorRateEvaluator, Evaluator,
                                           LossEvaluator, MeanIoUEvaluator,
                                           make_evaluator)

__all__ = ["AccuracyEvaluator", "ErrorRateEvaluator", "Evaluator",
           "LossEvaluator", "MeanIoUEvaluator", "make_evaluator"]
