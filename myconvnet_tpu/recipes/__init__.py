"""Recipe package: config loading + per-task-family build wiring.

The reference centralizes hyperparameters in parameters.py and wires
config -> DataSet -> model -> Evaluator -> driver in its entry scripts
(SURVEY.md §2#9/#10).  Here each task family's wiring lives in its own
module and every public name re-exports from the package root, so
``from myconvnet_tpu import recipes`` keeps the original flat surface.

``TASKS`` is the family registry: task name -> how train.py drives it
(ConvNet-API families share the Trainer; step-loop families expose a
fused state+step pair driven by train.py's generic loop).
"""

from myconvnet_tpu.recipes.common import (apply_overrides,
                                          apply_pretrained,
                                          build_evaluator, load_config,
                                          make_augment, make_optimizer,
                                          make_sources)
from myconvnet_tpu.recipes.detection import (build_detector,
                                             evaluate_detection,
                                             make_detection_sources,
                                             make_detector_inference,
                                             make_instance_sources,
                                             make_keypoint_sources,
                                             resolve_num_keypoints)
from myconvnet_tpu.recipes.diffusion import (build_diffusion,
                                             make_diffusion_sampler)
from myconvnet_tpu.recipes.gan_style import (build_gan, build_style,
                                             gan_generator,
                                             make_gan_sampler,
                                             make_stylizer,
                                             make_stylizer_fn,
                                             procedural_style_image)
from myconvnet_tpu.recipes.perception import (build_audio, build_depth,
                                              build_flow, build_ocr,
                                              build_tracking)
from myconvnet_tpu.recipes.registry import TASKS, convnet_builder
from myconvnet_tpu.recipes.representation import (build_distill,
                                                  build_semisup,
                                                  build_ssl)
from myconvnet_tpu.recipes.vision import (build_classifier, build_metric,
                                          build_segmenter, build_sr,
                                          build_video)

__all__ = [
    "apply_overrides", "apply_pretrained", "build_evaluator",
    "load_config", "make_augment", "make_optimizer", "make_sources",
    "build_detector", "evaluate_detection", "make_detection_sources",
    "make_detector_inference", "make_instance_sources",
    "make_keypoint_sources", "resolve_num_keypoints",
    "build_diffusion", "make_diffusion_sampler",
    "build_gan", "build_style", "gan_generator", "make_gan_sampler",
    "make_stylizer",
    "make_stylizer_fn", "procedural_style_image",
    "build_audio", "build_depth", "build_flow", "build_ocr",
    "build_tracking",
    "build_distill", "build_semisup", "build_ssl",
    "build_classifier", "build_metric", "build_segmenter", "build_sr",
    "build_video", "TASKS", "convnet_builder",
]
