"""Task-family registry: one row per task the CLI can train.

Two driver shapes exist (SURVEY.md §1 training driver):

* ``convnet`` — the family builds a `ConvNet` + DataSets and the
  shared Trainer owns the loop (train.py run_supervised).
* any other value — the name of a step-loop adapter: the family
  builds a fused (state, jitted step, data iterator) and train.py's
  generic run_steploop drives it through the adapter of that name
  (train.py STEPLOOP_ADAPTERS).

train.py dispatches THROUGH this table: adding a ConvNet-API family
is one build_* function + a ``"convnet"`` row here (+ the
convnet_builder entry); a step-loop family additionally needs its
adapter registered in train.py.
"""

from __future__ import annotations


def convnet_builder(task: str):
    """The ConvNet-API builder for a task (used by run_supervised)."""
    from myconvnet_tpu import recipes
    return {
        "segmentation": recipes.build_segmenter,
        "sr": recipes.build_sr,
        "video": recipes.build_video,
        "audio": recipes.build_audio,
        "ocr": recipes.build_ocr,
        "depth": recipes.build_depth,
        "flow": recipes.build_flow,
        "tracking": recipes.build_tracking,
        "metric": recipes.build_metric,
    }.get(task, recipes.build_classifier)


# task -> driver kind; "convnet" rows ride run_supervised, others name
# the train.py step-loop runner that drives them
TASKS = {
    "classification": "convnet",
    "segmentation": "convnet",
    "sr": "convnet",
    "video": "convnet",
    "audio": "convnet",
    "ocr": "convnet",
    "depth": "convnet",
    "flow": "convnet",
    "tracking": "convnet",
    "metric": "convnet",
    "gan": "gan",
    "detection": "detection",
    "ssl": "ssl",
    "diffusion": "diffusion",
    "semisup": "semisup",
    "distill": "distill",
    "style": "style",
}
