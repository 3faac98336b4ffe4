from myconvnet_tpu.ckpt.checkpoint import (all_steps, best_checkpoint,
                                           checkpoint_step,
                                           latest_checkpoint,
                                           restore_checkpoint,
                                           save_checkpoint)

__all__ = ["all_steps", "best_checkpoint", "checkpoint_step",
           "latest_checkpoint", "restore_checkpoint", "save_checkpoint"]
