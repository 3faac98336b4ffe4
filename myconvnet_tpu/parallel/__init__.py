from myconvnet_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS,
                                         batch_sharding, local_batch_size,
                                         make_mesh, param_sharding,
                                         replicated, shard_batch)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "batch_sharding", "local_batch_size",
           "make_mesh", "param_sharding", "replicated", "shard_batch"]
