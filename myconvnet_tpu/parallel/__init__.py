from myconvnet_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS,
                                         batch_sharding, local_batch_size,
                                         make_mesh, param_sharding,
                                         replicated, shard_batch)
from myconvnet_tpu.parallel.spatial import (halo_conv2d, halo_exchange,
                                            spatial_batch_norm_stats)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "batch_sharding", "local_batch_size",
           "make_mesh", "param_sharding", "replicated", "shard_batch",
           "halo_conv2d", "halo_exchange", "spatial_batch_norm_stats"]
