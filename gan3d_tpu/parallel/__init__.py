"""SPMD parallelism over a device mesh.

The reference's only parallelism is single-process ``nn.DataParallel``
(reference: trainer.py:70-72). Here parallelism is a property of the program,
not the module tree: we build a 1-D ``data`` mesh, shard the batch over it,
replicate parameters, and let XLA's SPMD partitioner insert the gradient
all-reduce (psum over ICI) when it differentiates the jitted train step.
Multi-host over DCN runs the same program after `jax.distributed.initialize`.
"""

from gan3d_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicated_sharding,
)

__all__ = ["DATA_AXIS", "make_mesh", "batch_sharding", "replicated_sharding"]
