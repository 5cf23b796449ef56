"""Device mesh construction and sharding policies."""

from tfcgan_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_sharding,
    place_state,
    replicated_sharding,
    shard_batch,
    shard_params,
    replicate,
)
from tfcgan_tpu.parallel.distributed import initialize, local_batch_slice
from tfcgan_tpu.parallel.pipeline import (
    make_pipe_mesh,
    pipeline_apply,
    resnet_trunk_pipeline,
    stack_stages,
)
