"""Device mesh construction and sharding policies."""

from tfcgan_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
from tfcgan_tpu.parallel.distributed import initialize, local_batch_slice
