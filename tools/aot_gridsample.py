"""Chipless AOT Mosaic check for the dense grid_sample Pallas kernel.

Compiles fwd+bwd of grid_sample_dense for the v5e TPU target via
jax.experimental.topologies (no chip needed) at NeMAR-like shapes.
Validates that the _RB row-blocked kernel lowers through Mosaic.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["TFCGAN_PALLAS_INTERPRET"] = "0"
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from jax.experimental import topologies

topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2x1")
dev = topo.devices[0]
mesh = jax.sharding.Mesh([dev], ("d",))
rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())


def loss(im, gr):
    from tfcgan_tpu.ops.pallas_kernels import grid_sample_dense
    o = grid_sample_dense(im, gr, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
    return jnp.sum(o.astype(jnp.float32) ** 2)


for b, s in [(2, 256), (2, 252)]:  # aligned + ragged grid heights
    im = jax.ShapeDtypeStruct((b, s, s, 1), jnp.float32)
    gr = jax.ShapeDtypeStruct((b, s, s, 2), jnp.float32)
    c = (
        jax.jit(jax.grad(loss, argnums=(0, 1)),
                in_shardings=(rep, rep), out_shardings=rep)
        .lower(im, gr)
        .compile()
    )
    ca = c.cost_analysis()
    print(f"B={b} S={s}: compiled OK, flops={ca.get('flops', 0)/1e9:.2f} G, "
          f"bytes={ca.get('bytes accessed', 0)/2**20:.0f} MiB")
print("MOSAIC_OK")
