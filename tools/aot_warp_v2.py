"""Chipless AOT Mosaic check + cost compare for the separable-warp variants.

Compiles fwd and fwd+bwd of warp_affine_separable for the v5e TPU target via
jax.experimental.topologies (no chip needed), both formulations:

- v1: original 3-transpose layout (TFCGAN_WARP_V1=1),
- v2: NHWC-native stride=C channel-interleaved pass 1 (default)

and prints each graph's flops / bytes-accessed so the layout-copy delta is
visible before burning tunnel time. Validates the stride>1 kernel (f32
floor-division lane coords, strided gathers) lowers through Mosaic.
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

from tfcgan_tpu.ops.pallas_kernels.resample import (  # noqa: E402
    _warp_separable_v1, _warp_separable_v2)

B, S = 32, 256


def report(tag, fn):
    im = jax.ShapeDtypeStruct((B, S, S, 3), jnp.float32)
    th = jax.ShapeDtypeStruct((B, 2, 3), jnp.float32)

    def loss(v, t):
        return jnp.sum(fn(v, t, "cubic").astype(jnp.float32) ** 2)

    for name, g in (("fwd", fn if False else (lambda v, t: fn(v, t, "cubic"))),
                    ("fwd+bwd", jax.grad(loss, argnums=(0, 1)))):
        c = (jax.jit(g, in_shardings=(rep, rep), out_shardings=None)
             .lower(im, th).compile())
        ca = c.cost_analysis()
        print(f"{tag} {name}: flops={ca.get('flops', 0)/1e9:.2f} G, "
              f"bytes={ca.get('bytes accessed', 0)/2**20:.0f} MiB", flush=True)


report("v1", _warp_separable_v1)
report("v2", _warp_separable_v2)
print("MOSAIC_OK")
