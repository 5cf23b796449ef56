"""Chipless AOT Mosaic check for the flash-attention Pallas kernel.

Compiles fwd+bwd of ops.pallas_kernels.flashattn for the v5e TPU target via
jax.experimental.topologies (no chip needed) at the tfc_diff shapes: 64²
tokens (S=4096) and 32² (S=1024), head_dim=8, and reports XLA's traffic
estimate next to the materialized-softmax path for the same shapes.
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


def loss_flash(q, k, v):
    from tfcgan_tpu.ops.pallas_kernels.flashattn import flash_attention
    o = flash_attention(q, k, v, q.shape[1] ** -0.5, interpret=False)
    return jnp.sum(o.astype(jnp.float32) ** 2)


def loss_xla(q, k, v):
    s = jnp.einsum("bdq,bdk->bqk", q, k) * (q.shape[1] ** -0.5)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.sum(jnp.einsum("bqk,bdk->bdq", p, v).astype(jnp.float32) ** 2)


for bh, d, s in [(128, 8, 4096), (128, 8, 1024), (32, 8, 8192)]:  # b16 × 8 heads; 8192 = the supported() upper bound
    av = jax.ShapeDtypeStruct((bh, d, s), jnp.bfloat16)
    row = f"BH={bh} D={d} S={s}:"
    for name, fn in [("flash", loss_flash), ("xla", loss_xla)]:
        if name == "xla" and s == 4096:
            row += "  xla=OOM-scale(skip)"
            continue
        c = (
            jax.jit(jax.grad(fn, argnums=(0, 1, 2)),
                    in_shardings=(rep, rep, rep), out_shardings=rep)
            .lower(av, av, av)
            .compile()
        )
        ca = c.cost_analysis()
        ma = c.memory_analysis()
        row += (f"  {name}: bytes={ca.get('bytes accessed', 0)/2**30:.2f} GiB"
                f" peak_temp={ma.temp_size_in_bytes/2**30:.2f} GiB")
    print(row)
print("MOSAIC_OK")
