"""A/B the NHWC Pallas blur-pool kernel vs the padded-XLA form on the chip."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from tfcgan_tpu.ops.blurpool import blur_pool_padded
from tfcgan_tpu.ops.pallas_kernels.blurpool import blur_pool_fast


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def bench(fn, x, label, iters=10):
    f = jax.jit(fn)
    y = f(x); sync(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x)
    sync(y)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:>34}: {dt:7.2f} ms")
    return dt


# one shape by default: the tunneled remote-compile helper can cost minutes
# per jit — set ALL_SHAPES=1 for the full sweep
_SHAPES = [((32, 255, 255, 64), 2)]
if os.environ.get("ALL_SHAPES"):
    _SHAPES = [((32, 256, 256, 64), 2), ((32, 255, 255, 64), 2),
               ((32, 256, 256, 64), 1)]
for shape, stride in _SHAPES:
    # generated ON DEVICE: a 500 MB host->device transfer takes minutes when
    # the axon tunnel degrades (CLAUDE.md)
    x = jax.jit(lambda k: jax.random.normal(k, shape, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    print(f"-- {shape} stride={stride}")
    # maxdiff computed on device — pulling two 500 MB outputs to host would
    # turn this into a tunnel-bandwidth bench
    d = jax.jit(lambda v: jnp.abs(
        blur_pool_fast(v, stride).astype(jnp.float32)
        - blur_pool_padded(v, stride=stride).astype(jnp.float32)).max())(x)
    print(f"   maxdiff fwd: {float(np.asarray(d)):.2e}")
    bench(lambda v: blur_pool_fast(v, stride), x, "pallas fwd")
    bench(lambda v: blur_pool_padded(v, stride=stride), x, "xla padded fwd")
    bench(jax.grad(lambda v: jnp.sum(blur_pool_fast(v, stride).astype(jnp.float32) ** 2)),
          x, "pallas fwd+bwd")
    bench(jax.grad(lambda v: jnp.sum(blur_pool_padded(v, stride=stride).astype(jnp.float32) ** 2)),
          x, "xla padded fwd+bwd")
