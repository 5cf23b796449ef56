import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np

print("warp formulation:", "v1 (3-transpose)" if
      os.environ.get("TFCGAN_WARP_V1", "0").lower() in ("1", "true")
      else "v2 (NHWC stride=C)", flush=True)
from tfcgan_tpu import ops
from tfcgan_tpu.ops.pallas_kernels import warp_affine_separable

key = jax.random.PRNGKey(0)
B = 32
x = jax.random.normal(key, (B, 256, 256, 3), jnp.float32)
theta = jnp.tile(jnp.asarray([[1.0,0.05,0.02],[-0.05,1.0,0.01]]), (B,1,1))

def bench_chained(f, x0, n=10, warm=2):
    y = x0
    for _ in range(warm): y = f(y)
    float(np.asarray(y[0,0,0,0]))
    y = x0
    t0 = time.perf_counter()
    for _ in range(n): y = f(y)
    float(np.asarray(y[0,0,0,0]))
    return (time.perf_counter()-t0)/n*1000

for mode in ("bilinear", "bicubic"):
    f = jax.jit(lambda v, m=mode: warp_affine_separable(v, theta, mode=m))
    print(f"separable {mode}: {bench_chained(f, x):.2f} ms")
# grad speed
def loss(v): return jnp.sum(warp_affine_separable(v, theta, mode="bicubic")**2)
f = jax.jit(lambda v: jax.grad(loss)(v) + v*0.0 + v)
print(f"separable bicubic fwd+bwd: {bench_chained(f, x):.2f} ms")
f = jax.jit(lambda v: ops.warp.warp_affine(v, theta))
print(f"gather bicubic (old): {bench_chained(f, x):.2f} ms")
