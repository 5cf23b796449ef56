import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from tfcgan_tpu import ops
from tfcgan_tpu.ops.pallas_kernels import blur_pool_pallas

def bench_chained(f, x0, n=10, warm=2):
    y = x0
    for _ in range(warm): y = f(y)
    float(np.asarray(y[0,0,0,0]))
    y = x0
    t0 = time.perf_counter()
    for _ in range(n): y = f(y)
    float(np.asarray(y[0,0,0,0]))
    return (time.perf_counter()-t0)/n*1000

key = jax.random.PRNGKey(0)
for shape in [(32,256,256,64), (32,128,128,128), (32,64,64,256)]:
    x = jax.random.normal(key, shape, jnp.bfloat16)
    f_xla = jax.jit(lambda v: ops.blur_pool(v, 1))
    f_pl  = jax.jit(lambda v: blur_pool_pallas(v, 1))
    print(f"{shape} s1: xla {bench_chained(f_xla,x):.2f} ms | pallas {bench_chained(f_pl,x):.2f} ms")
    # correctness on-device
    a = np.asarray(f_xla(x).astype(jnp.float32)); b = np.asarray(f_pl(x).astype(jnp.float32))
    print("   maxdiff:", np.abs(a-b).max())
