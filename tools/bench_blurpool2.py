import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from tfcgan_tpu import ops

def bench_chained(f, x0, n=10, warm=2):
    y = x0
    for _ in range(warm): y = f(y)
    float(np.asarray(y[0,0,0,0]))
    y = x0
    t0 = time.perf_counter()
    for _ in range(n): y = f(y)
    float(np.asarray(y[0,0,0,0]))
    return (time.perf_counter()-t0)/n*1000

K1 = jnp.asarray([1.0, 3.0, 3.0, 1.0]) / 8.0

def blur_shiftadd(x, stride):
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0,0),(1,2),(1,2),(0,0)), mode="reflect")
    # separable: 4-tap along H then 4-tap along W
    t = sum(K1[i] * jax.lax.slice(xp, (0,i,0,0), (n,i+h,w+3,c)) for i in range(4))
    out = sum(K1[j] * jax.lax.slice(t, (0,0,j,0), (n,h,j+w,c)) for j in range(4))
    if stride == 2:
        out = out[:, ::2, ::2, :]
    return out

key = jax.random.PRNGKey(0)
for shape in [(32,256,256,64), (32,128,128,128), (32,64,64,256)]:
    for s in (1, 2):
        x = jax.random.normal(key, shape, jnp.bfloat16)
        f_xla = jax.jit(lambda v, s=s: ops.blur_pool(v, s))
        f_sa  = jax.jit(lambda v, s=s: blur_shiftadd(v, s))
        txla = bench_chained(f_xla, x) if s==1 else 0
        ref = np.asarray(f_xla(x).astype(jnp.float32)); got = np.asarray(f_sa(x).astype(jnp.float32))
        t2 = bench_chained(f_sa, x) if s==1 else bench_chained(lambda v: blur_shiftadd(v,2).repeat(2,1).repeat(2,2), x)
        print(f"{shape} s{s}: xla {txla:.2f} | shiftadd {t2:.2f} ms | maxdiff {np.abs(ref-got).max():.5f}")
