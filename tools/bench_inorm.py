import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np

def bench_chained(f, x0, n=10, warm=2):
    y = x0
    for _ in range(warm): y = f(y)
    float(np.asarray(y[0,0,0,0]))
    y = x0
    t0 = time.perf_counter()
    for _ in range(n): y = f(y)
    float(np.asarray(y[0,0,0,0]))
    return (time.perf_counter()-t0)/n*1000

def in_current(x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1,2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1,2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)

def in_fast(x, eps=1e-5):
    m = jnp.mean(x, axis=(1,2), keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1,2), keepdims=True)
    var = jnp.maximum(m2 - jnp.square(m), 0.0)
    scale = jax.lax.rsqrt(var + eps).astype(x.dtype)
    return (x - m.astype(x.dtype)) * scale

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (32, 256, 256, 64), jnp.bfloat16)
f1 = jax.jit(lambda v: jax.nn.leaky_relu(in_current(v), 0.2))
f2 = jax.jit(lambda v: jax.nn.leaky_relu(in_fast(v), 0.2))
print(f"IN current: {bench_chained(f1, x):.2f} ms")
print(f"IN fast   : {bench_chained(f2, x):.2f} ms")
a = np.asarray(f1(x).astype(jnp.float32)); b = np.asarray(f2(x).astype(jnp.float32))
print("maxdiff:", np.abs(a-b).max())
