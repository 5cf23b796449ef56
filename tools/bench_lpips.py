import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from tfcgan_tpu.models import LPIPS
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (32, 256, 256, 3), jnp.bfloat16)
L = LPIPS(dtype=jnp.bfloat16); lp = L.init(key, x[:1], x[:1])
f = jax.jit(lambda v: v + jnp.mean(L.apply(lp, v, v*0.9)).astype(v.dtype))
y = x
for _ in range(2): y = f(y)
float(np.asarray(y[0,0,0,0]))
y = x; t0 = time.perf_counter()
for _ in range(10): y = f(y)
float(np.asarray(y[0,0,0,0]))
print(f"LPIPS fwd (batched towers): {(time.perf_counter()-t0)/10*1000:.2f} ms")
g = jax.jit(lambda v: jax.grad(lambda u: jnp.mean(L.apply(lp, u, x*0.9)).astype(jnp.float32))(v) + v)
y = x
for _ in range(2): y = g(y)
float(np.asarray(y[0,0,0,0]))
y = x; t0 = time.perf_counter()
for _ in range(10): y = g(y)
float(np.asarray(y[0,0,0,0]))
print(f"LPIPS grad (batched towers): {(time.perf_counter()-t0)/10*1000:.2f} ms")
