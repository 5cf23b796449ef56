import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np

key = jax.random.PRNGKey(0)
N, H, W, C = 32, 256, 256, 3

def bench(f, x0, n=10, warm=2):
    y = x0
    for _ in range(warm): y = f(y)
    float(np.asarray(y.reshape(-1)[0]))
    y = x0
    t0 = time.perf_counter()
    for _ in range(n): y = f(y)
    float(np.asarray(y.reshape(-1)[0]))
    return (time.perf_counter()-t0)/n*1000

x = jax.random.normal(key, (N, H, W, C), jnp.float32)
# per-(n,h) fractional positions along W
pos = jax.random.uniform(key, (N, H, W), minval=0.0, maxval=W-1.0)

# V1: take_along_axis along W (axis=2), per channel via broadcast idx
def v1(x):
    i0 = jnp.floor(pos).astype(jnp.int32)
    t = pos - i0
    i0c = jnp.clip(i0, 0, W-1)[..., None]
    i1c = jnp.clip(i0+1, 0, W-1)[..., None]
    g0 = jnp.take_along_axis(x, jnp.broadcast_to(i0c, x.shape), axis=2)
    g1 = jnp.take_along_axis(x, jnp.broadcast_to(i1c, x.shape), axis=2)
    return g0*(1-t[...,None]) + g1*t[...,None]
print(f"V1 take_along W: {bench(jax.jit(v1), x):.2f} ms")

# V2: one-hot einsum over W (batched matmul on MXU)
def v2(x):
    i0 = jnp.floor(pos).astype(jnp.int32)
    t = pos - i0
    cols = jnp.arange(W)[None, None, None, :]
    w0 = (cols == jnp.clip(i0,0,W-1)[..., None]).astype(jnp.bfloat16) * (1-t[...,None]).astype(jnp.bfloat16)
    w1 = (cols == jnp.clip(i0+1,0,W-1)[..., None]).astype(jnp.bfloat16) * t[...,None].astype(jnp.bfloat16)
    Wm = w0 + w1  # (N,H,W_out,W_in)
    return jnp.einsum('nhwv,nhvc->nhwc', Wm, x.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32).astype(jnp.float32)
print(f"V2 onehot einsum: {bench(jax.jit(v2), x):.2f} ms")
