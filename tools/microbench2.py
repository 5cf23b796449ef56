import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from tfcgan_tpu.models import GeneratorUNet

key = jax.random.PRNGKey(0)
B = 32
x = jax.random.normal(key, (B, 256, 256, 3), jnp.bfloat16)
G = GeneratorUNet(dtype=jnp.bfloat16); gp = G.init(key, x[:1].astype(jnp.float32))
gfwd = jax.jit(lambda p, v: G.apply(p, v, deterministic=True))

# host-sync measurement
for _ in range(3): np.asarray(gfwd(gp, x)[0,0,0])
t0 = time.perf_counter()
N = 10
for _ in range(N):
    out = gfwd(gp, x)
    np.asarray(out[0, 0, 0])  # force full device->host sync
dt = (time.perf_counter() - t0) / N * 1000
print(f"G fwd host-synced: {dt:.3f} ms/call -> {B/dt*1000:.0f} img/s")

# chained (output feeds next input)
y = x
for _ in range(3): y = gfwd(gp, y)
jax.block_until_ready(y)
t0 = time.perf_counter()
y = x
for _ in range(N): y = gfwd(gp, y)
jax.block_until_ready(y)
dt = (time.perf_counter() - t0) / N * 1000
print(f"G fwd chained: {dt:.3f} ms/call")
