"""Inference ("serve") throughput: jitted eval-mode G forward at 256²."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, numpy as np, jax.numpy as jnp
from tfcgan_tpu.models import GeneratorUNet

for B in (1, 32, 128, 256):
    model = GeneratorUNet(dtype=jnp.bfloat16)
    x = jnp.zeros((B, 256, 256, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(p, x):
        return model.apply(p, x, deterministic=True)

    y = fwd(params, x)
    float(np.asarray(y[0, 0, 0, 0]))
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        y = fwd(params, y.astype(jnp.float32))  # chain to defeat laziness
    float(np.asarray(y[0, 0, 0, 0]))
    dt = (time.perf_counter() - t0) / N
    print(f"B={B}: {dt*1e3:.2f} ms -> {B/dt:.0f} img/s", flush=True)
