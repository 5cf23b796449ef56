"""Microbenchmarks of hot ops on the real TPU chip.

The tunneled platform's block_until_ready is unreliable; every measurement
chains the op output into the next input and host-syncs a scalar at the end.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from tfcgan_tpu import ops
from tfcgan_tpu.models import GeneratorUNet, PatchDiscriminator, LPIPS

key = jax.random.PRNGKey(0)
B = 32

def bench_chained(fn, x0, n=10, warm=2):
    y = x0
    for _ in range(warm):
        y = fn(y)
    float(np.asarray(jnp.sum(y[(0,) * y.ndim])))
    y = x0
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(y)
    float(np.asarray(y[(0,) * y.ndim]))
    return (time.perf_counter() - t0) / n * 1000

x64 = jax.random.normal(key, (B, 256, 256, 64), jnp.bfloat16)
x3 = jax.random.normal(key, (B, 256, 256, 3), jnp.bfloat16)

f = jax.jit(lambda v: ops.blur_pool(v, 1))
print(f"blur_pool s1 (B,256,256,64): {bench_chained(f, x64):.2f} ms")
f = jax.jit(lambda v: jax.nn.leaky_relu(ops.instance_norm(v), 0.2))
print(f"inorm+leaky (B,256,256,64): {bench_chained(f, x64):.2f} ms")

theta = jnp.tile(jnp.asarray([[1.0,0.05,0.02],[-0.05,1.0,0.01]]), (B,1,1))
f = jax.jit(lambda v: ops.warp.warp_affine(v, theta))
print(f"warp bicubic (B,256,256,3): {bench_chained(f, x3.astype(jnp.float32)):.2f} ms")

f = jax.jit(lambda v: v + 0.001*ops.fftloss.fft_l1_loss(v, v*0.9, mode='exact')[0])
print(f"fft exact loss (B,256,256,3): {bench_chained(f, x3.astype(jnp.float32)):.2f} ms")

G = GeneratorUNet(dtype=jnp.bfloat16); gp = G.init(key, x3[:1].astype(jnp.float32))
f = jax.jit(lambda v: G.apply(gp, v, deterministic=True))
print(f"G fwd (B=32): {bench_chained(f, x3):.2f} ms")

D = PatchDiscriminator(dtype=jnp.bfloat16); dv = D.init(key, x3[:1], x3[:1])
f = jax.jit(lambda v: v + jnp.mean(D.apply(dv, v, v)).astype(v.dtype))
print(f"D fwd (B=32): {bench_chained(f, x3):.2f} ms")

L = LPIPS(dtype=jnp.bfloat16); lp = L.init(key, x3[:1], x3[:1])
f = jax.jit(lambda v: v + jnp.mean(L.apply(lp, v, v*0.9)).astype(v.dtype))
print(f"LPIPS fwd (B=32): {bench_chained(f, x3):.2f} ms")

f = jax.jit(lambda v: jax.grad(lambda u: jnp.mean(L.apply(lp, u, x3*0.9)).astype(jnp.float32))(v) + v)
print(f"LPIPS grad (B=32): {bench_chained(f, x3):.2f} ms")

f = jax.jit(lambda v: jax.grad(lambda u: jnp.mean(G.apply(gp, u, deterministic=True)).astype(jnp.float32))(v) + v)
print(f"G fwd+bwd-to-input (B=32): {bench_chained(f, x3):.2f} ms")
