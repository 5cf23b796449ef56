"""The one parameterized microbench for hot ops / model stages on the chip.

Consolidates the round-1/2 scratch probes (bench_blurpool{,2,3}.py,
microbench{,2}.py — conclusions recorded in BASELINE.md; the scripts are
gone). Groups:

    timeout 900 python tools/microbench_ops.py ops        # hot primitive ops
    timeout 900 python tools/microbench_ops.py models     # G/D/LPIPS fwd(+bwd)
    timeout 900 python tools/microbench_ops.py blurpool   # Pallas vs XLA A/B

Options: --batch N (default 32), --all-shapes (blurpool: sweep aligned /
ragged / stride-1 shapes instead of the single default — each extra shape
costs a remote-helper jit, minutes when the tunnel is slow).

Measurement discipline (CLAUDE.md): the tunneled platform's
block_until_ready is unreliable — every timing chains the op output into the
next input and host-syncs one scalar at the end; inputs are generated ON
DEVICE so a degraded tunnel can't turn this into a transfer bench.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_chained(fn, x0, n=10, warm=2):
    """ms/iter with output->input chaining + one host scalar sync."""
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


def bench_repeat(fn, x, n=10):
    """ms/iter for fn(x) with a scalar sync per loop end (non-chainable fns,
    e.g. A/B pairs whose output shape differs from the input)."""
    f = jax.jit(fn)
    y = f(x)
    float(np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(x)
    float(np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[0]))
    return (time.perf_counter() - t0) / n * 1000


def _randn(shape, dtype=jnp.bfloat16, seed=0):
    return jax.jit(lambda k: jax.random.normal(k, shape, dtype))(
        jax.random.PRNGKey(seed))


def group_ops(b):
    from tfcgan_tpu import ops

    x64 = _randn((b, 256, 256, 64))
    x3 = _randn((b, 256, 256, 3))
    f = jax.jit(lambda v: ops.blur_pool(v, 1))
    print(f"blur_pool s1   ({b},256,256,64): {bench_chained(f, x64):7.2f} ms")
    f = jax.jit(lambda v: jax.nn.leaky_relu(ops.instance_norm(v), 0.2))
    print(f"inorm+leaky    ({b},256,256,64): {bench_chained(f, x64):7.2f} ms")
    theta = jnp.tile(jnp.asarray([[1.0, 0.05, 0.02], [-0.05, 1.0, 0.01]]), (b, 1, 1))
    f = jax.jit(lambda v: ops.warp.warp_affine(v, theta))
    print(f"warp bicubic   ({b},256,256,3):  "
          f"{bench_chained(f, x3.astype(jnp.float32)):7.2f} ms")
    f = jax.jit(lambda v: v + 0.001 * ops.fftloss.fft_l1_loss(v, v * 0.9, mode='exact')[0])
    print(f"fft exact loss ({b},256,256,3):  "
          f"{bench_chained(f, x3.astype(jnp.float32)):7.2f} ms")


def group_models(b):
    from tfcgan_tpu.models import GeneratorUNet, LPIPS, PatchDiscriminator

    key = jax.random.PRNGKey(0)
    x3 = _randn((b, 256, 256, 3))
    G = GeneratorUNet(dtype=jnp.bfloat16)
    gp = G.init(key, x3[:1].astype(jnp.float32))
    f = jax.jit(lambda v: G.apply(gp, v, deterministic=True))
    print(f"G fwd           (B={b}): {bench_chained(f, x3):7.2f} ms")
    D = PatchDiscriminator(dtype=jnp.bfloat16)
    dv = D.init(key, x3[:1], x3[:1])
    f = jax.jit(lambda v: v + jnp.mean(D.apply(dv, v, v)).astype(v.dtype))
    print(f"D fwd           (B={b}): {bench_chained(f, x3):7.2f} ms")
    L = LPIPS(dtype=jnp.bfloat16)
    lp = L.init(key, x3[:1], x3[:1])
    f = jax.jit(lambda v: v + jnp.mean(L.apply(lp, v, v * 0.9)).astype(v.dtype))
    print(f"LPIPS fwd       (B={b}): {bench_chained(f, x3):7.2f} ms")
    f = jax.jit(lambda v: jax.grad(
        lambda u: jnp.mean(L.apply(lp, u, x3 * 0.9)).astype(jnp.float32))(v) + v)
    print(f"LPIPS grad      (B={b}): {bench_chained(f, x3):7.2f} ms")
    f = jax.jit(lambda v: jax.grad(
        lambda u: jnp.mean(G.apply(gp, u, deterministic=True)).astype(jnp.float32))(v) + v)
    print(f"G fwd+bwd-input (B={b}): {bench_chained(f, x3):7.2f} ms")


def group_blurpool(b, all_shapes):
    from tfcgan_tpu.ops.blurpool import blur_pool_padded
    from tfcgan_tpu.ops.pallas_kernels.blurpool import blur_pool_fast

    shapes = [((b, 255, 255, 64), 2)]
    if all_shapes:
        shapes = [((b, 256, 256, 64), 2), ((b, 255, 255, 64), 2),
                  ((b, 256, 256, 64), 1)]
    for shape, stride in shapes:
        x = _randn(shape)
        print(f"-- {shape} stride={stride}")
        d = jax.jit(lambda v: jnp.abs(
            blur_pool_fast(v, stride).astype(jnp.float32)
            - blur_pool_padded(v, stride=stride).astype(jnp.float32)).max())(x)
        print(f"   maxdiff fwd: {float(np.asarray(d)):.2e}")
        for label, fn in [
            ("pallas fwd", lambda v: blur_pool_fast(v, stride)),
            ("xla padded fwd", lambda v: blur_pool_padded(v, stride=stride)),
            ("pallas fwd+bwd", jax.grad(
                lambda v: jnp.sum(blur_pool_fast(v, stride).astype(jnp.float32) ** 2))),
            ("xla padded fwd+bwd", jax.grad(
                lambda v: jnp.sum(blur_pool_padded(v, stride=stride).astype(jnp.float32) ** 2))),
        ]:
            print(f"{label:>22}: {bench_repeat(fn, x):7.2f} ms")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("group", choices=["ops", "models", "blurpool"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--all-shapes", action="store_true")
    args = ap.parse_args()
    if args.group == "ops":
        group_ops(args.batch)
    elif args.group == "models":
        group_models(args.batch)
    else:
        group_blurpool(args.batch, args.all_shapes)


if __name__ == "__main__":
    main()
