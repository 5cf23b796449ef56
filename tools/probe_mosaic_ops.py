"""Probe which vector-relayout constructs the REAL backend's Mosaic accepts.

Round-2 lesson: the tunnel's remote-compile helper runs an older Mosaic than
the local AOT libtpu — it rejects strided `vector.extract_strided_slice`
("expected strides to be confined to [1, 2)"), which the blur-pool kernel's
stride-2 fwd H/W passes used. Before rewriting the kernel, this probe compiles
one tiny Pallas kernel per candidate replacement construct on the real chip
and reports OK/FAIL + numerical correctness, so the rewrite only uses
constructs the deployed backend actually supports.

Usage: timeout 900 python tools/probe_mosaic_ops.py
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, x_np, expect_fn, out_shape):
    x = jnp.asarray(x_np)
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        y = np.asarray(jax.jit(fn)(x))
        ref = expect_fn(x_np)
        err = float(np.abs(y - ref).max())
        print(f"{name}: OK  max_err={err:.2e}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL  {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # 0. control: strided slice (known-bad on the tunnel helper)
    x0 = rng.standard_normal((34, 256, 128)).astype(np.float32)

    def k0(xr, o):
        o[...] = jax.lax.slice_in_dim(xr[...], 0, 31, stride=2, axis=0)

    run("strided_slice_axis0", k0, x0, lambda x: x[0:31:2], (16, 256, 128))

    # 1. leading-dim parity reshape + stride-1 slices (H-pass fix candidate)
    def k1(xr, o):
        r = xr[...].reshape(17, 2, 256, 128)
        e, od = r[:, 0], r[:, 1]
        o[...] = e[0:16] + 2.0 * od[0:16] + 3.0 * e[1:17]

    run(
        "leading_reshape_split",
        k1,
        x0,
        lambda x: x[0:32:2] + 2.0 * x[1:33:2] + 3.0 * x[2:34:2],
        (16, 256, 128),
    )

    # 2. sublane-axis split reshape + index (W-pass fix candidate A)
    x2 = rng.standard_normal((8, 256, 128)).astype(np.float32)

    def k2(xr, o):
        r = xr[...].reshape(8, 128, 2, 128)
        o[...] = r[:, :, 0, :] + 2.0 * r[:, :, 1, :]

    run(
        "sublane_split_reshape",
        k2,
        x2,
        lambda x: x[:, 0::2] + 2.0 * x[:, 1::2],
        (8, 128, 128),
    )

    # 3. sublane merge via stack+reshape (bwd interleave pattern)
    x3 = rng.standard_normal((8, 128, 128)).astype(np.float32)

    def k3(xr, o):
        a = xr[...]
        o[...] = jnp.stack([a, 2.0 * a], axis=2).reshape(8, 256, 128)

    def e3(x):
        out = np.empty((8, 256, 128), np.float32)
        out[:, 0::2] = x
        out[:, 1::2] = 2.0 * x
        return out

    run("sublane_merge_stack", k3, x3, e3, (8, 256, 128))

    # 4. lane-axis slice at offset 64 of 128 (packed-channel fix candidate B)
    def k4(xr, o):
        a = xr[...]
        o[...] = a[:, :, 0:64] + 2.0 * a[:, :, 64:128]

    run(
        "lane_slice_off64",
        k4,
        x3,
        lambda x: x[:, :, :64] + 2.0 * x[:, :, 64:],
        (8, 128, 64),
    )

    # 5. roll along sublane axis (alternate W-pass shift primitive)
    def k5(xr, o):
        a = xr[...]
        o[...] = a + jnp.roll(a, -1, axis=1)

    run("sublane_roll", k5, x3, lambda x: x + np.roll(x, -1, axis=1), (8, 128, 128))


if __name__ == "__main__":
    main()
