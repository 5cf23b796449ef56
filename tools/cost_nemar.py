"""Chipless AOT cost breakdown of the NeMAR step (v5e target, B small).

The full-step AOT check reported 754.5 GiB HBM accessed at b128 — 6x the
flagship fft_glo step.  This tool compiles the step's pieces separately and
prints XLA's per-piece flops / bytes-accessed so the hot spot is provable
without a chip.  Bytes scale linearly in batch, so B=16 (fast compiles on the
1-core host) gives the same shares.

Usage: [B=16] python tools/cost_nemar.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["TFCGAN_PALLAS_INTERPRET"] = "0"  # real Mosaic lowering, not interpret emulation
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

t0 = time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)

topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2x1")
mesh = Mesh(np.array(topo.devices[:1]), ("data",))
rep = NamedSharding(mesh, P())

from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.recipes import build_recipe

B = int(os.environ.get("B", "16"))
SIZE = 256
cfg = get_experiment("nemar")
cfg = cfg.replace(data=cfg.data.__class__(batch_size=B, image_size=SIZE),
                  train=cfg.train.__class__(compute_dtype="bfloat16"))
recipe = build_recipe(cfg)

key = jax.random.PRNGKey(0)
a_aval = jax.ShapeDtypeStruct((B, SIZE, SIZE, 3), jnp.float32)
batch_avals = {"A": a_aval, "B": a_aval}
params_avals = jax.eval_shape(lambda: recipe.init(key, {
    "A": jnp.zeros((B, SIZE, SIZE, 3)), "B": jnp.zeros((B, SIZE, SIZE, 3))}))
log("avals ready")


def report(name, fn, *avals):
    lowered = jax.jit(fn, in_shardings=tuple(jax.tree.map(lambda _: rep, a) for a in avals)).lower(*avals)
    c = lowered.compile()
    ca = c.cost_analysis()
    fl = ca.get("flops", 0.0)
    by = ca.get("bytes accessed", 0.0)
    log(f"{name:28s}: {fl/1e12:7.2f} TFLOP  {by/2**30:8.1f} GiB accessed")
    return by


# -- pieces ------------------------------------------------------------
def g_full(params, batch, key):
    (loss, _), grads = jax.value_and_grad(
        lambda gp: recipe.g_loss(gp, params["d_params"], {}, {}, batch, key),
        has_aux=True)(params["g_params"])
    return loss, grads


def warp_only(params, batch):
    """Deformable STN fwd+bwd (incl. its UNet) on [A, A] apply-targets."""
    def f(rp):
        warped, reg = recipe.R.apply({"params": rp}, batch["A"], batch["B"],
                                     apply_on=[batch["A"], batch["A"]])
        return sum(jnp.sum(w.astype(jnp.float32) ** 2) for w in warped) + reg
    return jax.grad(f)(params["g_params"]["R"])


def unet_only(params, batch):
    """Deformable UNet fwd+bwd with the warp replaced by identity."""
    import tfcgan_tpu.models.stn as stn_mod
    orig = stn_mod._dense_warp
    stn_mod._dense_warp = lambda img, grid, fast: img + 0.0 * grid.mean()
    try:
        def f(rp):
            warped, reg = recipe.R.apply({"params": rp}, batch["A"], batch["B"],
                                         apply_on=[batch["A"], batch["A"]])
            return sum(jnp.sum(w.astype(jnp.float32) ** 2) for w in warped) + reg
        return jax.grad(f)(params["g_params"]["R"])
    finally:
        stn_mod._dense_warp = orig


def _gsample_piece(sample_fn):
    """Pure warp fwd+bwd wrt img and grid (2 warped images)."""
    def piece(img, grid):
        def f(im, gr):
            o1 = sample_fn(im, gr)
            o2 = sample_fn(im * 0.5, gr)
            return (jnp.sum(o1.astype(jnp.float32) ** 2)
                    + jnp.sum(o2.astype(jnp.float32) ** 2))
        return jax.grad(f, argnums=(0, 1))(img, grid)
    return piece


def _xla_sample(im, gr):
    from tfcgan_tpu.ops.warp import grid_sample
    return grid_sample(im, gr, mode="bilinear", padding_mode="zeros",
                       align_corners=False)


def _pallas_sample(im, gr):
    from tfcgan_tpu.ops.pallas_kernels import grid_sample_dense
    return grid_sample_dense(im, gr, mode="bilinear", padding_mode="zeros",
                             align_corners=False)


def t_twice(params, batch):
    def f(tp):
        fb = recipe.T.apply({"params": tp}, batch["A"])
        fb2 = recipe.T.apply({"params": tp}, fb.astype(batch["A"].dtype))
        return jnp.sum(fb2.astype(jnp.float32) ** 2)
    return jax.grad(f)(params["g_params"]["T"])


key_aval = jax.ShapeDtypeStruct((2,), jnp.uint32)
grid_aval = jax.ShapeDtypeStruct((B, SIZE, SIZE, 2), jnp.float32)

total = report("g_full (loss+grads)", g_full, params_avals, batch_avals, key_aval)
report("R: unet+2x grid_sample", warp_only, params_avals, batch_avals)
report("R: unet only (no warp)", unet_only, params_avals, batch_avals)
report("2x grid_sample (xla gather)", _gsample_piece(_xla_sample), a_aval, grid_aval)
report("2x grid_sample (pallas)", _gsample_piece(_pallas_sample), a_aval, grid_aval)
report("T applied twice", t_twice, params_avals, batch_avals)
log(f"done (g_full total {total/2**30:.1f} GiB at B={B})")
