"""Chipless AOT per-piece cost breakdown of the FFT-GLO step (v5e target).

VERDICT round-2 #3 asks for a profile-backed account of the b128 step's HBM
traffic.  This compiles the G-loss pieces separately (G fwd alone, then
G fwd+bwd through each loss term in isolation) plus the D phase, and prints
XLA's flops / bytes-accessed per piece.  Activation traffic scales linearly
in batch, so B=16 (fast compiles on the 1-core host) gives the same shares;
param/optimizer bytes (~constant) are called out separately.

Usage: [B=16] python tools/cost_fftglo.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["TFCGAN_PALLAS_INTERPRET"] = "0"
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
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.recipes.tfcgan import (
    fft_loss,
    patch_triplet_loss,
    temperature_triplet_loss,
)

B = int(os.environ.get("B", "16"))
SIZE = 256
cfg = get_experiment("fft_glo")
cfg = cfg.replace(data=cfg.data.__class__(batch_size=B, image_size=SIZE),
                  train=cfg.train.__class__(compute_dtype="bfloat16"))
recipe = build_recipe(cfg)

key = jax.random.PRNGKey(0)
host_batch = synthetic_batch(batch_size=B, image_size=SIZE)
batch_avals = jax.tree.map(
    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), host_batch)
params_avals = jax.eval_shape(lambda: recipe.init(key, host_batch))
key_aval = jax.ShapeDtypeStruct(key.shape, key.dtype)
log("avals ready")


def report(name, fn, *avals):
    lowered = jax.jit(fn, in_shardings=tuple(
        jax.tree.map(lambda _: rep, a) for a in avals)).lower(*avals)
    c = lowered.compile()
    ca = c.cost_analysis()
    fl = ca.get("flops", 0.0)
    by = ca.get("bytes accessed", 0.0)
    log(f"{name:26s}: {fl/1e12:7.2f} TFLOP  {by/2**30:8.1f} GiB accessed")
    return by


def g_full(params, batch, key):
    (loss, _), grads = jax.value_and_grad(
        lambda gp: recipe.g_loss(gp, params["d_params"], params["spectral"],
                                 params["frozen"], batch, key),
        has_aux=True)(params["g_params"])
    return loss, grads


def g_fwd(params, batch, key):
    return recipe._gen(params["g_params"], batch, key)


def _term_piece(term_fn):
    """G fwd + bwd through a single loss term (grads wrt g_params)."""
    def piece(params, batch, key):
        def f(gp):
            fake_b = recipe._gen(gp, batch, key)
            return term_fn(params, fake_b, batch, key)
        return jax.grad(f)(params["g_params"])
    return piece


def _adv(params, fake_b, batch, key):
    from tfcgan_tpu import ops
    pf = recipe._disc(params["d_params"], params["spectral"], fake_b, batch["A"])
    pr = recipe._disc(params["d_params"], params["spectral"], batch["B"], batch["A"])
    return ops.relativistic_g_loss(pf, pr, cfg.loss.label_smooth)


def _lpips(params, fake_b, batch, key):
    if recipe.lpips is not None:
        return jnp.mean(recipe.lpips.apply(params["frozen"]["lpips"], fake_b, batch["B"]))
    from tfcgan_tpu.recipes.tfcgan import multiscale_recon
    return multiscale_recon(fake_b, batch["B"])


def _triplet(params, fake_b, batch, key):
    return patch_triplet_loss(fake_b, batch["B"], key, cfg.loss.patch_grid)


def _temp(params, fake_b, batch, key):
    return temperature_triplet_loss(fake_b, batch["B"], batch["T_B"], key,
                                    cfg.loss.temp_lambda, cfg.loss.temp_quantize)


def _fft(params, fake_b, batch, key):
    return fft_loss(fake_b, batch["B"], cfg.loss)


def d_full(params, batch, key):
    aux = {"fake_b": recipe._gen(params["g_params"], batch, key)}
    def f(dp):
        loss, _ = recipe.d_loss(dp, params["spectral"], aux, batch, key)
        return loss
    return jax.grad(f)(params["d_params"])


n_param = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params_avals))
log(f"param count (all trees): {n_param/1e6:.1f} M "
    f"-> adam update traffic ~{n_param*4*7/2**30:.2f} GiB/step (batch-independent)")

total = report("g_full (loss+grads)", g_full, params_avals, batch_avals, key_aval)
report("G fwd only", g_fwd, params_avals, batch_avals, key_aval)
report("G + adv (incl D fwd+bwd)", _term_piece(_adv), params_avals, batch_avals, key_aval)
report("G + lpips", _term_piece(_lpips), params_avals, batch_avals, key_aval)
report("G + patch triplet", _term_piece(_triplet), params_avals, batch_avals, key_aval)
report("G + temp triplet", _term_piece(_temp), params_avals, batch_avals, key_aval)
report("G + fft amp/phase", _term_piece(_fft), params_avals, batch_avals, key_aval)
report("D phase (incl G fwd)", d_full, params_avals, batch_avals, key_aval)
log(f"done (g_full total {total/2**30:.1f} GiB at B={B})")
