"""Reproduce / fix-check: FFT loss under a dp×sp mesh on the host CPU backend.

Round-1 workaround swapped the dryrun spatial leg to a non-FFT recipe because
XLA's CPU fft thunk rejected the sharded layouts (__graft_entry__.py:54-57).
This probe runs fft_glo itself on a dp4×sp2 CPU mesh.
"""

import os, sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer

n, sp = 8, 2
cfg = get_experiment("fft_glo")
cfg = cfg.replace(
    data=cfg.data.__class__(batch_size=(2 * n) // sp, image_size=64),
    train=cfg.train.__class__(compute_dtype="bfloat16"),
    mesh=cfg.mesh.__class__(num_devices=n, spatial=sp),
)
recipe = build_recipe(cfg)
trainer = Trainer(cfg, recipe, mesh=make_mesh(n, spatial=sp))
batch = synthetic_batch(batch_size=(2 * n) // sp, image_size=64)
state = trainer.init_state(jax.random.PRNGKey(1), batch)
step = trainer.compiled_step()
state, m = step(state, shard_batch(batch, trainer.mesh))
lg, ld = float(m["loss_G"]), float(m["loss_D"])
assert np.isfinite(lg) and np.isfinite(ld), (lg, ld)
print(f"fft_glo dp{n // sp}xsp{sp}: loss_G={lg:.4f} loss_D={ld:.4f}")
