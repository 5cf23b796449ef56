"""One-step CPU smoke: stn_newmodel3 with the msrecon anchor on synthetic
registration pairs."""

import os, sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_registration_batch
from tfcgan_tpu.parallel.mesh import shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer

cfg = get_experiment("stn_newmodel3")
cfg = cfg.replace(
    data=cfg.data.__class__(batch_size=8, image_size=64),
    train=cfg.train.__class__(compute_dtype="float32"),
)
recipe = build_recipe(cfg)
assert recipe.perceptual == "msrecon", recipe.perceptual
assert recipe.lpips is None

batch, truth = synthetic_registration_batch(batch_size=8, image_size=64, seed=0)
print("scene ranges: A", batch["A"].min(), batch["A"].max(),
      "B", batch["B"].min(), batch["B"].max())
print("misalignment L1(B, B_aligned):",
      float(np.mean(np.abs(batch["B"] - truth["B_aligned"]))))

trainer = Trainer(cfg, recipe)
state = trainer.init_state(jax.random.PRNGKey(0), batch)
assert "lpips" not in state.frozen, list(state.frozen)
state, m = trainer.compiled_step()(state, shard_batch(batch, trainer.mesh))
out = {k: float(v) for k, v in m.items()}
print(out)
assert all(np.isfinite(v) for v in out.values()), out
print("OK")
