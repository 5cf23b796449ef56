"""Verify-skill drive: CycleGAN recipe 2 steps on an 8-device CPU mesh."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")

from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer

cfg = get_experiment("cyclegan")
cfg = cfg.replace(
    data=cfg.data.__class__(batch_size=16, image_size=64),
    train=cfg.train.__class__(compute_dtype="float32"),
    extra={**cfg.extra, "resnet_blocks": 2},
)
recipe = build_recipe(cfg)
mesh = make_mesh(8)
trainer = Trainer(cfg, recipe, mesh=mesh)
batch = synthetic_batch(batch_size=16, image_size=64, seed=0)
state = trainer.init_state(jax.random.PRNGKey(0), batch)
step = trainer.compiled_step()
prev = None
for i in range(2):
    state, m = step(state, shard_batch(batch, mesh))
    vals = {k: float(v) for k, v in m.items()}
    print(f"step {i}: {vals}", flush=True)
    assert all(v == v and abs(v) < 1e6 for v in vals.values()), vals
    if prev is not None:
        assert vals != prev, "losses did not change between steps"
    prev = vals
print("OK: cyclegan 8-device mesh smoke passed")
