"""Drive smoke: NeMAR train step with the Pallas dense grid_sample forced on.

Runs 2 steps of the real `nemar` recipe on the host mesh with
TFCGAN_PALLAS_INTERPRET=1 so DeformableSTN/CNNAffineSTN route through the
Pallas kernel (interpret emulation on CPU), exactly as a TPU user would hit
it. Losses must be finite and change between steps.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["TFCGAN_PALLAS_INTERPRET"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.parallel.mesh import shard_batch

t0 = time.time()
cfg = get_experiment("nemar")
cfg = cfg.replace(
    data=cfg.data.__class__(batch_size=2, image_size=128),
    train=cfg.train.__class__(compute_dtype="float32"),
)
recipe = build_recipe(cfg)
trainer = Trainer(cfg, recipe)
batch = synthetic_batch(batch_size=2, image_size=128)
state = trainer.init_state(jax.random.PRNGKey(0), batch)
step = trainer.compiled_step()
sb = shard_batch(batch, trainer.mesh)
m = []
for i in range(2):
    state, metrics = step(state, sb)
    m.append({k: float(v) for k, v in metrics.items()
              if np.ndim(v) == 0})
    print(f"[{time.time()-t0:6.1f}s] step {i}:",
          {k: round(v, 5) for k, v in list(m[-1].items())[:6]}, flush=True)
assert all(np.isfinite(v) for v in m[0].values()), m[0]
assert any(abs(m[0][k] - m[1][k]) > 1e-9 for k in m[0]), "losses did not change"
print("SMOKE OK — pallas grid_sample inside the jitted NeMAR step, "
      f"{time.time()-t0:.1f}s total")
