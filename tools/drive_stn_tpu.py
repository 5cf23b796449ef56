"""Drive the STN recipe's warp path on the REAL TPU: one train step of the
stn_newmodel3 recipe at reduced size, checking losses are finite and STN
params move (gradients flow through the Pallas warp's custom VJP)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer
from tfcgan_tpu.parallel.mesh import shard_batch

cfg = get_experiment("stn_newmodel3")
cfg = cfg.replace(data=cfg.data.__class__(batch_size=8, image_size=256))
recipe = build_recipe(cfg)
trainer = Trainer(cfg, recipe)
batch = synthetic_batch(batch_size=8, image_size=256)
state = trainer.init_state(jax.random.PRNGKey(0), batch)
step = trainer.compiled_step()
import time
state, m = step(state, shard_batch(batch, trainer.mesh))
print({k: float(np.asarray(v)) for k, v in m.items()})
stn0 = jax.device_get(state.g_params["STN"])
t0 = time.perf_counter()
state, m = step(state, shard_batch(batch, trainer.mesh))
float(np.asarray(m["loss_G"]))
print(f"step time (bs8 @256, bf16): {(time.perf_counter()-t0)*1000:.1f} ms")
stn1 = jax.device_get(state.g_params["STN"])
d = jax.tree_util.tree_map(lambda a, b: float(np.abs(a-b).max()), stn0, stn1)
print("STN param max delta:", max(jax.tree_util.tree_leaves(d)))
