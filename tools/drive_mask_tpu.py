"""One fft_patch_mask train step on the real TPU (saliency convs + mask loss)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, numpy as np
from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer

B = 96
cfg = get_experiment("fft_patch_mask")
cfg = cfg.replace(data=cfg.data.__class__(batch_size=B, image_size=256),
                  train=cfg.train.__class__(compute_dtype="bfloat16"))
recipe = build_recipe(cfg)
trainer = Trainer(cfg, recipe, mesh=make_mesh())
batch = shard_batch(synthetic_batch(batch_size=B, image_size=256), trainer.mesh)
state = trainer.init_state(jax.random.PRNGKey(0), synthetic_batch(batch_size=B, image_size=256))
step = trainer.compiled_step()
for _ in range(3): state, m = step(state, batch)
float(np.asarray(m["loss_G"]))
t0 = time.perf_counter()
for _ in range(6): state, m = step(state, batch)
float(np.asarray(m["loss_G"]))
dt = (time.perf_counter()-t0)/6
print(f"fft_patch_mask B={B}: {dt*1000:.1f} ms/step -> {B/dt:.1f} img/s "
      f"g_mask={float(np.asarray(m['g_mask'])):.4f}", flush=True)
