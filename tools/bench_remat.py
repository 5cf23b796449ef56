"""Does remat (jax.checkpoint) on the LPIPS tower help the memory-bound step?

Peak temp at batch 128 is 16.3 GB (~HBM); the step sits at 57% of the memory
roofline. Rematerializing LPIPS trades FLOPs (compute floor 180 ms < measured
486 ms) for less activation traffic + lower peak.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, numpy as np
from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer, make_train_step


class RematLPIPS:
    def __init__(self, module):
        self._fn = jax.checkpoint(lambda p, x, y: module.apply(p, x, y))
        self.init = module.init

    def apply(self, p, x, y):
        return self._fn(p, x, y)


def run(B, remat):
    cfg = get_experiment("fft_glo")
    cfg = cfg.replace(
        data=cfg.data.__class__(batch_size=B, image_size=256),
        train=cfg.train.__class__(compute_dtype="bfloat16"),
    )
    recipe = build_recipe(cfg)
    if remat:
        recipe.lpips = RematLPIPS(recipe.lpips)
    trainer = Trainer(cfg, recipe, mesh=make_mesh())
    batch = shard_batch(synthetic_batch(batch_size=B, image_size=256), trainer.mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), synthetic_batch(batch_size=B, image_size=256))
    step = make_train_step(cfg, recipe)
    compiled = jax.jit(step, donate_argnums=(0,)).lower(state, batch).compile()
    ma = compiled.memory_analysis()
    print(f"B={B} remat={remat}: peak temp {ma.temp_size_in_bytes/1e9:.2f} GB", flush=True)
    sf = jax.jit(step, donate_argnums=(0,))
    for _ in range(3):
        state, m = sf(state, batch)
    float(np.asarray(m["loss_G"]))
    t0 = time.perf_counter()
    for _ in range(6):
        state, m = sf(state, batch)
    float(np.asarray(m["loss_G"]))
    dt = (time.perf_counter() - t0) / 6
    print(f"  {dt*1e3:.1f} ms/step -> {B/dt:.1f} img/s", flush=True)


run(128, True)
run(160, True)
run(192, True)
