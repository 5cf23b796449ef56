"""Does remat (jax.checkpoint) on the LPIPS tower help the memory-bound step?

Measured verdict (v5e-1, b128): NO — 559 ms/step remat vs 486 ms baseline,
peak temp unchanged at ~16.4 GB (LPIPS activations don't dominate the peak),
and batch 160 still fails to compile. Kept runnable with both arms for
re-measurement on other hardware.
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
    for _ in range(3):
        state, m = compiled(state, batch)
    float(np.asarray(m["loss_G"]))
    t0 = time.perf_counter()
    for _ in range(6):
        state, m = compiled(state, batch)
    float(np.asarray(m["loss_G"]))
    dt = (time.perf_counter() - t0) / 6
    print(f"  {dt*1e3:.1f} ms/step -> {B/dt:.1f} img/s", flush=True)


run(128, False)
run(128, True)
