"""One real train step of EVERY recipe family on the actual TPU chip.

CI-style evidence that the full experiment matrix — not just the flagship —
compiles and executes on real hardware (the pytest suite runs on the
CPU-emulated mesh). Prints ms/step and a headline metric per recipe.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, numpy as np
from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer

# (experiment, image size, batch, metric to show)
MATRIX = [
    ("fft_glo", 256, 32, "loss_G"),
    ("stn_newmodel3", 256, 16, "g_morph"),
    ("thermalgan", 256, 8, "g_kl"),  # G2's 8 downs require 256^2
    ("thermalgan_bn", 256, 8, "g_kl"),
    ("cyclegan", 128, 16, "loss_G"),
    ("nemar", 128, 16, "loss_G"),
    ("tfc_diff", 128, 16, "g_noise_mse"),
]

for name, size, bs, key in MATRIX:
    cfg = get_experiment(name)
    cfg = cfg.replace(
        data=cfg.data.__class__(batch_size=bs, image_size=size),
        train=cfg.train.__class__(compute_dtype="bfloat16",
                                  steps_per_epoch=10),
    )
    recipe = build_recipe(cfg)
    trainer = Trainer(cfg, recipe, mesh=make_mesh())
    host = synthetic_batch(batch_size=bs, image_size=size, with_labels=True)
    batch = shard_batch(host, trainer.mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), host)
    step = trainer.compiled_step()
    state, m = step(state, batch)
    float(np.asarray(m["loss_G"]))  # force compile + first step
    t0 = time.perf_counter()
    state, m = step(state, batch)
    v = float(np.asarray(m[key]))
    dt = time.perf_counter() - t0
    ok = np.isfinite(v)
    print(f"{name:15s} {size}px b{bs}: {dt*1e3:7.1f} ms/step  {key}={v:.4f}"
          f"  {'OK' if ok else 'NON-FINITE'}", flush=True)
    assert ok, name
print("all recipes ran on", jax.devices()[0].platform, flush=True)
