"""Cost decomposition of the FFT-GLO step by switching loss terms off."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, numpy as np
from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer

B, SIZE = int(__import__("os").environ.get("B", "96")), 256

def run(tag, **loss_kw):
    cfg = get_experiment("fft_glo")
    cfg = cfg.replace(
        data=cfg.data.__class__(batch_size=B, image_size=SIZE),
        train=cfg.train.__class__(compute_dtype="bfloat16"),
        loss=cfg.loss.__class__(**{**cfg.loss.__dict__, **loss_kw}),
    )
    recipe = build_recipe(cfg)
    trainer = Trainer(cfg, recipe, mesh=make_mesh())
    batch = shard_batch(synthetic_batch(batch_size=B, image_size=SIZE), trainer.mesh)
    state = trainer.init_state(jax.random.PRNGKey(0), synthetic_batch(batch_size=B, image_size=SIZE))
    step = trainer.compiled_step()
    for _ in range(2): state, m = step(state, batch)
    float(np.asarray(m["loss_G"]))
    t0 = time.perf_counter()
    for _ in range(6): state, m = step(state, batch)
    float(np.asarray(m["loss_G"]))
    dt = (time.perf_counter() - t0) / 6
    print(f"{tag}: {dt*1000:.1f} ms/step ({B/dt:.0f} img/s)")
    return dt

full = run("full fft_glo")
run("no lpips", use_lpips=False)
run("no fft", fft_mode="off")
run("no temp", use_temp=False)
run("no triplet", patch_grid=0)
run("adv only", use_lpips=False, fft_mode="off", use_temp=False, patch_grid=0)
