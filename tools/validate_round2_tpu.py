"""One-process round-2 TPU validation: Pallas blur-pool on Mosaic + the b128
FFT-GLO step rate. Designed for a degraded tunnel: device-generated data,
few distinct compiles, progress prints, and a pure-XLA fallback check.

Usage: timeout 1500 python -u tools/validate_round2_tpu.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

t0 = time.time()
def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

import jax
import jax.numpy as jnp
import numpy as np

log(f"devices: {jax.devices()}")

# ---- 1. Pallas blur kernel: compile + exactness on chip (small, fast)
from tfcgan_tpu.ops.blurpool import blur_pool_padded
from tfcgan_tpu.ops.pallas_kernels.blurpool import blur_pool_fast

ok = True
for shape, stride in [((2, 32, 32, 64), 2), ((1, 31, 31, 64), 2),
                      ((1, 32, 32, 128), 1)]:
    x = jnp.asarray(np.random.RandomState(0).randn(*shape).astype(np.float32))
    try:
        a = np.asarray(blur_pool_fast(x, stride))
        b = np.asarray(blur_pool_padded(x, stride=stride))
        err = float(np.abs(a - b).max())
        g = jax.grad(lambda v: (blur_pool_fast(v, stride) ** 2).sum().astype(jnp.float32))(x)
        gr = jax.grad(lambda v: (blur_pool_padded(v, stride=stride) ** 2).sum())(x)
        gerr = float(jnp.abs(g - gr).max())
        log(f"pallas blur {shape} s{stride}: fwd {err:.2e} bwd {gerr:.2e}")
        ok = ok and err < 1e-4 and gerr < 1e-3
    except Exception as e:  # Mosaic rejection -> report, flip kill switch
        log(f"pallas blur FAILED on {shape} s{stride}: {type(e).__name__}: {e}")
        ok = False
        break

if not ok:
    os.environ["TFCGAN_PALLAS_BLUR"] = "0"
    log("kill switch engaged: TFCGAN_PALLAS_BLUR=0")

# ---- 2. b128 full-step rate
from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch_device
from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer

B = int(os.environ.get("B", "128"))
cfg = get_experiment("fft_glo")
cfg = cfg.replace(data=cfg.data.__class__(batch_size=B, image_size=256),
                  train=cfg.train.__class__(compute_dtype="bfloat16"))
trainer = Trainer(cfg, build_recipe(cfg), mesh=make_mesh())
batch = shard_batch(synthetic_batch_device(batch_size=B, image_size=256),
                    trainer.mesh)
state = trainer.init_state(jax.random.PRNGKey(0), batch)
float(np.asarray(state.step))
log("state on device")
step = trainer.compiled_step()
state, m = step(state, batch)
print("loss_G:", float(np.asarray(m["loss_G"])), flush=True)
log("first step done (compile)")
t1 = time.time()
N = 6
for _ in range(N):
    state, m = step(state, batch)
print("loss_G:", float(np.asarray(m["loss_G"])), flush=True)
dt = (time.time() - t1) / N
log(f"b{B} fft_glo: {dt*1e3:.1f} ms/step ({B/dt:.0f} img/s) "
    f"pallas_blur={'on' if ok else 'OFF'}")
