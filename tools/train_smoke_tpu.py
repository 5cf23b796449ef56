"""Learning smoke test on the real TPU: fit FFT-GLO to a deterministic
mapping (B = channel-rolled, inverted A) for a few hundred steps and verify
the generator actually learns it (PSNR(fake_B, B) rises, LPIPS falls)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, numpy as np, jax.numpy as jnp
from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer
from tfcgan_tpu import ops

SIZE, B = 128, 32
rng = np.random.RandomState(0)

def make_batch(seed):
    r = np.random.RandomState(seed)
    a = r.randn(B, SIZE // 8, SIZE // 8, 3).astype(np.float32)
    a = np.tanh(a.repeat(8, 1).repeat(8, 2))
    b = -np.roll(a, 1, axis=-1)  # deterministic target mapping
    red = np.round((b[..., 0] * 0.5 + 0.5) * 255.0)
    t_b = (24.0 + red * 14.0 / 255.0).astype(np.float32)
    return {"A": a, "B": b, "T_B": t_b}

cfg = get_experiment("fft_glo")
cfg = cfg.replace(data=cfg.data.__class__(batch_size=B, image_size=SIZE),
                  train=cfg.train.__class__(compute_dtype="bfloat16"))
recipe = build_recipe(cfg)
trainer = Trainer(cfg, recipe, mesh=make_mesh())
state = trainer.init_state(jax.random.PRNGKey(0), make_batch(0))
step = trainer.compiled_step()

gen = jax.jit(lambda p, a: recipe.G.apply({"params": p["G"]}, a, deterministic=True))
eval_batch = make_batch(999)

def report(state, tag):
    fake = gen(jax.device_get(state.g_params), jnp.asarray(eval_batch["A"]))
    p = float(jnp.mean(ops.psnr((jnp.asarray(eval_batch["B"])*0.5+0.5)*255,
                                (fake.astype(jnp.float32)*0.5+0.5)*255)))
    print(f"{tag}: eval PSNR(fake_B, B) = {p:.2f} dB")
    return p

p0 = report(state, "step 0")
t0 = time.perf_counter()
N = 300
for i in range(N):
    state, m = step(state, shard_batch(make_batch(i % 50), trainer.mesh))
    if i % 100 == 0:
        print(f"  step {i}: loss_G={float(np.asarray(m['loss_G'])):.3f} "
              f"loss_D={float(np.asarray(m['loss_D'])):.3f} "
              f"lpips={float(np.asarray(m['g_lpips'])):.4f}")
float(np.asarray(m["loss_G"]))
dt = time.perf_counter() - t0
p1 = report(state, f"step {N}")
print(f"throughput: {N*B/dt:.0f} img/s @ {SIZE}^2 | PSNR gain: {p1-p0:+.2f} dB")
assert p1 > p0 + 3.0, "generator failed to learn the synthetic mapping"
print("LEARNING SMOKE: PASS")
