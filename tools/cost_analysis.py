"""XLA cost analysis of the jitted FFT-GLO step + profiler attempt on axon."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, numpy as np
from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer, make_train_step

B, SIZE = 128, 256

cfg = get_experiment("fft_glo")
cfg = cfg.replace(
    data=cfg.data.__class__(batch_size=B, image_size=SIZE),
    train=cfg.train.__class__(compute_dtype="bfloat16"),
)
recipe = build_recipe(cfg)
trainer = Trainer(cfg, recipe, mesh=make_mesh())
batch = shard_batch(synthetic_batch(batch_size=B, image_size=SIZE), trainer.mesh)
state = trainer.init_state(jax.random.PRNGKey(0), synthetic_batch(batch_size=B, image_size=SIZE))

step = make_train_step(cfg, recipe)
lowered = jax.jit(step).lower(state, batch)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
flops = ca.get("flops", float("nan"))
bytes_ = ca.get("bytes accessed", float("nan"))
print(f"step flops: {flops/1e12:.3f} TFLOP  bytes: {bytes_/1e9:.2f} GB", flush=True)
# v5e peak: ~197 TFLOP/s bf16, ~819 GB/s HBM
t_compute = flops / 197e12
t_mem = bytes_ / 819e9
print(f"roofline: compute-bound {t_compute*1e3:.1f} ms  memory-bound {t_mem*1e3:.1f} ms", flush=True)

ma = compiled.memory_analysis()
try:
    print(f"peak memory: {ma.temp_size_in_bytes/1e9:.2f} GB temp + "
          f"{ma.argument_size_in_bytes/1e9:.2f} GB args", flush=True)
except Exception as e:
    print("memory_analysis:", ma, flush=True)

# measured time for reference
sf = trainer.compiled_step()
for _ in range(3):
    state, m = sf(state, batch)
float(np.asarray(m["loss_G"]))
t0 = time.perf_counter()
for _ in range(6):
    state, m = sf(state, batch)
float(np.asarray(m["loss_G"]))
dt = (time.perf_counter() - t0) / 6
print(f"measured: {dt*1e3:.1f} ms/step -> MXU util ~{t_compute/dt*100:.0f}%", flush=True)

# profiler attempt
try:
    jax.profiler.start_trace("/tmp/jax_trace")
    for _ in range(2):
        state, m = sf(state, batch)
    float(np.asarray(m["loss_G"]))
    jax.profiler.stop_trace()
    for root, _, files in os.walk("/tmp/jax_trace"):
        for f in files:
            print("trace file:", os.path.join(root, f), flush=True)
except Exception as e:
    print("profiler failed:", repr(e), flush=True)
