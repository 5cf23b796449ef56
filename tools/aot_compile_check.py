"""Chipless AOT compile check of the full train step for the v5e target.

Validates Mosaic/Pallas lowering, prints peak HBM (the b128 cliff) and the
XLA cost analysis WITHOUT a TPU: uses the local libtpu via
jax.experimental.topologies (the tunneled chip's remote-compile helper can
wedge for hours — this path needs neither the chip nor the tunnel).

Usage: [B=128] [EXP=fft_glo] [N_DEV=1|8] python tools/aot_compile_check.py
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["TFCGAN_PALLAS_INTERPRET"] = "0"  # real Mosaic lowering, not interpret emulation
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

t0 = time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)

N_DEV = int(os.environ.get("N_DEV", "1"))
topo = topologies.get_topology_desc(
    platform="tpu",
    topology_name="v5e:2x2x1" if N_DEV <= 4 else "v5e:2x4x1")
mesh = Mesh(np.array(topo.devices[:N_DEV]), ("data",))
rep = NamedSharding(mesh, P())

from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.state import create_state
from tfcgan_tpu.train.trainer import make_train_step

B = int(os.environ.get("B", "128"))
cfg = get_experiment(os.environ.get("EXP", "fft_glo"))
SIZE = int(os.environ.get("SIZE", cfg.data.image_size))
cfg = cfg.replace(data=cfg.data.__class__(batch_size=B, image_size=SIZE),
                  train=cfg.train.__class__(compute_dtype="bfloat16"))
recipe = build_recipe(cfg)

host_batch = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
              for k, v in synthetic_batch(
                  batch_size=B, image_size=SIZE,
                  with_labels=cfg.loss.conditional).items()}
state_avals = jax.eval_shape(
    lambda b: create_state(cfg, recipe, jax.random.PRNGKey(0), b), host_batch)
log("state avals ready")

step = make_train_step(cfg, recipe)
sh_state = jax.tree_util.tree_map(lambda _: rep, state_avals)
sh_batch = jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P("data")), host_batch)
lowered = jax.jit(step, donate_argnums=(0,),
                  in_shardings=(sh_state, sh_batch)).lower(state_avals, host_batch)
log("lowered")
compiled = lowered.compile()
log("COMPILED OK — full b128 train step (incl. pallas blur) on v5e target")
ma = compiled.memory_analysis()
try:
    print(f"peak temp: {ma.temp_size_in_bytes/2**30:.2f} GiB | "
          f"args {ma.argument_size_in_bytes/2**30:.2f} | "
          f"out {ma.output_size_in_bytes/2**30:.2f} | "
          f"gen code {ma.generated_code_size_in_bytes/2**20:.1f} MiB", flush=True)
except Exception as e:
    print("memory_analysis fields:", ma, e)
if os.environ.get("DUMP_HLO"):
    with open(os.environ["DUMP_HLO"], "w") as f:
        f.write(compiled.as_text())
    log(f"optimized HLO -> {os.environ['DUMP_HLO']}")
ca = compiled.cost_analysis()
if ca:
    c = ca[0] if isinstance(ca, (list, tuple)) else ca
    fl = c.get("flops", 0); ba = c.get("bytes accessed", 0)
    print(f"cost: {fl/1e12:.1f} TFLOP, {ba/2**30:.1f} GiB accessed -> "
          f"roofline max({fl/197e12*1e3:.0f}, {ba/819e9*1e3:.0f}) ms", flush=True)
