"""Profile the FFT-GLO b128 train step on the TPU and print the op-level
time breakdown (VERDICT round-2 #3: close the 486 ms -> 276 ms roofline gap).

Parses the xplane trace.json.gz by hand (no tensorboard in-env).
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import gzip
import json
import time
from collections import defaultdict

import jax
import numpy as np

from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch_device
from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer

B = int(os.environ.get("B", "128"))
SIZE = int(os.environ.get("SIZE", "256"))
OUT = os.environ.get("TRACE_DIR", "/tmp/step_trace")
EXP = os.environ.get("EXP", "fft_glo")

import time as _t
_t0 = _t.time()
def _log(m):
    print(f"[{_t.time()-_t0:7.1f}s] {m}", flush=True)

cfg = get_experiment(EXP)
cfg = cfg.replace(
    data=cfg.data.__class__(batch_size=B, image_size=SIZE),
    train=cfg.train.__class__(compute_dtype="bfloat16"),
)
recipe = build_recipe(cfg)
trainer = Trainer(cfg, recipe, mesh=make_mesh())
# device-generated batch: the tunneled TPU moves 100 MB in minutes when the
# tunnel degrades; never pay host->device transfer for synthetic data
batch = shard_batch(synthetic_batch_device(batch_size=B, image_size=SIZE),
                    trainer.mesh)
float(np.asarray(batch["A"][0, 0, 0, 0]))
_log("batch on device")
state = trainer.init_state(jax.random.PRNGKey(0), batch)
float(np.asarray(state.step))
_log("state initialized")
step = trainer.compiled_step()

for _ in range(3):
    state, m = step(state, batch)
float(np.asarray(m["loss_G"]))
_log("warmup done (compile + 3 steps)")
t0 = time.perf_counter()
for _ in range(5):
    state, m = step(state, batch)
float(np.asarray(m["loss_G"]))
per_step_ms = (time.perf_counter() - t0) / 5 * 1e3
print(f"measured: {per_step_ms:.1f} ms/step ({B / per_step_ms * 1e3:.0f} img/s)")

_log("tracing 3 steps")
with jax.profiler.trace(OUT):
    for _ in range(3):
        state, m = step(state, batch)
    float(np.asarray(m["loss_G"]))
_log("trace collected")

# ---- parse newest trace.json.gz
traces = sorted(glob.glob(os.path.join(OUT, "**", "*.trace.json.gz"),
                          recursive=True), key=os.path.getmtime)
path = traces[-1]
with gzip.open(path, "rt") as f:
    data = json.load(f)

events = data["traceEvents"]
# find TPU op-level track: pick pids whose process name mentions TPU / device
pid_name = {}
tid_name = {}
for e in events:
    if e.get("ph") == "M":
        if e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

by_op = defaultdict(float)
by_track = defaultdict(float)
for e in events:
    if e.get("ph") != "X":
        continue
    tname = tid_name.get((e["pid"], e["tid"]), "")
    pname = pid_name.get(e["pid"], "")
    if "TPU" not in pname and "tpu" not in pname.lower():
        continue
    dur = e.get("dur", 0) / 1e3  # ms
    by_track[f"{pname}/{tname}"] += dur
    if "XLA Ops" in tname or "XLA TraceMe" in tname or "Steps" not in tname:
        by_op[e["name"]] += dur

print(f"\ntrace: {path}")
print("\n-- tracks --")
for k, v in sorted(by_track.items(), key=lambda kv: -kv[1])[:10]:
    print(f"{v:10.2f} ms  {k}")
print("\n-- top ops (3 steps summed) --")
total = 0.0
for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
    total += v
    print(f"{v:10.2f} ms  {k[:110]}")
print(f"(top-40 sum {total:.1f} ms over 3 steps)")
