"""Exercise parallel/distributed.py in its REAL regime: >1 process.

Launches two local processes, each owning 4 virtual CPU devices, joined by
``jax.distributed.initialize`` (local coordinator — the same call that wires
DCN on real multi-host TPU slices; SURVEY.md §2.8). Each process runs TWO
full fft_glo train steps on the 8-device global mesh, feeding its own half
of the global batch (``local_batch_slice``), and prints the step-2 losses.
The parent then runs the identical config single-process on 8 local devices
and asserts the losses match to float32 tolerance — multi-process DCN
produces the same numbers as the single-process mesh.

Usage:   timeout 3600 python tools/run_multiprocess_dcn.py
Output:  per-process loss lines + a final OK/FAIL verdict (exit code).

Notes for this box (CLAUDE.md): JAX_PLATFORMS as an env var does not stick
(sitecustomize registers the axon TPU plugin), so each child pins the CPU
platform via jax.config BEFORE ``jax.distributed.initialize``; the persistent
compile cache keeps the 2x identical child compiles cheap after the first.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COORD = "127.0.0.1:9911"
NPROC = 2
LOCAL_DEVICES = 4
GLOBAL_BATCH = 16
IMAGE = 64
STEPS = 2


def child_main(process_id: int, num_processes: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        from tfcgan_tpu.parallel.distributed import initialize

        initialize(
            coordinator_address=COORD,
            num_processes=num_processes,
            process_id=process_id,
        )
    # persistent compile cache (same scheme as tests/conftest.py)
    try:
        with open("/proc/cpuinfo") as f:
            line = next((ln for ln in f if ln.startswith("flags")), "")
        import hashlib

        fp = hashlib.md5(line.encode()).hexdigest()[:10]
        jax.config.update(
            "jax_compilation_cache_dir", f"/root/.cache/jax_test_cache_{fp}"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except OSError:
        pass

    import numpy as np

    from tfcgan_tpu.config import get_experiment
    from tfcgan_tpu.data.synth import synthetic_batch
    from tfcgan_tpu.parallel.distributed import local_batch_slice
    from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
    from tfcgan_tpu.recipes import build_recipe
    from tfcgan_tpu.train.trainer import Trainer

    n_global = jax.device_count()
    assert n_global == NPROC * LOCAL_DEVICES or num_processes == 1, (
        jax.device_count(), jax.local_device_count())

    cfg = get_experiment("fft_glo")
    cfg = cfg.replace(
        data=cfg.data.__class__(batch_size=GLOBAL_BATCH, image_size=IMAGE),
        # fp32: the multi-process and single-process executables reduce in
        # different orders; bf16 noise compounds to ~1e-2 on loss_G by step 2
        # through the G update (measured), which would drown a real semantic
        # mismatch. fp32 keeps the equivalence assertion sharp.
        train=cfg.train.__class__(compute_dtype="float32"),
        mesh=cfg.mesh.__class__(num_devices=n_global),
    )
    recipe = build_recipe(cfg)
    trainer = Trainer(cfg, recipe, mesh=make_mesh(n_global))

    global_batch = synthetic_batch(batch_size=GLOBAL_BATCH, image_size=IMAGE)
    if num_processes > 1:
        # each process feeds only its half; device_put assembles the global
        # array from per-process shards (make_array_from_process_local_data
        # semantics) — mirrors per-host data loading on a real pod
        local = local_batch_slice(global_batch)
        from tfcgan_tpu.parallel.mesh import image_sharding

        def put(x):
            sh = image_sharding(trainer.mesh, getattr(x, "ndim", 1))
            return jax.make_array_from_process_local_data(sh, x)

        batch = jax.tree_util.tree_map(put, local)
    else:
        batch = shard_batch(global_batch, trainer.mesh)

    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.compiled_step()
    for _ in range(STEPS):
        state, metrics = step(state, batch)
    out = {
        "process": process_id,
        "num_processes": num_processes,
        "loss_G": float(np.asarray(metrics["loss_G"])),
        "loss_D": float(np.asarray(metrics["loss_D"])),
    }
    print("RESULT " + json.dumps(out), flush=True)


def main() -> int:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    procs = []
    for pid in range(NPROC):
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--child", str(pid)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    results = {}
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=3000)
        sys.stdout.write(out)
        if p.returncode != 0:
            print(f"FAIL: child {pid} exit {p.returncode}")
            return 1
        for line in out.splitlines():
            if line.startswith("RESULT "):
                results[pid] = json.loads(line[len("RESULT "):])
    if len(results) != NPROC:
        print("FAIL: missing child results")
        return 1

    # reference: single-process, 8 local devices, same everything
    env1 = dict(os.environ)
    env1["XLA_FLAGS"] = (
        env1.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={NPROC * LOCAL_DEVICES}"
    ).strip()
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", "0", "--single"],
        env=env1,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=3000,
    )
    sys.stdout.write(p.stdout)
    if p.returncode != 0:
        print("FAIL: single-process reference run failed")
        return 1
    ref = None
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            ref = json.loads(line[len("RESULT "):])
    assert ref is not None

    ok = True
    for pid, r in sorted(results.items()):
        dg = abs(r["loss_G"] - ref["loss_G"])
        dd = abs(r["loss_D"] - ref["loss_D"])
        line = (
            f"process {pid}: loss_G={r['loss_G']:.6f} (|Δ|={dg:.2e}) "
            f"loss_D={r['loss_D']:.6f} (|Δ|={dd:.2e}) vs single-process"
        )
        print(line)
        # fp32 end to end; the executables differ only in collective
        # implementation (cross-process shared-memory vs intra-process)
        if dg > 1e-3 or dd > 1e-3:
            ok = False
    print("OK: multi-process DCN losses match single-process mesh" if ok
          else "FAIL: loss mismatch")
    return 0 if ok else 1


if __name__ == "__main__":
    if "--child" in sys.argv:
        pid = int(sys.argv[sys.argv.index("--child") + 1])
        single = "--single" in sys.argv
        child_main(pid, 1 if single else NPROC)
    else:
        sys.exit(main())
