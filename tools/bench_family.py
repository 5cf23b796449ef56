"""Sustained training throughput (img/s/chip) for ONE recipe family.

VERDICT r2 #7: the single-line driver bench covers fft_glo only; this tool
produces the per-family steady-state rows for BASELINE.md. One experiment
per process (tunnel discipline: one client, minimal distinct jits), batches
generated ON DEVICE, >= 20 timed steps after warmup, one JSON line out.

    timeout 1500 python tools/bench_family.py fft_patch_16 --batch 96
    timeout 1500 python tools/bench_family.py stn_newmodel3
    ...

Default batch/size per family were validated by completing on-chip runs at
exactly these shapes (BASELINE.md round-3 table); the round-2 AOT peak table
was measured at b16 and does NOT cover the raised thermalgan/nemar defaults.
Override with --batch/--size to probe the ceiling.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

# (image size, batch) steady-state defaults per family
DEFAULTS = {
    "fft_glo": (256, 128),
    "fft_patch_16": (256, 96),
    "fft_glo_16p": (256, 96),
    "stn_newmodel3": (256, 32),
    "thermalgan": (256, 128),  # occupancy-bound ladder: b16 558.7, b64 737.5,
    # b128 959.2 img/s; b192 regresses to 867.9 (round 5)
    "cyclegan": (128, 16),
    # batch ladder (round 5): b16 377, b64 386.9, b128 454.6, b256 422.2
    "nemar": (128, 128),
    "tfc_diff": (128, 32),
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("experiment")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    d_size, d_batch = DEFAULTS.get(args.experiment, (256, 16))
    size = args.size or d_size
    batch_size = args.batch or d_batch

    import jax
    import numpy as np

    from tfcgan_tpu.config import get_experiment
    from tfcgan_tpu.data.synth import synthetic_batch_device
    from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
    from tfcgan_tpu.recipes import build_recipe
    from tfcgan_tpu.train.trainer import Trainer

    cfg = get_experiment(args.experiment)
    cfg = cfg.replace(
        data=cfg.data.__class__(batch_size=batch_size, image_size=size),
        train=cfg.train.__class__(compute_dtype="bfloat16", steps_per_epoch=10),
    )
    recipe = build_recipe(cfg)
    trainer = Trainer(cfg, recipe, mesh=make_mesh())
    batch = shard_batch(
        synthetic_batch_device(batch_size=batch_size, image_size=size,
                               with_labels=True),
        trainer.mesh,
    )
    print(f"[{time.strftime('%H:%M:%S')}] batch on device", flush=True)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.compiled_step()
    print(f"[{time.strftime('%H:%M:%S')}] state initialized", flush=True)
    for _ in range(args.warmup):
        state, metrics = step(state, batch)
    # the tunneled platform's block_until_ready is unreliable: sync a scalar
    float(np.asarray(metrics["loss_G"]))
    print(f"[{time.strftime('%H:%M:%S')}] warmup done (compile + "
          f"{args.warmup} steps)", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch)
    loss_g = float(np.asarray(metrics["loss_G"]))
    dt = time.perf_counter() - t0

    ms_step = dt / args.steps * 1e3
    img_s = batch_size * args.steps / dt
    print(json.dumps({
        "experiment": args.experiment,
        "image_size": size,
        "batch": batch_size,
        "steps": args.steps,
        "ms_per_step": round(ms_step, 1),
        "img_per_sec_chip": round(img_s / jax.device_count(), 1),
        "loss_G": round(loss_g, 4),
        "platform": jax.devices()[0].platform,
    }), flush=True)


if __name__ == "__main__":
    main()
