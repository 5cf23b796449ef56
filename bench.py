"""Benchmark: images/sec/chip for the flagship FFT-GLO GAN train step at 256².

Runs on whatever accelerator JAX exposes (the driver provides one real TPU
chip). Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "batch": N}

Baseline context: the reference trains FFT-GLO with nn.DataParallel over 2
GPUs at batch 32 with per-sample host FFT/temperature round-trips
(SURVEY.md §3.1); BASELINE.md's north star is ">=5x a V100 baseline".
No V100 number is published anywhere in the reference, so V100_IMG_PER_SEC
below is an estimate for the same step (U-Net G fwd+bwd, D fwd+bwd x2, LPIPS,
host FFT loop) on one V100 — documented so the ratio is reproducible.

The default batch (128) sits ~250 MB under the v5e-1 HBM ceiling (BASELINE.md
round-3 AOT: b136 misses by 169 MB), so any peak-raising change can flip the
compile into an OOM. To keep BENCH_r{N} a number rather than a stack trace,
failures walk a loud batch ladder (128 -> 96 -> 64) before giving up
(VERDICT r3 weak #2); the emitted JSON records which batch actually ran.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

V100_IMG_PER_SEC = 30.0  # estimated reference throughput per V100 (see above)

# best measured throughput (tools/bench_batch.py: 32->202, 96->237, 128->264
# img/s pre-fusion; b144+ exceeded HBM pre-fusion). TFCGAN_BENCH_BATCH probes
# other batches without editing the driver-run default.
BATCH = int(os.environ.get("TFCGAN_BENCH_BATCH", "128"))
SIZE = 256
WARMUP = 3
ITERS = 10


def _compile_and_warm(batch_size: int):
    """Build trainer + device-resident batch, compile the step, run warmup.

    Returns (step, state, batch). Raises on compile/OOM failure — the caller
    owns the fallback policy (Pallas off, then the batch ladder).
    """
    import jax
    import numpy as np

    from tfcgan_tpu.config import get_experiment
    from tfcgan_tpu.data.synth import synthetic_batch_device
    from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
    from tfcgan_tpu.recipes import build_recipe
    from tfcgan_tpu.train.trainer import Trainer

    cfg = get_experiment("fft_glo")
    cfg = cfg.replace(
        data=cfg.data.__class__(batch_size=batch_size, image_size=SIZE),
        train=cfg.train.__class__(compute_dtype="bfloat16"),
    )
    trainer = Trainer(cfg, build_recipe(cfg), mesh=make_mesh())
    # batches are generated ON DEVICE: the tunneled TPU moves a 100 MB host
    # batch in minutes when the tunnel degrades, which would turn a compute
    # bench into a transfer bench (observed 2026-08-17)
    batch = shard_batch(
        synthetic_batch_device(batch_size=batch_size, image_size=SIZE),
        trainer.mesh,
    )
    # init_state runs the first Pallas lowering eagerly, so it must be inside
    # the caller's try (round-2 lesson: a Mosaic version skew on the real
    # backend should fall back, not kill the bench).
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.compiled_step()
    metrics = None
    for _ in range(WARMUP):
        state, metrics = step(state, batch)
    # NOTE: jax.block_until_ready does not reliably block on the tunneled TPU
    # platform — materialize a scalar on host to force full completion.
    float(np.asarray(metrics["loss_G"]))
    return step, state, batch


def _attempt(batch_size: int):
    """One batch rung: Pallas path first, pure-XLA fallback second."""
    try:
        return _compile_and_warm(batch_size)
    except Exception as e:
        # safety net: if a Pallas kernel fails to compile on this backend,
        # fall back to the pure-XLA formulations and retry once — loudly, so
        # a fallback run is distinguishable from a Pallas run in the logs
        print(f"bench: Pallas path failed at batch {batch_size} "
              f"({type(e).__name__}: {e}); retrying with TFCGAN_PALLAS_BLUR=0",
              file=sys.stderr, flush=True)
        traceback.print_exc(file=sys.stderr)
        os.environ["TFCGAN_PALLAS_BLUR"] = "0"
        return _compile_and_warm(batch_size)


def main() -> None:
    import jax
    import numpy as np

    n_dev = jax.device_count()

    # Batch ladder: the requested batch, then smaller proven rungs. A compile
    # or OOM failure degrades the bench loudly instead of erasing it.
    ladder = [BATCH] + [b for b in (96, 64, 32) if b < BATCH]
    step = state = batch = None
    used_batch = None
    for rung in ladder:
        try:
            step, state, batch = _attempt(rung)
            used_batch = rung
            break
        except Exception as e:
            print(f"bench: batch {rung} failed ({type(e).__name__}: {e}); "
                  f"dropping to the next ladder rung", file=sys.stderr, flush=True)
            traceback.print_exc(file=sys.stderr)
    if step is None:
        raise SystemExit("bench: every batch ladder rung failed (see stderr)")

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, batch)
    float(np.asarray(metrics["loss_G"]))
    dt = time.perf_counter() - t0

    img_per_sec = used_batch * ITERS / dt
    img_per_sec_chip = img_per_sec / n_dev
    print(
        json.dumps(
            {
                "metric": "fft_glo_train_images_per_sec_per_chip_256",
                "value": round(img_per_sec_chip, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_sec_chip / V100_IMG_PER_SEC, 2),
                "batch": used_batch,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
