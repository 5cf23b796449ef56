"""Benchmark: images/sec/chip for the flagship FFT-GLO GAN train step at 256².

Runs on whatever accelerator JAX exposes (the driver provides one real TPU
chip). Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline context: the reference trains FFT-GLO with nn.DataParallel over 2
GPUs at batch 32 with per-sample host FFT/temperature round-trips
(SURVEY.md §3.1); BASELINE.md's north star is ">=5x a V100 baseline".
No V100 number is published anywhere in the reference, so V100_IMG_PER_SEC
below is an estimate for the same step (U-Net G fwd+bwd, D fwd+bwd x2, LPIPS,
host FFT loop) on one V100 — documented so the ratio is reproducible.
"""

from __future__ import annotations

import json
import time

V100_IMG_PER_SEC = 30.0  # estimated reference throughput per V100 (see above)

import os as _os

# best measured throughput (tools/bench_batch.py: 32->202, 96->237, 128->264
# img/s pre-fusion; b144+ exceeded HBM pre-fusion). TFCGAN_BENCH_BATCH probes
# other batches without editing the driver-run default.
BATCH = int(_os.environ.get("TFCGAN_BENCH_BATCH", "128"))
SIZE = 256
WARMUP = 3
ITERS = 10


def main() -> None:
    import jax

    from tfcgan_tpu.config import get_experiment
    from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
    from tfcgan_tpu.recipes import build_recipe
    from tfcgan_tpu.train.trainer import Trainer

    n_dev = jax.device_count()
    cfg = get_experiment("fft_glo")
    cfg = cfg.replace(
        data=cfg.data.__class__(batch_size=BATCH, image_size=SIZE),
        train=cfg.train.__class__(compute_dtype="bfloat16"),
    )
    recipe = build_recipe(cfg)
    trainer = Trainer(cfg, recipe, mesh=make_mesh())
    # batches are generated ON DEVICE: the tunneled TPU moves a 100 MB host
    # batch in minutes when the tunnel degrades, which would turn a compute
    # bench into a transfer bench (observed 2026-08-17)
    from tfcgan_tpu.data.synth import synthetic_batch_device

    batch = shard_batch(
        synthetic_batch_device(batch_size=BATCH, image_size=SIZE), trainer.mesh
    )

    import numpy as np

    # NOTE: jax.block_until_ready does not reliably block on the tunneled TPU
    # platform — materialize a scalar on host to force full completion.
    try:
        # init_state runs the first Pallas lowering eagerly: it must sit
        # INSIDE the try so a Mosaic version skew on the real backend (e.g.
        # the tunnel helper rejecting ops the local AOT libtpu accepts)
        # still falls back instead of killing the bench (round-2 lesson).
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer.compiled_step()
        for _ in range(WARMUP):
            state, metrics = step(state, batch)
        float(np.asarray(metrics["loss_G"]))
    except Exception as e:
        # safety net: if a Pallas kernel fails to compile on this backend,
        # fall back to the pure-XLA formulations and retry once — loudly, so
        # a fallback run is distinguishable from a Pallas run in the logs
        import os
        import sys
        import traceback

        print(f"bench: Pallas path failed ({type(e).__name__}: {e}); "
              f"retrying with TFCGAN_PALLAS_BLUR=0", file=sys.stderr)
        traceback.print_exc(file=sys.stderr)

        os.environ["TFCGAN_PALLAS_BLUR"] = "0"
        trainer = Trainer(cfg, build_recipe(cfg), mesh=make_mesh())
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer.compiled_step()
        for _ in range(WARMUP):
            state, metrics = step(state, batch)
        float(np.asarray(metrics["loss_G"]))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, batch)
    float(np.asarray(metrics["loss_G"]))
    dt = time.perf_counter() - t0

    img_per_sec = BATCH * ITERS / dt
    img_per_sec_chip = img_per_sec / n_dev
    print(
        json.dumps(
            {
                "metric": "fft_glo_train_images_per_sec_per_chip_256",
                "value": round(img_per_sec_chip, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_sec_chip / V100_IMG_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
