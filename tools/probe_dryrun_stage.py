"""Probe a single dryrun_multichip stage in isolation on the virtual CPU mesh.

Round-4 diagnostic for the MULTICHIP_r03 regression (VERDICT weak #1): the
stn one-step SIGABRTs in XLA:CPU's collective rendezvous (rendezvous.cc:127,
all-gather inside a WhileThunk) on a 1-core host. Hypothesis: the Pallas
warp kernels run in *interpret* mode on CPU, whose grid loop lowers to a
while-loop; with batch-sharded operands GSPMD hoists an all-gather into the
loop body, and 8 device threads on 1 core miss the 40 s rendezvous window.

Usage: python tools/probe_dryrun_stage.py <experiment> [--fast-warp 0|1]
       [--devices 8] [--size 64] [--vit-depth N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("experiment")
    p.add_argument("--fast-warp", type=int, default=1)
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch-per-device", type=int, default=2)
    p.add_argument("--vit-depth", type=int, default=0, help="0 = config default")
    args = p.parse_args()

    import __graft_entry__ as g

    g._pin_host_cpu_mesh(args.devices)

    import jax
    import numpy as np

    from tfcgan_tpu.config import get_experiment
    from tfcgan_tpu.data.synth import synthetic_batch
    from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
    from tfcgan_tpu.recipes import build_recipe
    from tfcgan_tpu.train.trainer import Trainer

    t0 = time.monotonic()

    def say(msg: str) -> None:
        print(f"[{time.monotonic() - t0:6.1f}s] {msg}", flush=True)

    bs = args.batch_per_device * args.devices
    cfg = get_experiment(args.experiment)
    extra = dict(cfg.extra)
    extra["fast_warp"] = bool(args.fast_warp)
    if args.vit_depth:
        extra["vit_depth"] = args.vit_depth
    cfg = cfg.replace(
        data=cfg.data.__class__(batch_size=bs, image_size=args.size),
        train=cfg.train.__class__(compute_dtype="bfloat16"),
        mesh=cfg.mesh.__class__(num_devices=args.devices),
        extra=extra,
    )
    say(f"config ready: {args.experiment} fast_warp={bool(args.fast_warp)}")
    recipe = build_recipe(cfg)
    trainer = Trainer(cfg, recipe, mesh=make_mesh(args.devices))
    batch = synthetic_batch(batch_size=bs, image_size=args.size)
    say("init_state ...")
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    say("compile+run step ...")
    step = trainer.compiled_step()
    state, metrics = step(state, shard_batch(batch, trainer.mesh))
    lg = float(np.asarray(metrics["loss_G"]))
    ld = float(np.asarray(metrics["loss_D"]))
    say(f"done: loss_G={lg:.4f} loss_D={ld:.4f}")
    assert np.isfinite(lg) and np.isfinite(ld)


if __name__ == "__main__":
    main()
