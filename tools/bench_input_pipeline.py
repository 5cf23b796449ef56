"""End-to-end real-file input pipeline benchmark (VERDICT round-2 #4).

Generates a synthetic A|B PNG dataset on disk, then measures fft_glo train
throughput from real files with:
  (a) the sync single-threaded batcher (data/pairs.batch_iterator),
  (b) PrefetchLoader(num_workers) + device_prefetch double-buffering,
and compares with the in-memory synthetic-data rate (BASELINE.md).

Usage: python tools/bench_input_pipeline.py [--root /tmp/pairs_bench]
       [--n 512] [--batch 32] [--size 256] [--steps 30] [--workers 4]
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np

if os.environ.get("FORCE_CPU"):  # JAX_PLATFORMS env alone does NOT stick
    import jax

    jax.config.update("jax_platforms", "cpu")


def make_dataset(root: str, n: int, size: int):
    from PIL import Image

    train = os.path.join(root, "train")
    os.makedirs(train, exist_ok=True)
    existing = len(os.listdir(train))
    if existing >= n:
        return
    rng = np.random.RandomState(0)
    for i in range(existing, n):
        img = rng.randint(0, 255, (size, 2 * size, 3), np.uint8)
        # smooth it a little so PNG compresses like a photo, not noise
        img = (img.astype(np.float32) + np.roll(img, 7, 0) + np.roll(img, 13, 1)) / 3
        Image.fromarray(img.astype(np.uint8)).save(
            os.path.join(train, f"{i:05d}.png")
        )
    print(f"dataset: {n} A|B pairs at {root}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/pairs_bench")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()

    make_dataset(args.root, args.n, args.size)

    import jax

    from tfcgan_tpu.config import get_experiment
    from tfcgan_tpu.data.pairs import PairedImageDataset, batch_iterator
    from tfcgan_tpu.data.prefetch import PrefetchLoader, device_prefetch
    from tfcgan_tpu.data.synth import synthetic_batch
    from tfcgan_tpu.recipes import build_recipe
    from tfcgan_tpu.train.trainer import Trainer

    cfg = get_experiment("fft_glo")
    cfg = cfg.replace(data=cfg.data.__class__(batch_size=args.batch,
                                              image_size=args.size))
    recipe = build_recipe(cfg)
    trainer = Trainer(cfg, recipe)
    ds = PairedImageDataset(args.root, "train", args.size)
    print(f"native loader: {ds._native is not None}")

    first = next(batch_iterator(ds, args.batch, epochs=1))
    state = trainer.init_state(jax.random.PRNGKey(0), first)
    step = trainer.compiled_step()
    from tfcgan_tpu.parallel.mesh import shard_batch

    def run(batches, label, n_steps):
        # warm (compile) outside the timed region
        nonlocal state
        state, m = step(state, next(iter([shard_batch(first, trainer.mesh)])))
        float(np.asarray(m["loss_G"]))
        t0 = time.perf_counter()
        it = iter(batches)
        last = None
        for _ in range(n_steps):
            b = next(it)
            if not all(isinstance(v, jax.Array) for v in b.values()):
                b = shard_batch(b, trainer.mesh)
            state, last = step(state, b)
        # force completion (block_until_ready lies on the axon tunnel)
        float(np.asarray(last["loss_G"]))
        dt = time.perf_counter() - t0
        rate = args.batch * n_steps / dt
        print(f"{label:>28}: {dt/n_steps*1e3:7.1f} ms/step  {rate:7.1f} img/s")
        return rate

    # device-resident reference rate: what the chip does when data is already
    # in HBM (bench.py's pool mode) — the bar every input path is judged by
    dev_batches = [shard_batch(synthetic_batch(batch_size=args.batch,
                                               image_size=args.size, seed=s),
                               trainer.mesh) for s in range(4)]
    r_device = run((dev_batches[i % 4] for i in range(args.steps)),
                   "device-resident pool", args.steps)

    # in-memory synthetic with per-step host->device transfer
    synth = [synthetic_batch(batch_size=args.batch, image_size=args.size, seed=s)
             for s in range(4)]
    r_synth = run((synth[i % 4] for i in range(args.steps)), "synthetic in-memory",
                  args.steps)

    r_sync = run(batch_iterator(ds, args.batch, seed=1), "files, sync loader",
                 args.steps)

    loader = PrefetchLoader(ds, args.batch, num_workers=args.workers, seed=1)
    r_async = run(device_prefetch(iter(loader), trainer.mesh),
                  f"files, {args.workers} workers + device prefetch", args.steps)

    # uint8 streaming: 4x smaller transfer, decode served from the RAM cache
    # after a warm pass (epoch >= 2 steady state)
    ds.enable_cache()
    for i in range(len(ds)):  # warm the decode cache (epoch-1 cost)
        ds._raw_pair(i)
    raw_loader = PrefetchLoader(ds, args.batch, num_workers=args.workers,
                                seed=1, raw=True)
    r_u8 = run(device_prefetch(iter(raw_loader), trainer.mesh, via_uint8=True),
               "files, cached uint8 stream", args.steps)

    # HBM-staged pool: decode once, zero host work per step (data/pool)
    from tfcgan_tpu.data.pool import DevicePool

    t0 = time.perf_counter()
    dpool = DevicePool(ds, trainer.mesh)
    stage_s = time.perf_counter() - t0
    print(f"pool staged in {stage_s:.1f}s ({len(ds)} pairs, cached decode)")
    r_pool = run(dpool.batches(args.batch, seed=1), "files, HBM-staged pool",
                 args.steps)

    # fused: assembly inside the train-step program (one dispatch per step)
    fused_step = trainer.compiled_pool_step(dpool)
    fused_state = trainer.init_state(jax.random.PRNGKey(1), first)
    idxs = dpool.index_batches(args.batch, seed=1)
    fused_state, m = fused_step(fused_state, next(idxs))  # compile
    float(np.asarray(m["loss_G"]))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        fused_state, m = fused_step(fused_state, next(idxs))
    float(np.asarray(m["loss_G"]))
    dt = time.perf_counter() - t0
    r_fused = args.batch * args.steps / dt
    print(f"{'files, pool FUSED step':>28}: {dt/args.steps*1e3:7.1f} ms/step  "
          f"{r_fused:7.1f} img/s")

    print(json.dumps({
        "img_per_s_device_pool_ref": round(r_device, 1),
        "img_per_s_synthetic": round(r_synth, 1),
        "img_per_s_files_sync": round(r_sync, 1),
        "img_per_s_files_async": round(r_async, 1),
        "img_per_s_files_uint8": round(r_u8, 1),
        "img_per_s_files_pool": round(r_pool, 1),
        "img_per_s_files_pool_fused": round(r_fused, 1),
        "pool_vs_device_ref": round(r_pool / r_device, 3),
        "fused_vs_device_ref": round(r_fused / r_device, 3),
        "pool_stage_seconds": round(stage_s, 1),
    }))


if __name__ == "__main__":
    main()
