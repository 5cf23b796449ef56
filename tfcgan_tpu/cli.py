"""Command-line interface.

One CLI replaces the reference's per-script argparse + bash launcher matrix
(``TFC-GAN-FFT/bash/*.sh``, SURVEY.md §5.6):

    python -m tfcgan_tpu.cli train --experiment fft_glo --data-root ... \
        --batch-size 32 --n-epochs 201
    python -m tfcgan_tpu.cli test  --experiment fft_glo --checkpoint ... \
        --data-root ... --out-dir results/
    python -m tfcgan_tpu.cli eval  --fake-dir ... --real-dir ... --out-csv ...
    python -m tfcgan_tpu.cli prep-combine --dir-a ... --dir-b ... --dir-ab ...
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def _cfg_from_args(args):
    import dataclasses

    from tfcgan_tpu.config import get_experiment

    cfg = get_experiment(args.experiment)
    # replace() so registry-set fields the CLI doesn't override (extra_roots,
    # channels, steps_per_epoch, ...) survive
    data = dataclasses.replace(
        cfg.data,
        root=args.data_root or cfg.data.root,
        batch_size=args.batch_size or cfg.data.batch_size,
        image_size=args.image_size or cfg.data.image_size,
        direction=args.direction or cfg.data.direction,
        num_workers=(cfg.data.num_workers if args.num_workers is None
                     else args.num_workers),
        staging=args.staging or cfg.data.staging,
    )
    train = dataclasses.replace(
        cfg.train,
        n_epochs=args.n_epochs or cfg.train.n_epochs,
        sample_interval=args.sample_interval or cfg.train.sample_interval,
        checkpoint_interval=args.checkpoint_interval or cfg.train.checkpoint_interval,
        compute_dtype=args.dtype or cfg.train.compute_dtype,
        checkpoint_dir=args.out_dir or cfg.train.checkpoint_dir,
        log_dir=os.path.join(args.out_dir or ".", "logs"),
    )
    return cfg.replace(data=data, train=train)


def cmd_train(args):
    from tfcgan_tpu.data.pairs import PairedImageDataset, batch_iterator
    from tfcgan_tpu.recipes import build_recipe
    from tfcgan_tpu.train.log import JsonlLogger
    from tfcgan_tpu.train.trainer import Trainer

    from tfcgan_tpu.data.mixture import BalancedMixture
    from tfcgan_tpu.train.checkpoint import restore_checkpoint

    cfg = _cfg_from_args(args)
    recipe = build_recipe(cfg)
    roots = [cfg.data.root, *(args.extra_root or cfg.data.extra_roots or [])]
    roots = [r for r in roots if r]
    if cfg.extra.get("needs_extra_root") and len(roots) < 2:
        raise SystemExit(
            f"experiment {cfg.name!r} trains a balanced two-dataset mixture "
            f"(favtgan_..._TripTemp_ED.py:349-374): pass the second dataset "
            f"via --extra-root <path>"
        )
    labels = None
    if cfg.loss.conditional and getattr(args, "annots", None):
        from tfcgan_tpu.data.pairs import load_annotations_csv

        labels = load_annotations_csv(args.annots, label_cols=(1, 2, 3))
    datasets = [
        PairedImageDataset(r, "train", cfg.data.image_size, cfg.data.direction,
                           labels=labels)
        for r in roots
    ]
    steps_per_epoch = min(len(d) for d in datasets) // cfg.data.batch_size
    logger = JsonlLogger(os.path.join(cfg.train.log_dir, f"{cfg.name}.jsonl"))
    trainer = Trainer(cfg, recipe, logger=logger)
    staged = False  # True when `it` already yields device-placed batches
    pool = None  # set on the HBM-staged path; fit() then fuses assembly
    if len(datasets) > 1:
        # balanced multi-dataset training (favtgan ED/EA, SURVEY §2.8)
        it = BalancedMixture(
            [
                (lambda d=d: batch_iterator(d, cfg.data.batch_size // len(datasets),
                                            seed=cfg.train.seed, epochs=1))
                for d in datasets
            ],
            cfg.data.batch_size, seed=cfg.train.seed,
        )
    else:
        staging = cfg.data.staging
        est = len(datasets[0]) * cfg.data.image_size ** 2 * 6  # A+B uint8 bytes
        if staging == "auto":
            staging = "pool" if est < (2 << 30) else "stream"
        if staging == "pool":
            # HBM-staged uint8 pool; batch assembly fused into the train-step
            # program (one dispatch per step, data/pool + Trainer.fit(pool=))
            from tfcgan_tpu.data.pool import DevicePool

            pool = DevicePool(datasets[0], trainer.mesh, log_every=500)
            it = pool.index_batches(cfg.data.batch_size, seed=cfg.train.seed)
            staged = True
        elif cfg.data.num_workers > 0:
            # threaded uint8 streaming (reference DataLoader analogue), with
            # device-side normalize and double-buffered placement
            from tfcgan_tpu.data.prefetch import PrefetchLoader, device_prefetch

            if est < (2 << 30):  # decode once, serve epochs >= 2 from RAM
                datasets[0].enable_cache()
            loader = PrefetchLoader(datasets[0], cfg.data.batch_size,
                                    num_workers=cfg.data.num_workers,
                                    seed=cfg.train.seed, raw=True)
            it = device_prefetch(iter(loader), trainer.mesh, via_uint8=True)
            staged = True
        else:
            it = batch_iterator(datasets[0], cfg.data.batch_size,
                                seed=cfg.train.seed)
    first = next(it)
    init_batch = pool.batch(first) if pool is not None else first
    state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed), init_batch)
    from tfcgan_tpu.train.profiling import count_params

    print(f"G params: {count_params(state.g_params):,} | "
          f"D params: {count_params(state.d_params):,} | "
          f"devices: {jax.device_count()} mesh={trainer.mesh.shape}")
    if args.resume:
        state = restore_checkpoint(args.resume, jax.device_get(state))
        print(f"resumed from {args.resume} at step {int(state.step)}")
    else:
        state = trainer.fit(state, [first], pool=pool)  # step 0

    # training-time visual smoke test (the reference's sample_images):
    # generate on a fixed test batch every sample_interval steps
    sample_hook = None
    try:
        test_ds = PairedImageDataset(
            cfg.data.root, "test", cfg.data.image_size, cfg.data.direction
        )
        sample_batch = next(batch_iterator(test_ds, min(4, len(test_ds)),
                                           shuffle=False, epochs=1))
        sample_dir = os.path.join(args.out_dir or ".", "samples")

        def sample_hook(state, step):
            from tfcgan_tpu.infer import Inferencer

            inf = Inferencer(cfg, recipe, jax.device_get(state.g_params))
            out = inf(sample_batch)
            from tfcgan_tpu.evaluation.suite import save_image_grid
            import numpy as _np

            imgs = out["fake_B"] if isinstance(out, dict) else out
            stack = [
                _np.concatenate([sample_batch["A"][i], _np.asarray(imgs)[i],
                                 sample_batch["B"][i]], axis=0)
                for i in range(sample_batch["A"].shape[0])
            ]
            save_image_grid(stack, os.path.join(sample_dir, f"{step:07d}.png"), axis=1)
            from tfcgan_tpu.evaluation.gallery import write_gallery

            write_gallery(sample_dir, title=cfg.name)
    except FileNotFoundError:
        pass  # no test split — skip sampling

    # weight/grad histogram logging (nemar/util/tb_visualizer.py parity)
    hist_logger = None
    if getattr(args, "hist_every", 0):
        from tfcgan_tpu.train.histograms import HistogramLogger

        hist_logger = HistogramLogger(
            os.path.join(args.out_dir or ".", "hists.jsonl"))

    from tfcgan_tpu.train.checkpoint import AsyncCheckpointManager

    ckpt_mgr = AsyncCheckpointManager(cfg.train.checkpoint_dir)

    # metric-driven LR (NeMAR 'plateau'): step once per epoch on loss_G
    plateau = None
    if cfg.optim.schedule == "plateau":
        from tfcgan_tpu.train.state import ReduceLROnPlateau, set_learning_rate

        plateau = ReduceLROnPlateau(cfg.optim.lr)

    if not staged:
        # overlap host->device transfer with the running step (double buffer)
        from tfcgan_tpu.data.prefetch import device_prefetch

        it = device_prefetch(it, trainer.mesh)
    for epoch in range(cfg.train.n_epochs):
        state = trainer.fit(state, it, num_steps=steps_per_epoch, check_finite=True,
                            sample_hook=sample_hook, hist_logger=hist_logger,
                            hist_every=getattr(args, "hist_every", 0),
                            pool=pool)
        if plateau is not None and trainer.last_metrics is not None:
            lr = plateau.step(float(trainer.last_metrics["loss_G"]))
            state = set_learning_rate(state, lr)
        if cfg.train.checkpoint_interval > 0 and epoch % cfg.train.checkpoint_interval == 0:
            path = ckpt_mgr.save(state)  # async: IO overlaps the next epoch
            print(f"\n[epoch {epoch}] checkpoint -> {path}")
    ckpt_mgr.save(state)
    ckpt_mgr.close()
    if hist_logger is not None:
        from tfcgan_tpu.train.histograms import write_histogram_html

        hist_logger.close()
        print(f"\nhistograms -> {write_histogram_html(hist_logger.path)}")


def cmd_test(args):
    from tfcgan_tpu.data.pairs import PairedImageDataset, batch_iterator
    from tfcgan_tpu.infer import Inferencer
    from tfcgan_tpu.recipes import build_recipe
    from tfcgan_tpu.train.checkpoint import restore_checkpoint
    from tfcgan_tpu.train.trainer import Trainer

    cfg = _cfg_from_args(args)
    recipe = build_recipe(cfg)
    ds = PairedImageDataset(cfg.data.root, "test", cfg.data.image_size, cfg.data.direction)
    trainer = Trainer(cfg, recipe)
    # template defines only the state pytree structure; batch size just has to
    # divide the mesh, so use a synthetic batch of device_count
    from tfcgan_tpu.data.synth import synthetic_batch

    first = synthetic_batch(
        batch_size=jax.device_count(), image_size=cfg.data.image_size,
        with_labels=cfg.loss.conditional,
    )
    template = trainer.init_state(jax.random.PRNGKey(0), first)
    state = restore_checkpoint(args.checkpoint, jax.device_get(template))
    inf = Inferencer(cfg, recipe, state.g_params, mesh=trainer.mesh)
    # drop_last=False: inference must cover EVERY test image (the reference
    # runs batch 1); ragged final batches are pad-and-trimmed to the mesh.
    n = inf.run_test_set(
        batch_iterator(ds, args.batch_size or 8, shuffle=False, epochs=1,
                       drop_last=False),
        args.out_dir, save_spectra=args.spectra,
    )
    print(f"wrote {n} stacks to {args.out_dir}")


def cmd_gen(args):
    """Diffusion sampling (the ``test_prototype*.py`` path, fully on device)."""
    from tfcgan_tpu.data.pairs import PairedImageDataset, batch_iterator
    from tfcgan_tpu.data.synth import synthetic_batch
    from tfcgan_tpu.evaluation.suite import save_image_grid
    from tfcgan_tpu.recipes import build_recipe
    from tfcgan_tpu.train.checkpoint import restore_checkpoint
    from tfcgan_tpu.train.trainer import Trainer

    cfg = _cfg_from_args(args)
    assert cfg.recipe == "diffusion", "gen is for diffusion experiments"
    recipe = build_recipe(cfg)
    trainer = Trainer(cfg, recipe)
    first = synthetic_batch(batch_size=jax.device_count(),
                            image_size=cfg.data.image_size, with_labels=True)
    template = trainer.init_state(jax.random.PRNGKey(0), first)
    state = restore_checkpoint(args.checkpoint, jax.device_get(template))
    ds = PairedImageDataset(cfg.data.root, "test", cfg.data.image_size, cfg.data.direction)
    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for batch in batch_iterator(ds, args.batch_size or 4, shuffle=False, epochs=1,
                                drop_last=False):
        if "LAB" not in batch:
            batch["LAB"] = np.zeros((batch["A"].shape[0],), np.int32)
        out = np.asarray(recipe.sample(state.g_params, batch,
                                       jax.random.PRNGKey(args.seed)))
        for i in range(out.shape[0]):
            img = out[i].repeat(3, -1) if out.shape[-1] == 1 else out[i]
            a = batch["A"][i]
            save_image_grid([a, img], os.path.join(args.out_dir, f"{n:05d}.png"))
            n += 1
    print(f"sampled {n} images -> {args.out_dir}")


def cmd_eval(args):
    from tfcgan_tpu.evaluation.suite import evaluate_dirs

    df = evaluate_dirs(args.fake_dir, args.real_dir, None)
    if getattr(args, "iqa", None):
        # NR-IQA stage of the reference protocol: one score per image for
        # fake_B AND real_B dirs (eval/Devcom/IQA.sh:13-28 runs each model
        # with -i fake_B -r real_B).
        from tfcgan_tpu.evaluation.iqa import compute_iqa
        from tfcgan_tpu.evaluation.suite import _load_dir

        metrics = tuple(m.strip() for m in args.iqa.split(","))
        _, fk = _load_dir(args.fake_dir)
        _, rl = _load_dir(args.real_dir)
        for tag, imgs in (("fake", fk), ("real", rl)):
            for m, v in compute_iqa(list(imgs), metrics).items():
                df[f"{m}_{tag}"] = v
    if args.out_csv:
        df.to_csv(args.out_csv, index=False)
    means = df.drop(columns=["file"]).mean()
    print(means.to_string())


def cmd_eval_reg(args):
    """STN registration eval: SSIM/NCC/MI before vs after
    (``TFC-STN/evaluation/calc_*.py``) over real_A/real_B/reg_B dirs."""
    import jax.numpy as jnp
    import pandas as pd

    from tfcgan_tpu.evaluation.suite import _load_dir, registration_metrics

    files, a = _load_dir(args.real_a_dir)
    fb, b = _load_dir(args.real_b_dir)
    fr, rb = _load_dir(args.reg_b_dir)
    assert len(files) == len(fb) == len(fr), (
        f"directory size mismatch: real_A={len(files)} real_B={len(fb)} "
        f"reg_B={len(fr)}"
    )
    to = lambda x: jnp.asarray(x / 127.5 - 1.0)
    m = {k: np.asarray(v) for k, v in registration_metrics(to(a), to(b), to(rb)).items()}
    df = pd.DataFrame({"file": files, **m})
    if args.out_csv:
        df.to_csv(args.out_csv, index=False)
    if getattr(args, "plots_dir", None):
        from tfcgan_tpu.evaluation.suite import difference_plot

        for i, f in enumerate(files):
            stem = os.path.splitext(f)[0]
            difference_plot(a[i] / 127.5 - 1, b[i] / 127.5 - 1, rb[i] / 127.5 - 1,
                            os.path.join(args.plots_dir, f"{stem}.png"))
        print(f"difference plots -> {args.plots_dir}")
    print(df.drop(columns=["file"]).mean().to_string())


def cmd_prep_combine(args):
    from tfcgan_tpu.data.prep import combine_a_and_b

    n = combine_a_and_b(args.dir_a, args.dir_b, args.dir_ab)
    print(f"combined {n} pairs -> {args.dir_ab}")


def cmd_prep_crop(args):
    from tfcgan_tpu.data.prep import crop_stacks

    n = crop_stacks(args.stack_dir, args.out_root, args.roles.split(","))
    print(f"cropped {n} stacks -> {args.out_root}")


def cmd_prep_morphs(args):
    """Morphological-gradient views for qualitative registration eval.

    Reconstructs the `morph_plots.py` that `TFC-STN/evaluation/make_morphs.sh:3`
    invokes but which is MISSING from the reference repo (same situation as
    cyclegan's absent utils.py): renders m(x) = 1 − morphological_gradient(x)
    — the exact map the STN's morph triplet trains on
    (`TFCGAN_STN21_Original_NewModel3_Official.py:444-459`) — for every PNG
    in a directory, so registered/unregistered edge structure can be
    compared by eye."""
    import jax.numpy as jnp
    from PIL import Image

    from tfcgan_tpu import ops

    os.makedirs(args.out_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(args.in_dir) if f.endswith(".png"))
    for f in files:
        img = np.asarray(Image.open(os.path.join(args.in_dir, f)).convert("RGB"))
        x = jnp.asarray(img[None], jnp.float32) / 127.5 - 1.0
        m = 1.0 - ops.morphological_gradient(x)
        u8 = np.clip((np.asarray(m)[0] * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(u8).save(os.path.join(args.out_dir, f))
    print(f"morph plots for {len(files)} images -> {args.out_dir}")


def cmd_gallery(args):
    from tfcgan_tpu.evaluation.gallery import write_gallery

    path = write_gallery(args.dir, title=args.title)
    print(f"gallery -> {path}")


def cmd_mesh(args):
    from tfcgan_tpu.evaluation.face_mesh import overlay_directory

    n = overlay_directory(args.src_dir, args.out_dir)
    print(f"annotated {n} faces -> {args.out_dir}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="tfcgan_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    # --cpu pins the metric math to the host backend. Host-only commands
    # (eval / eval-reg / prep-*) have no reason to depend on the TPU tunnel,
    # whose first-op latency and back-to-back-client wedges are documented
    # platform hazards; JAX_PLATFORMS as an env var does not stick here
    # (a sitecustomize registers the TPU plugin), so the flag goes through
    # jax.config.update before the first backend use.
    hostable = argparse.ArgumentParser(add_help=False)
    hostable.add_argument("--cpu", action="store_true",
                          help="run on the host CPU backend (skip the TPU "
                               "tunnel; eval/prep commands only need jnp)")

    common = argparse.ArgumentParser(add_help=False, parents=[hostable])
    common.add_argument("--experiment", default="fft_glo")
    common.add_argument("--data-root", default=None)
    common.add_argument("--batch-size", type=int, default=None)
    common.add_argument("--image-size", type=int, default=None)
    common.add_argument("--n-epochs", type=int, default=None)
    common.add_argument("--checkpoint-interval", type=int, default=None)
    common.add_argument("--sample-interval", type=int, default=None)
    common.add_argument("--direction", default=None, choices=[None, "AtoB", "BtoA"])
    common.add_argument("--num-workers", type=int, default=None,
                        help="decode threads for the streaming input path")
    common.add_argument("--staging", default=None,
                        choices=[None, "auto", "pool", "stream"],
                        help="input staging: HBM-resident uint8 pool vs "
                             "threaded uint8 streaming (data/pool.py)")
    common.add_argument("--dtype", default=None, choices=[None, "bfloat16", "float32"])
    common.add_argument("--out-dir", default="runs")
    common.add_argument("--annots", default=None,
                        help="annotations CSV for the debiased family "
                             "(file,gender,ethn,age columns — datasets_temp_Debias.py)")

    sp = sub.add_parser("train", parents=[common])
    sp.add_argument("--resume", default=None, help="checkpoint path to resume from")
    sp.add_argument("--hist-every", type=int, default=0,
                    help="log weight+grad histograms every N steps to "
                         "<out-dir>/hists.jsonl (0 = off); render with "
                         "train.histograms.write_histogram_html")
    sp.add_argument("--extra-root", action="append", default=None,
                    help="additional dataset root(s) for balanced mixtures")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("test", parents=[common])
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--spectra", action="store_true")
    sp.set_defaults(fn=cmd_test)

    sp = sub.add_parser("gen", parents=[common])
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_gen)

    sp = sub.add_parser("eval", parents=[hostable])
    sp.add_argument("--fake-dir", required=True)
    sp.add_argument("--real-dir", required=True)
    sp.add_argument("--out-csv", default=None)
    sp.add_argument(
        "--iqa", default=None, metavar="METRICS",
        help="comma-separated NR-IQA metrics over both dirs (niqe,maniqa,"
             "dbcnn) — the IQA.sh stage of the reference eval protocol",
    )
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser("prep-morphs", parents=[hostable])
    sp.add_argument("--in-dir", required=True)
    sp.add_argument("--out-dir", required=True)
    sp.set_defaults(fn=cmd_prep_morphs)

    sp = sub.add_parser("eval-reg", parents=[hostable])
    sp.add_argument("--real-a-dir", required=True)
    sp.add_argument("--real-b-dir", required=True)
    sp.add_argument("--reg-b-dir", required=True)
    sp.add_argument("--out-csv", default=None)
    sp.add_argument("--plots-dir", default=None,
                    help="emit 5-panel before/after difference plots")
    sp.set_defaults(fn=cmd_eval_reg)

    sp = sub.add_parser("prep-combine", parents=[hostable])
    sp.add_argument("--dir-a", required=True)
    sp.add_argument("--dir-b", required=True)
    sp.add_argument("--dir-ab", required=True)
    sp.set_defaults(fn=cmd_prep_combine)

    sp = sub.add_parser("prep-crop", parents=[hostable])
    sp.add_argument("--stack-dir", required=True)
    sp.add_argument("--out-root", required=True)
    sp.add_argument("--roles", default="real_A,fake_B,real_B")
    sp.set_defaults(fn=cmd_prep_crop)

    sp = sub.add_parser("mesh", parents=[hostable], help="face-landmark overlays (TFC-STN/mesh.py)")
    sp.add_argument("--src-dir", required=True)
    sp.add_argument("--out-dir", required=True)
    sp.set_defaults(fn=cmd_mesh)

    sp = sub.add_parser("gallery", parents=[hostable], help="index.html over a sample/eval dir "
                                        "(nemar/util/visualizer.py analogue)")
    sp.add_argument("--dir", required=True)
    sp.add_argument("--title", default=None)
    sp.set_defaults(fn=cmd_gallery)

    args = p.parse_args(argv)
    if getattr(args, "cpu", False) or os.environ.get("TFCGAN_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    args.fn(args)


if __name__ == "__main__":
    main()
