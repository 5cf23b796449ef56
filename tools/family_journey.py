"""Bounded on-chip learning journey for one recipe family.

VERDICT r4 weak #4: cyclegan / thermalgan / nemar / tfc_diff had torch
lockstep parity + one finite on-chip step, but no evidence that loss
actually descends and samples improve over hundreds of steps. This runs a
short real training journey per family on synthetic scenes (canonical
update order, bf16, one TPU chip), records a trajectory (losses + one task
metric on a held-out batch) to ``tools/artifacts/<family>_journey.json``
and a sample grid PNG next to it.

Tunnel hygiene (CLAUDE.md): one process per family, data pool transferred
ONCE (~few MB), flushed elapsed-stamped prints, run under ``timeout``.

  python tools/family_journey.py --family cyclegan

Reference train loops being evidenced: cyclegan_og/cyclegan.py:380-430,
ThermalGAN/ThermalGAN_noAMP.py:700-800, nemar/train.py:28-81,
TFC-Diff/prototype_condA.py:143-166.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_T0 = time.monotonic()


def say(msg):
    print(f"journey [{time.monotonic() - _T0:6.0f}s] {msg}", flush=True)


def _psnr(x, y):
    mse = float(np.mean((np.asarray(x, np.float64) - np.asarray(y, np.float64)) ** 2))
    return 10.0 * np.log10(4.0 / max(mse, 1e-12))  # [-1,1] range -> peak 2


def _ncc(x, y):
    x = np.asarray(x, np.float64).reshape(x.shape[0], -1)
    y = np.asarray(y, np.float64).reshape(y.shape[0], -1)
    x = x - x.mean(1, keepdims=True)
    y = y - y.mean(1, keepdims=True)
    denom = np.sqrt((x**2).sum(1) * (y**2).sum(1)) + 1e-12
    return float(((x * y).sum(1) / denom).mean())


def _scene_pairs(n, size, seed, misalign=False):
    """Visible/thermal face-scene pairs (aligned unless ``misalign``)."""
    from tfcgan_tpu.data.synth import synthetic_registration_batch

    kw = {} if misalign else {"max_translate": 0.0, "max_rotate": 0.0}
    return synthetic_registration_batch(n, size, seed=seed, **kw)


def _gt_warped_a(batch_a, theta):
    """A warped by the ground-truth misalignment theta (the exact torch
    grid_sample that produced B from B_aligned in data/synth)."""
    import torch
    import torch.nn.functional as F

    src = torch.from_numpy(np.asarray(batch_a)).permute(0, 3, 1, 2)
    grid = F.affine_grid(torch.from_numpy(theta), src.shape, align_corners=False)
    out = F.grid_sample(src, grid, mode="bilinear", padding_mode="border",
                        align_corners=False)
    return out.permute(0, 2, 3, 1).numpy()


FAMILIES = {
    "cyclegan": dict(experiment="cyclegan", size=128, batch=16, steps=600, interval=50),
    "thermalgan": dict(experiment="thermalgan", size=256, batch=8, steps=600, interval=50),
    "nemar": dict(experiment="nemar", size=128, batch=16, steps=600, interval=50),
    "tfc_diff": dict(experiment="tfc_diff", size=128, batch=16, steps=800, interval=50),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True, choices=sorted(FAMILIES))
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts"))
    args = ap.parse_args()
    spec = FAMILIES[args.family]
    steps = args.steps or spec["steps"]
    size, bs, interval = spec["size"], spec["batch"], spec["interval"]

    import jax
    import jax.numpy as jnp

    from tfcgan_tpu.config import get_experiment
    from tfcgan_tpu.data.synth import synthetic_batch
    from tfcgan_tpu.evaluation.suite import save_image_grid
    from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
    from tfcgan_tpu.recipes import build_recipe
    from tfcgan_tpu.train.trainer import Trainer

    say(f"{args.family}: devices={jax.devices()} steps={steps} b{bs}@{size}^2")
    cfg = get_experiment(spec["experiment"])
    cfg = cfg.replace(
        data=cfg.data.__class__(batch_size=bs, image_size=size),
        train=cfg.train.__class__(compute_dtype="bfloat16"),
    )
    recipe = build_recipe(cfg)
    trainer = Trainer(cfg, recipe, mesh=make_mesh())

    # --- data: a fixed 4-batch pool + 1 held-out batch, device-staged once.
    misalign = args.family == "nemar"
    pool_host, held_truth = [], None
    if args.family == "tfc_diff":
        for i in range(4):
            pool_host.append(synthetic_batch(bs, size, seed=i + 1, with_labels=True))
        held = synthetic_batch(bs, size, seed=99, with_labels=True)
    else:
        for i in range(4):
            pool_host.append(_scene_pairs(bs, size, seed=i + 1, misalign=misalign)[0])
        held, held_truth = _scene_pairs(bs, size, seed=99, misalign=misalign)
    pool = [shard_batch(b, trainer.mesh) for b in pool_host]
    held_dev = shard_batch(held, trainer.mesh)
    say("data pool staged on device")

    state = trainer.init_state(jax.random.PRNGKey(0), pool_host[0])
    step = trainer.compiled_step()

    # --- per-family held-out task metric -----------------------------------
    if args.family == "cyclegan":
        @jax.jit
        def task_fn(gp, b):
            fb = recipe.G_AB.apply({"params": gp["G_AB"]}, b["A"])
            fa = recipe.G_BA.apply({"params": gp["G_BA"]}, b["B"])
            return {"fake_B": fb, "fake_A": fa,
                    "cyc_A": recipe.G_BA.apply({"params": gp["G_BA"]}, fb),
                    "cyc_B": recipe.G_AB.apply({"params": gp["G_AB"]}, fa)}

        def task(gp):
            o = jax.device_get(task_fn(gp, held_dev))
            return {"cycle_psnr": 0.5 * (_psnr(o["cyc_A"], held["A"])
                                         + _psnr(o["cyc_B"], held["B"])),
                    "fakeB_psnr": _psnr(o["fake_B"], held["B"])}, o
    elif args.family == "thermalgan":
        from tfcgan_tpu.models.thermalgan import normalized_temps

        @jax.jit
        def task_fn(gp, b):
            fs = recipe.G1.apply({"params": gp["G1"]}, b["A"],
                                 normalized_temps(b["T_B"]))
            return {"fake_S": fs,
                    "fake_B": recipe.G2.apply({"params": gp["G2"]}, fs,
                                              deterministic=True)}

        def task(gp):
            o = jax.device_get(task_fn(gp, held_dev))
            return {"fakeB_psnr": _psnr(o["fake_B"], held["B"]),
                    "fakeB_l1": float(np.mean(np.abs(
                        np.asarray(o["fake_B"], np.float64) - held["B"])))}, o
    elif args.family == "nemar":
        a_gt = _gt_warped_a(held["A"], held_truth["theta"])

        @jax.jit
        def task_fn(gp, b):
            t = lambda x: recipe.T.apply({"params": gp["T"]}, x)
            fb = t(b["A"])
            warped, _ = recipe.R.apply({"params": gp["R"]}, b["A"], b["B"],
                                       apply_on=[b["A"], fb])
            return {"reg_A": warped[0], "fake_RT_B": warped[1],
                    "fake_TR_B": t(warped[0]), "fake_B": fb}

        def task(gp):
            o = jax.device_get(task_fn(gp, held_dev))
            return {"reg_ncc_gt": _ncc(o["reg_A"], a_gt),
                    "reg_ncc_init": _ncc(held["A"], a_gt),
                    "fakeTRB_psnr": _psnr(o["fake_TR_B"], held["B"])}, o
    else:  # tfc_diff
        @jax.jit
        def diff_mse(gp, dp, frozen):
            # held-out noise-prediction MSE at fixed timesteps/noise
            _, (_, m) = recipe.g_loss(gp, dp, {}, frozen, held_dev,
                                      jax.random.PRNGKey(7))
            return m["g_noise_mse"]

        def task(gp):
            v = float(np.asarray(diff_mse(gp, state.d_params, state.frozen)))
            return {"held_noise_mse": v}, None

    history = []
    for i in range(steps):
        state, m = step(state, pool[i % len(pool)])
        if (i + 1) % interval == 0 or i == 0:
            lg = float(np.asarray(m["loss_G"]))
            ld = float(np.asarray(m.get("loss_D", np.nan)))
            # params stay device-resident: re-uploading them per eval would
            # pay the tunnel's host->device tax every interval
            tm, _ = task(state.g_params)
            row = {"step": i + 1, "loss_G": lg, "loss_D": ld, **tm}
            history.append(row)
            say(" ".join(f"{k}={v:.4f}" for k, v in row.items()))
            assert np.isfinite(lg), row

    os.makedirs(args.out_dir, exist_ok=True)
    # --- sample artifact ---------------------------------------------------
    sample_path = os.path.join(args.out_dir, f"{args.family}_journey_sample.png")
    if args.family == "tfc_diff":
        say("sampling (ancestral chain on device) ...")
        small = {k: (v[:4] if hasattr(v, "shape") and v.shape[:1] == (bs,) else v)
                 for k, v in held.items()}
        out = np.asarray(recipe.sample(state.g_params, shard_batch(small, trainer.mesh),
                                       jax.random.PRNGKey(11)))
        out3 = out.repeat(3, -1) if out.shape[-1] == 1 else out
        save_image_grid([held["A"][0], out3[0], held["B"][0]], sample_path)
        extra = {"sample_psnr_vs_B": _psnr(out3, held["B"][:4])}
    else:
        tm, o = task(state.g_params)
        keys = {"cyclegan": ["fake_B", "fake_A", "cyc_A"],
                "thermalgan": ["fake_S", "fake_B"],
                "nemar": ["reg_A", "fake_B", "fake_TR_B"]}[args.family]

        def rgb(x):
            x = np.asarray(x, np.float32)
            return x.repeat(3, -1) if x.shape[-1] == 1 else x

        save_image_grid([held["A"][0]] + [rgb(o[k][0]) for k in keys]
                        + [held["B"][0]], sample_path)
        extra = {}

    rec = {
        "what": f"{args.family} on-chip learning journey (tools/family_journey.py)",
        "platform": str(jax.devices()[0].platform),
        "config": {"experiment": spec["experiment"], "steps": steps,
                   "batch": bs, "image_size": size,
                   "scene": "procedural visible/thermal face pairs"
                            + (" (misaligned)" if misalign else "")},
        "history": history,
        **extra,
    }
    out_json = os.path.join(args.out_dir, f"{args.family}_journey.json")
    with open(out_json, "w") as f:
        json.dump(rec, f, indent=1)
    say(f"wrote {out_json} + {sample_path}")


if __name__ == "__main__":
    main()
