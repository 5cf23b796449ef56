"""Inference ("serve") path.

Replaces the reference's per-trainer ``test_*.py`` scripts (rebuild model,
strip DataParallel ``module.`` prefixes, loop at batch 1 —
``test_TFCGAN.py:125-218``): here inference restores the unified checkpoint,
jits the generator once, and streams batches producing the same stacked PNGs
(real_A | fake_B | real_B vertically) plus optional per-patch grids.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from tfcgan_tpu.config import ExperimentConfig
from tfcgan_tpu.evaluation.suite import save_image_grid
from tfcgan_tpu.ops.fftloss import fft_log_magnitude


class Inferencer:
    """Jitted eval-mode generation for any recipe exposing its generator.

    With ``mesh`` (any 1-D/2-D device mesh from ``parallel.make_mesh``) the
    serve path is data-parallel: params are replicated once, every batch is
    sharded over the mesh's data axis, and ragged batches are pad-and-trimmed
    so throughput scales with chip count — the multi-chip replacement for the
    reference's batch-1 DataParallel test scripts (``test_TFCGAN.py:186-218``).
    """

    def __init__(self, cfg: ExperimentConfig, recipe, g_params, mesh=None):
        self.cfg = cfg
        self.recipe = recipe
        self.mesh = mesh
        if mesh is not None:
            from tfcgan_tpu.parallel.mesh import replicated_sharding

            g_params = jax.device_put(g_params, replicated_sharding(mesh))
        self.g_params = g_params
        name = cfg.recipe
        if name == "tfcgan":
            self._fn = jax.jit(
                lambda p, batch: recipe.G.apply(
                    {"params": p["G"]}, recipe._g_input(batch),
                    deterministic=True)
                if not cfg.loss.conditional
                else recipe.G.apply(
                    {"params": p["G"]}, batch["A"],
                    batch["LAB3"].astype(jnp.float32),
                    deterministic=True,
                )
            )
        elif name == "stn":
            def stn_fn(p, batch):
                a, b = batch["A"], batch["B"]
                fake_b = recipe.G1.apply({"params": p["G1"]}, a, deterministic=True)
                fake_a1 = recipe.G2.apply({"params": p["G2"]}, b, deterministic=True)
                cond = fake_b if recipe.stn_condition == "fake_B" else fake_a1
                warped_b = recipe.STN.apply({"params": p["STN"]}, a, cond, b)
                fake_a2 = recipe.G2.apply({"params": p["G2"]}, warped_b, deterministic=True)
                return {"fake_B": fake_b, "fake_A1": fake_a1,
                        "warped_B": warped_b, "fake_A2": fake_a2}
            self._fn = jax.jit(stn_fn)
        elif name == "cyclegan":
            # Both translation legs, per the reference sample grid
            # real_A | fake_B | real_B | fake_A (cyclegan_og/cyclegan.py:327-342).
            def cg_fn(p, batch):
                return {
                    "fake_B": recipe.G_AB.apply({"params": p["G_AB"]}, batch["A"]),
                    "fake_A": recipe.G_BA.apply({"params": p["G_BA"]}, batch["B"]),
                }
            self._fn = jax.jit(cg_fn)
        elif name == "nemar":
            # NeMAR test-mode forward (nemar/test.py:1-60 runs model.test() →
            # nemar_model.forward():161-173; visual_names:74-87): fake_B=T(A),
            # [registered_A, fake_RT_B]=R(A,B,apply_on=[A,fake_B]),
            # fake_TR_B=T(registered_A).
            def nm_fn(p, batch):
                a, b = batch["A"], batch["B"]
                t = lambda x: recipe.T.apply({"params": p["T"]}, x)
                fake_b = t(a)
                warped, _ = recipe.R.apply(
                    {"params": p["R"]}, a, b, apply_on=[a, fake_b]
                )
                reg_a, fake_rt_b = warped
                return {"registered_A": reg_a, "fake_B": fake_b,
                        "fake_TR_B": t(reg_a), "fake_RT_B": fake_rt_b}
            self._fn = jax.jit(nm_fn)
        elif name == "thermalgan":
            def tg_fn(p, batch):
                from tfcgan_tpu.models.thermalgan import normalized_temps
                fake_s = recipe.G1.apply({"params": p["G1"]}, batch["A"],
                                         normalized_temps(batch["T_B"]))
                return recipe.G2.apply({"params": p["G2"]}, fake_s, deterministic=True)
            self._fn = jax.jit(tg_fn)
        else:
            raise ValueError(f"no inference path for recipe {name!r}")

    def __call__(self, batch):
        if self.cfg.recipe == "tfcgan" and self.cfg.loss.conditional and "LAB3" not in batch:
            # unlabeled test dirs: all-zero (gender, ethn, age) condition
            batch = {**batch, "LAB3": np.zeros((batch["A"].shape[0], 3), np.int32)}
        if self.mesh is None:
            return self._fn(self.g_params, {k: jnp.asarray(v) for k, v in batch.items()})
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = int(np.asarray(batch["A"]).shape[0])
        nd = self.mesh.shape["data"]
        pad = (-n) % nd
        dev = {}
        for k, v in batch.items():
            v = np.asarray(v)
            if pad:
                v = np.concatenate([v, np.repeat(v[:1], pad, axis=0)])
            sh = NamedSharding(self.mesh, P("data", *([None] * (v.ndim - 1))))
            dev[k] = jax.device_put(jnp.asarray(v), sh)
        out = self._fn(self.g_params, dev)
        return jax.tree.map(lambda x: x[:n], out) if pad else out

    def run_test_set(
        self, batches, out_dir: str, save_spectra: bool = False,
        save_patches: int = 0,
    ) -> int:
        """Emit the reference-style stacked PNGs; returns images written.

        ``save_patches=grid`` additionally writes per-patch fake/real grids
        (``test_TFCGAN_16Patches.py:221-270``) into ``patches/``.
        """
        from tfcgan_tpu.ops.patches import patchify

        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for batch in batches:
            out = self(batch)
            if not isinstance(out, dict):
                stacks = [batch["A"], out, batch["B"]]
            elif "warped_B" in out:  # STN: 6-image stack layout (:332-346)
                stacks = [batch["A"], batch["B"], out["warped_B"],
                          out["fake_A1"], out["fake_A2"], out["fake_B"]]
            elif "registered_A" in out:
                # NeMAR visual_names order (nemar_model.py:74-87); crop with
                # --roles real_A,real_B,reg_A,fake_B,fake_TR_B,fake_RT_B then
                # eval-reg over (real_B, real_A, reg_A): netR warps A onto B.
                stacks = [batch["A"], batch["B"], out["registered_A"],
                          out["fake_B"], out["fake_TR_B"], out["fake_RT_B"]]
            else:  # CycleGAN: real_A|fake_B|real_B|fake_A (cyclegan.py:342)
                stacks = [batch["A"], out["fake_B"], batch["B"], out["fake_A"]]
            stacks = [np.asarray(s) for s in stacks]
            for i in range(stacks[0].shape[0]):
                save_image_grid(
                    [s[i] for s in stacks], os.path.join(out_dir, f"{n:05d}.png")
                )
                if save_spectra and not isinstance(out, dict):
                    spec_f = np.asarray(fft_log_magnitude(jnp.asarray(out[i][None])))[0]
                    spec_r = np.asarray(fft_log_magnitude(jnp.asarray(batch["B"][i][None])))[0]
                    lo, hi = min(spec_f.min(), spec_r.min()), max(spec_f.max(), spec_r.max())
                    norm = lambda s: ((s - lo) / max(hi - lo, 1e-9) * 2 - 1)[..., None].repeat(3, -1)
                    save_image_grid(
                        [norm(spec_f), norm(spec_r)],
                        os.path.join(out_dir, "spectra", f"{n:05d}_mag.png"),
                    )
                if save_patches and not isinstance(out, dict):
                    g = save_patches
                    fp = np.asarray(patchify(jnp.asarray(out[i][None]), g))[:, 0]
                    rp = np.asarray(patchify(jnp.asarray(batch["B"][i][None]), g))[:, 0]
                    row_f = np.concatenate(list(fp), axis=1)
                    row_r = np.concatenate(list(rp), axis=1)
                    save_image_grid(
                        [row_f, row_r],
                        os.path.join(out_dir, "patches", f"{n:05d}_p.png"),
                    )
                n += 1
        return n
