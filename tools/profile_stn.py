"""Attribute the stn_newmodel3 step cost (VERDICT r3 weak #5).

The family row says 270 ms at b32 @256² and FLAT to b48 — which component
(G1/G2×2, STN ViT-Base localizer, warp, morph, perceptual ×2, 4 D pairs)
serializes the step?  Measured by ablation: each variant stubs ONE component
(constant-zero loss term or identity forward) so XLA dead-code-eliminates its
fwd+bwd, and the step-time delta is that component's in-situ cost (includes
the fusions it would have shared — deltas can under/over-attribute by a few
ms, which is fine at this granularity).

One process, one component per jit (tunnel discipline); device-resident
synthetic batches; >=10 timed steps after 3 warmup. Prints a JSON line per
variant and a final table.

    timeout 3000 python tools/profile_stn.py [--batch 32] [--size 256]

Reference context: TFC-STN/TFCGAN_STN21_Original_NewModel3_Official.py
:624-655 (the step this recipe rebuilds).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

_t0 = time.time()


def _log(m):
    print(f"[{time.time()-_t0:7.1f}s] {m}", flush=True)


def measure(name: str, batch_size: int, size: int, extra=None, env=None,
            patch_recipe=None, steps: int = 10) -> float:
    """Build trainer (+optional recipe monkey-patch), run, return ms/step."""
    from tfcgan_tpu.config import get_experiment
    from tfcgan_tpu.data.synth import synthetic_batch_device
    from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
    from tfcgan_tpu.recipes import build_recipe
    from tfcgan_tpu.train.trainer import Trainer

    old_env = {}
    for k, v in (env or {}).items():
        old_env[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        cfg = get_experiment("stn_newmodel3")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=batch_size, image_size=size),
            train=cfg.train.__class__(compute_dtype="bfloat16"),
            extra={**cfg.extra, **(extra or {})},
        )
        recipe = build_recipe(cfg)
        if patch_recipe is not None:
            patch_recipe(recipe)
        trainer = Trainer(cfg, recipe, mesh=make_mesh())
        batch = shard_batch(
            synthetic_batch_device(batch_size=batch_size, image_size=size),
            trainer.mesh,
        )
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer.compiled_step()
        _log(f"{name}: compiling ...")
        for _ in range(3):
            state, m = step(state, batch)
        # axon: block_until_ready lies — force a host scalar read
        float(np.asarray(m["loss_G"]))
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, batch)
        float(np.asarray(m["loss_G"]))
        ms = (time.perf_counter() - t0) / steps * 1e3
        print(json.dumps({"variant": name, "ms_per_step": round(ms, 1),
                          "img_per_sec": round(batch_size / ms * 1e3, 1)}),
              flush=True)
        return ms
    finally:
        for k, v in old_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    b, s, n = args.batch, args.size, args.steps

    import tfcgan_tpu.recipes.stn as stn_mod

    results = {}
    results["full"] = measure("full", b, s, steps=n)
    results["single_pass_d"] = measure(
        "single_pass_d", b, s, env={"TFCGAN_SINGLE_PASS_D": "1"}, steps=n)

    # ViT localizer: depth 12 -> 2 removes 10/12 of the transformer stack
    # (per-block-identical), so cost_vit ~= 1.2 x delta
    results["vit_depth2"] = measure(
        "vit_depth2", b, s, extra={"vit_depth": 2}, steps=n)

    # morph triplet -> 0 (XLA DCEs the three reduce_window gradients)
    def no_morph(r):
        r.use_morph = False
    results["no_morph"] = measure("no_morph", b, s, patch_recipe=no_morph, steps=n)

    # perceptual (msrecon x2 by default, module-global in recipes/stn) -> 0
    old_msr = stn_mod.multiscale_recon
    stn_mod.multiscale_recon = lambda x, y: jnp.float32(0.0)
    try:
        results["no_perc"] = measure("no_perc", b, s, steps=n)
    finally:
        stn_mod.multiscale_recon = old_msr

    # STN leg entirely (ViT + warp + their grads): warped_B := real_B
    orig_forward = stn_mod.STNRecipe._forward

    def fwd_no_stn(self, g_params, batch, rng):
        kg1, kg2, kg3 = jax.random.split(rng, 3)
        det = self.deterministic_g
        a, bb = batch["A"], batch["B"]
        fake_b = self.G1.apply({"params": g_params["G1"]}, a,
                               deterministic=det, rngs={"dropout": kg1})
        fake_a1 = self.G2.apply({"params": g_params["G2"]}, bb,
                                deterministic=det, rngs={"dropout": kg2})
        fake_a2 = self.G2.apply({"params": g_params["G2"]}, bb,
                                deterministic=det, rngs={"dropout": kg3})
        theta = jnp.tile(jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]],
                                     jnp.float32)[None], (bb.shape[0], 1, 1))
        return fake_b, fake_a1, bb, fake_a2, theta

    stn_mod.STNRecipe._forward = fwd_no_stn
    try:
        results["no_stn_leg"] = measure("no_stn_leg", b, s, steps=n)
    finally:
        stn_mod.STNRecipe._forward = orig_forward

    # XLA gather warp instead of the Pallas separable kernel
    results["xla_warp"] = measure(
        "xla_warp", b, s, extra={"fast_warp": False}, steps=n)

    # adv terms -> 0: the G phase's four D-pair forwards DCE away (the D
    # phase keeps its own) — isolates "D inside G backward" cost
    orig_pair = stn_mod.STNRecipe._d_pair

    def zero_pair(self, d_params, spectral, name, first, second, cond):
        z = jnp.zeros((first.shape[0], 1, 1, 1), jnp.float32)
        return z, z

    stn_mod.STNRecipe._d_pair = zero_pair
    try:
        results["no_d_at_all"] = measure("no_d_at_all", b, s, steps=n)
    finally:
        stn_mod.STNRecipe._d_pair = orig_pair

    full = results["full"]
    print("\n-- attribution (delta vs full, b%d @%d², two-pass D default) --" % (b, s))
    rows = [
        ("single-pass D delta (opt-in knob)", results["single_pass_d"] - full),
        ("ViT localizer (~1.2x depth-10 delta)", (full - results["vit_depth2"]) * 1.2),
        ("morph triplet", full - results["no_morph"]),
        ("perceptual x2 (msrecon)", full - results["no_perc"]),
        ("STN leg (ViT+warp+grads)", full - results["no_stn_leg"]),
        ("Pallas-warp saving vs XLA gather", results["xla_warp"] - full),
        ("ALL D forwards (G+D phases)", full - results["no_d_at_all"]),
    ]
    for k, v in rows:
        print(f"{v:8.1f} ms  {k}")
    print(json.dumps({"summary": {k: round(v, 1) for k, v in results.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
