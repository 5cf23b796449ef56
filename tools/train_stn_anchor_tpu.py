"""VTF-STN flagship convergence run on the real TPU (VERDICT.md round-2 #2).

Runs ``stn_newmodel3`` (256², batch 32, lr 1e-4 — the named reference config,
``TFC-STN/0302_STN21_Devcom_NewModel.sh``) for >=1000 steps on synthetic
misaligned visible/thermal pairs (per-sample random affine ground truth,
``data/synth.synthetic_registration_batch``), with the fixed msrecon
perceptual anchor standing in for pretrained LPIPS (zero-egress env; random
LPIPS is measured to collapse registration — BASELINE.md round 1).

Success criteria (reference protocol, ``TFC-STN/evaluation/calc_ssim.py:72-74``
before/after + ground truth available only synthetically):
  - no collapse: theta stays near identity-scale, losses finite;
  - registration improves: SSIM/NCC/MI(A, warped_B) > SSIM/NCC/MI(A, B);
  - ground truth: L1(warped_B, B_aligned) < L1(B, B_aligned).
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_registration_batch
from tfcgan_tpu.ops import metrics as M
from tfcgan_tpu.parallel.mesh import shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer

SIZE = int(os.environ.get("STN_SIZE", "256"))
B = int(os.environ.get("STN_BATCH", "32"))
STEPS = int(os.environ.get("STN_STEPS", "1200"))

print(f"devices: {jax.devices()}", flush=True)
print(f"first op: {float(jnp.ones(()) + 1)}", flush=True)

cfg = get_experiment("stn_newmodel3")
cfg = cfg.replace(
    data=cfg.data.__class__(batch_size=B, image_size=SIZE),
    train=cfg.train.__class__(compute_dtype="bfloat16"),
)
recipe = build_recipe(cfg)
assert recipe.perceptual == "msrecon"
trainer = Trainer(cfg, recipe)

batch0, _ = synthetic_registration_batch(batch_size=B, image_size=SIZE, seed=0)
state = trainer.init_state(jax.random.PRNGKey(0), batch0)
step = trainer.compiled_step()


@jax.jit
def warp_eval(g_params, a, b):
    fake_a1 = recipe.G2.apply({"params": g_params["G2"]}, b, deterministic=True)
    warped = recipe.STN.apply({"params": g_params["STN"]}, a, fake_a1, b)
    theta = recipe.STN.apply({"params": g_params["STN"]}, a, fake_a1, method="theta")
    return warped, theta


def gray01(x):
    return np.asarray(x * 0.5 + 0.5, dtype=np.float32).mean(-1)


def reg_metrics(a, b_obs, warped, b_aligned):
    """Registration quality vs the synthetic ground truth.

    before = metric(B_aligned, B_observed); after = metric(B_aligned,
    warped_B). Same-modality comparison, so bigger SSIM/NCC/MI = better —
    unlike metric(A, warped_B), where a *perfectly* aligned thermal image is
    maximally anticorrelated with the visible A (ncc -> -1) and the
    directions invert. The reference eval compares real_B vs registered_B
    the same way (``TFC-STN/evaluation/calc_ssim.py:72-74``)."""
    gt, gb, gw = gray01(b_aligned), gray01(b_obs), gray01(np.asarray(warped))
    out = {}
    for name, fn in (("ssim", M.ssim), ("ncc", M.ncc), ("mi", M.mutual_information)):
        out[f"{name}_before"] = float(np.mean(np.asarray(fn(jnp.asarray(gt), jnp.asarray(gb)))))
        out[f"{name}_after"] = float(np.mean(np.asarray(fn(jnp.asarray(gt), jnp.asarray(gw)))))
    out["l1_truth_before"] = float(np.mean(np.abs(b_obs - b_aligned)))
    out["l1_truth_after"] = float(np.mean(np.abs(np.asarray(warped, np.float32) - b_aligned)))
    return out


eval_batch, eval_truth = synthetic_registration_batch(batch_size=B, image_size=SIZE, seed=9999)
ea = jnp.asarray(eval_batch["A"])
eb = jnp.asarray(eval_batch["B"])

w0, th0 = warp_eval(state.g_params, ea, eb)
before = reg_metrics(eval_batch["A"], eval_batch["B"], w0, eval_truth["B_aligned"])
print("step 0 (untrained STN):", json.dumps(before), flush=True)

# pre-generated pool (host gen is ~0.5 s/batch on this 1-core box; a 60-batch
# pool ~= a 1.9k-image dataset, Eurecom-scale, cycled like a real epoch loop).
# Staged onto the device ONCE: per-step host->device transfer of a 25 MB
# batch over the tunneled TPU costs ~2 s/step and dominated the first probe.
POOL = int(os.environ.get("STN_POOL", "60"))
pool = [
    shard_batch(
        synthetic_registration_batch(batch_size=B, image_size=SIZE, seed=i + 1)[0],
        trainer.mesh,
    )
    for i in range(POOL)
]
print(f"pool of {POOL} batches ready (device-resident)", flush=True)

history = []
t0 = time.perf_counter()
for i in range(STEPS):
    state, m = step(state, pool[i % POOL])
    if (i + 1) % 100 == 0:
        w, th = warp_eval(state.g_params, ea, eb)
        r = reg_metrics(eval_batch["A"], eval_batch["B"], w, eval_truth["B_aligned"])
        th = np.asarray(th, np.float32)
        rec = {
            "step": i + 1,
            "loss_G": float(np.asarray(m["loss_G"])),
            "loss_D": float(np.asarray(m["loss_D"])),
            "g_morph": float(np.asarray(m.get("g_morph", jnp.nan))),
            "g_lpips": float(np.asarray(m["g_lpips"])),
            "theta_t_absmean": float(np.abs(th[:, :, 2]).mean()),
            **r,
        }
        history.append(rec)
        print(json.dumps(rec), flush=True)

elapsed = time.perf_counter() - t0
final = history[-1]
ok = (
    np.isfinite(final["loss_G"])
    and final["ssim_after"] > final["ssim_before"]
    and final["ncc_after"] > final["ncc_before"]
    and final["l1_truth_after"] < final["l1_truth_before"]
)
print(f"\n{STEPS} steps in {elapsed:.0f}s ({B * STEPS / elapsed:.1f} img/s)")
print("VERDICT:", "CONVERGED (registration improved, no collapse)" if ok else "NOT CONVERGED")
out = {"config": {"size": SIZE, "batch": B, "steps": STEPS},
       "before": before, "history": history, "elapsed_s": elapsed, "ok": bool(ok)}
with open(os.path.join(os.path.dirname(__file__), "stn_anchor_run.json"), "w") as f:
    json.dump(out, f, indent=1)
