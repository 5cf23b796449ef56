"""Offline data-prep utilities.

Rebuilds the reference's prep scripts:
- ``combine_a_and_b``: pair A/ and B/ dirs into side-by-side A|B images
  (``TFC-STN/combine_A_and_B_mod.py``, itself from pix2pix).
- ``crop_stacks``: slice stacked test outputs into per-role dirs
  (``TFC-STN/crop_stn_stack.py``, ``TFC-GAN-FFT/eval/*/crop_images.py``).
- ``make_registered_dataset``: run a trained STN over a training set and emit
  a registered pair set for re-training
  (``TFC-STN/make_reg_train_set_refine3_VTFSTN.py:27-30``).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image


def _combine_one(args):
    path_a, path_b, path_ab = args
    a = Image.open(path_a).convert("RGB")
    b = Image.open(path_b).convert("RGB").resize(a.size)
    ab = Image.new("RGB", (a.size[0] * 2, a.size[1]))
    ab.paste(a, (0, 0))
    ab.paste(b, (a.size[0], 0))
    ab.save(path_ab)


def combine_a_and_b(dir_a: str, dir_b: str, dir_ab: str, workers: int = 8) -> int:
    """Pair same-named files from dir_a and dir_b side by side into dir_ab."""
    os.makedirs(dir_ab, exist_ok=True)
    names = sorted(set(os.listdir(dir_a)) & set(os.listdir(dir_b)))
    jobs = [
        (os.path.join(dir_a, n), os.path.join(dir_b, n), os.path.join(dir_ab, n))
        for n in names
    ]
    # threads, not multiprocessing.Pool (the reference's pix2pix heritage,
    # ``combine_A_and_B_mod.py:9-25``): PIL releases the GIL in its codecs,
    # and fork() after JAX initializes its thread pools can deadlock when
    # this runs via the same CLI process as training/eval
    if workers > 1:
        with ThreadPoolExecutor(max_workers=workers) as p:
            list(p.map(_combine_one, jobs))
    else:
        for j in jobs:
            _combine_one(j)
    return len(jobs)


def crop_stacks(stack_dir: str, out_root: str, roles: list[str]) -> int:
    """Slice every vertical N-stack PNG in stack_dir into out_root/<role>/."""
    files = sorted(f for f in os.listdir(stack_dir) if f.endswith(".png"))
    for d in roles:
        os.makedirs(os.path.join(out_root, d), exist_ok=True)
    for f in files:
        img = np.asarray(Image.open(os.path.join(stack_dir, f)).convert("RGB"))
        h = img.shape[0] // len(roles)
        for i, role in enumerate(roles):
            Image.fromarray(img[i * h : (i + 1) * h]).save(
                os.path.join(out_root, role, f)
            )
    return len(files)


def make_registered_dataset(inferencer, batches, out_dir: str) -> int:
    """Warp every training pair with the trained STN and save A|warped_B pairs."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for batch in batches:
        out = inferencer(batch)
        warped = np.asarray(out["warped_B"])
        a = np.asarray(batch["A"])
        for i in range(a.shape[0]):
            u8 = lambda x: np.clip((x * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
            ab = np.concatenate([u8(a[i]), u8(warped[i])], axis=1)
            Image.fromarray(ab).save(os.path.join(out_dir, f"{n:05d}.png"))
            n += 1
    return n
