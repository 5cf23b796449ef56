"""Fit the default NIQE pristine MVG on the repo's synthetic clean scenes.

The canonical NIQE pristine model (125 natural images, modelparameters.mat)
is egress-blocked here; this fits the same 36-dim MVG on a deterministic
corpus of in-repo procedural scenes (face scenes + smooth random fields —
the same distributions train/eval journeys run on), writes
``tfcgan_tpu/evaluation/niqe_pristine.npz``, and prints sanity scores.
See evaluation/niqe.py's docstring for the documented deviation.

Run: python tools/fit_niqe_pristine.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tfcgan_tpu.data.synth import textured_face_scene  # noqa: E402
from tfcgan_tpu.evaluation.niqe import fit_niqe_model, niqe  # noqa: E402


def corpus(n_faces: int = 32, size: int = 288, seed: int = 7):
    # textured face scenes: the plain blob scenes are piecewise-smooth, so a
    # model fitted on them barely reacts to blur (and adding smooth random
    # fields actively inverted the blur response); the micro-texture gives
    # the pristine MVG the sharpness statistics whose loss flags blur
    rng = np.random.RandomState(seed)
    return list(textured_face_scene(rng, n_faces, size) * 255.0)


def main():
    imgs = corpus()
    mu, cov = fit_niqe_model(imgs)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tfcgan_tpu", "evaluation", "niqe_pristine.npz",
    )
    np.savez(out, mu=mu, cov=cov)
    print(f"wrote {out}: mu {mu.shape}, cov {cov.shape}")
    model = (mu, cov)
    rng = np.random.RandomState(11)
    clean = textured_face_scene(rng, 2, 288) * 255.0
    for i, im in enumerate(clean):
        s_clean = niqe(im, model)
        s_noise = niqe(np.clip(im + rng.randn(*im.shape) * 25.0, 0, 255), model)
        s_blur = niqe(__import__("scipy.ndimage", fromlist=["x"]).gaussian_filter(im, 4.0), model)
        print(f"scene {i}: clean {s_clean:.2f}  +noise {s_noise:.2f}  +blur {s_blur:.2f}")


if __name__ == "__main__":
    main()
