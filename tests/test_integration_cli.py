"""Full user-journey integration test through the CLI.

Replays the reference's end-to-end workflow as ONE pytest, entirely through
``tfcgan_tpu.cli.main()`` argv parsing — the path a reference user migrates to:

    pair.sh (combine_A_and_B_mod.py)      -> cli prep-combine
    bash/*.sh -> TFCGAN_multigpu_globalFFT.py -> cli train   (epoch + ckpt)
    test_TFCGAN.py                         -> cli test       (stack PNGs)
    eval/Eurecom/crop_images.py            -> cli prep-crop
    eval/Eurecom/evaluation_psnr_ssim.py   -> cli eval       (metric CSV)

Reference call stack: SURVEY.md §3.1/§3.3 (TFC-GAN-FFT/TFCGAN_multigpu_
globalFFT.py:429-591, test_TFCGAN.py:186-218, eval/Eurecom/eurecom_eval.sh).
Runs on the virtual 8-device CPU mesh at 64² so the trainer program hits the
persistent compile cache shared with tests/test_train.py shapes.
"""

import glob
import os

import numpy as np
import pytest
from PIL import Image

from tfcgan_tpu import cli


def _write_faces(d, names, seed):
    """Face-ish 64² images (smooth blobs, not pure noise) so SSIM is defined."""
    os.makedirs(d, exist_ok=True)
    r = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    for i, n in enumerate(names):
        cy, cx = r.uniform(20, 44, 2)
        blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 12.0**2)))
        img = np.stack([blob * r.uniform(0.5, 1.0) for _ in range(3)], -1)
        img = img + 0.1 * r.rand(64, 64, 3)
        Image.fromarray((img.clip(0, 1) * 255).astype("uint8")).save(
            os.path.join(d, n)
        )


@pytest.mark.integration
def test_prep_train_test_crop_eval_journey(tmp_path):
    root = tmp_path / "ds"
    runs = tmp_path / "runs"
    res = tmp_path / "results"

    # --- prep-combine: A/ + B/ -> side-by-side A|B pairs per split ---
    train_names = [f"{i:03d}.png" for i in range(16)]
    test_names = [f"t{i:03d}.png" for i in range(8)]
    for split, names, s in (("train", train_names, 0), ("test", test_names, 9)):
        _write_faces(str(tmp_path / f"A_{split}"), names, seed=s)
        _write_faces(str(tmp_path / f"B_{split}"), names, seed=s + 100)
        cli.main([
            "prep-combine",
            "--dir-a", str(tmp_path / f"A_{split}"),
            "--dir-b", str(tmp_path / f"B_{split}"),
            "--dir-ab", str(root / split),
        ])
    assert len(os.listdir(root / "train")) == 16

    # --- train: one epoch (2 steps at batch 8) + checkpoint + samples ---
    cli.main([
        "train", "--experiment", "fft_glo",
        "--data-root", str(root),
        "--batch-size", "8", "--image-size", "64",
        "--n-epochs", "1", "--checkpoint-interval", "1",
        "--sample-interval", "2",  # fires once: exercises Inferencer+gallery
        "--dtype", "float32",
        "--out-dir", str(runs),
    ])
    from tfcgan_tpu.train.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(str(runs))
    assert ckpt is not None and os.path.basename(ckpt).startswith("step_")
    # training logged finite metrics
    logs = glob.glob(str(runs / "logs" / "*.jsonl"))
    assert logs, "JsonlLogger wrote no training log"
    import json

    rows = [json.loads(l) for l in open(logs[0])]
    assert rows and all(np.isfinite(r["loss_G"]) for r in rows)
    # sample hook wrote a grid + gallery index
    assert glob.glob(str(runs / "samples" / "*.png"))
    assert os.path.exists(runs / "samples" / "index.html")

    # --- test: checkpoint -> stacked A|fake_B|real_B PNGs for every image ---
    cli.main([
        "test", "--experiment", "fft_glo",
        "--data-root", str(root),
        "--image-size", "64", "--batch-size", "8",
        "--checkpoint", ckpt,
        "--out-dir", str(res / "stacks"),
        "--dtype", "float32",
    ])
    stacks = sorted(glob.glob(str(res / "stacks" / "*.png")))
    assert len(stacks) == 8  # drop_last=False covers the whole test split
    st = np.asarray(Image.open(stacks[0]))
    assert st.shape == (64 * 3, 64, 3)

    # --- prep-crop: stacks -> real_A/ fake_B/ real_B/ role dirs ---
    cli.main([
        "prep-crop",
        "--stack-dir", str(res / "stacks"),
        "--out-root", str(res / "crops"),
        "--roles", "real_A,fake_B,real_B",
    ])
    for role in ("real_A", "fake_B", "real_B"):
        assert len(os.listdir(res / "crops" / role)) == 8

    # --- eval: PSNR/SSIM/Bhattacharyya/MagMSE CSV over the role dirs ---
    csv_path = res / "metrics.csv"
    cli.main([
        "eval",
        "--fake-dir", str(res / "crops" / "fake_B"),
        "--real-dir", str(res / "crops" / "real_B"),
        "--out-csv", str(csv_path),
    ])
    import pandas as pd

    df = pd.read_csv(csv_path)
    assert len(df) == 8
    for col in ("psnr", "ssim"):
        assert col in df.columns and np.isfinite(df[col]).all()
    # identical dirs must score perfectly — sanity-check the metric keying
    cli.main([
        "eval",
        "--fake-dir", str(res / "crops" / "real_B"),
        "--real-dir", str(res / "crops" / "real_B"),
        "--out-csv", str(res / "self.csv"),
    ])
    self_df = pd.read_csv(res / "self.csv")
    assert (self_df["ssim"] > 0.999).all()
