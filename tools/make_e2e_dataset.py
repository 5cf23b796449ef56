"""Synthetic A|B pair dataset ON DISK for the end-to-end CLI journeys.

Real Eurecom/Devcom data is not in this environment (BASELINE.md), so the
standing e2e quality protocols train on deterministic synthetic scenes
written as the reference's side-by-side A|B PNGs (pix2pix layout,
root/{train,test}/*.png). Two scene generators:

- ``--scene blocks`` (default; the FFT-GLO journey): B = channel-rolled,
  inverted A over smooth random block fields — an exactly representable
  mapping, so PSNR/SSIM/Bhatt/MagMSE against it are meaningful (a generator
  that learns nothing scores ~8 dB).
- ``--scene face`` (the STN journey): the procedural visible/thermal face
  pairs of ``data/synth.synthetic_registration_batch`` (the scene the
  on-chip anchor run converged on). Round-4 lesson: the blocks scene is a
  DEGENERATE registration target — its autocorrelation dies at the 8 px
  block size, so ±6 px/±4° misalignments sit outside any loss basin and the
  STN cannot converge (measured: NCC(A, reg_B) stuck ~0 after 1600 steps).
  Smooth face-like structure gives the wide basin registration needs.

With ``--warp-b`` the B side is misregistered by a small random affine
(rotation ±4°, translation ±6 px — the ``TFC-STN/datasets_stn.py`` unaligned
regime); for the *test* split the pre-warp ``B_aligned`` is also saved to
``root/test_aligned_B/`` so registration can additionally be scored against
synthetic ground truth (same-modality before/after, like the anchor run).

    python tools/make_e2e_dataset.py --root /tmp/e2e_pairs [--n 512] [--test 32]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

import numpy as np


def _warp_u8(rng: np.random.RandomState, img_u8: np.ndarray) -> np.ndarray:
    """Small random affine (PIL): rotation ±4°, translation ±6 px."""
    from PIL import Image

    deg = float(rng.uniform(-4.0, 4.0))
    tx, ty = (float(rng.uniform(-6.0, 6.0)) for _ in range(2))
    img = Image.fromarray(img_u8)
    return np.asarray(
        img.rotate(deg, resample=Image.BILINEAR, translate=(tx, ty),
                   fillcolor=tuple(int(v) for v in img_u8.reshape(-1, 3).mean(0)))
    )


def make_pair(rng: np.random.RandomState, size: int, warp_b: bool = False,
              scene: str = "blocks") -> tuple[np.ndarray, np.ndarray]:
    """Returns (A|B side-by-side uint8, B_aligned uint8)."""
    to_u8 = lambda x: np.round((x * 0.5 + 0.5) * 255.0).astype(np.uint8)
    if scene == "face":
        from tfcgan_tpu.data.synth import _face_scene

        gray = _face_scene(rng, 1, size)[0]  # (H, W) in [0, 1]
        a = np.stack([gray, gray * 0.82, gray * 0.70], axis=-1) * 2.0 - 1.0
        hot = 1.0 - gray
        b = np.stack([hot, hot * 0.55, hot * 0.35], axis=-1) * 2.0 - 1.0
        a8, b8 = to_u8(a.astype(np.float32)), to_u8(b.astype(np.float32))
    else:
        a = rng.randn(size // 8, size // 8, 3).astype(np.float32)
        a = np.tanh(a.repeat(8, axis=0).repeat(8, axis=1))
        b = -np.roll(a, 1, axis=-1)  # deterministic target mapping
        a8, b8 = to_u8(a), to_u8(b)
    b8_aligned = b8
    if warp_b:
        b8 = _warp_u8(rng, b8)
    return np.concatenate([a8, b8], axis=1), b8_aligned


def main() -> None:
    from PIL import Image

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="/tmp/e2e_pairs")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--test", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scene", default="blocks", choices=["blocks", "face"])
    ap.add_argument("--warp-b", action="store_true",
                    help="misalign the B side with a small random affine "
                         "(the STN training regime)")
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    for split, count in (("train", args.n), ("test", args.test)):
        d = os.path.join(args.root, split)
        os.makedirs(d, exist_ok=True)
        aligned_d = None
        if args.warp_b and split == "test":
            aligned_d = os.path.join(args.root, "test_aligned_B")
            os.makedirs(aligned_d, exist_ok=True)
        have = len([f for f in os.listdir(d) if f.endswith(".png")])
        for i in range(have, count):
            pair, b_aligned = make_pair(rng, args.size, warp_b=args.warp_b,
                                        scene=args.scene)
            Image.fromarray(pair).save(os.path.join(d, f"{i:05d}.png"))
            if aligned_d is not None:
                Image.fromarray(b_aligned).save(
                    os.path.join(aligned_d, f"{i:05d}.png"))
        print(f"{split}: {max(have, count)} pairs at {d}")


if __name__ == "__main__":
    main()
