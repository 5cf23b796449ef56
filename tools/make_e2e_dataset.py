"""Synthetic A|B pair dataset ON DISK for the end-to-end CLI journey.

Real Eurecom/Devcom data is not in this environment (BASELINE.md), so the
standing e2e quality protocol trains on a deterministic LEARNABLE mapping —
B = channel-rolled, inverted A over smooth random fields — written as the
reference's side-by-side A|B PNGs (pix2pix layout, root/{train,test}/*.png).
PSNR/SSIM/Bhatt/MagMSE against this target are meaningful: a generator that
learns nothing scores ~8 dB; the mapping is exactly representable.

    python tools/make_e2e_dataset.py --root /tmp/e2e_pairs [--n 512] [--test 32]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

import numpy as np


def make_pair(rng: np.random.RandomState, size: int, warp_b: bool = False) -> np.ndarray:
    a = rng.randn(size // 8, size // 8, 3).astype(np.float32)
    a = np.tanh(a.repeat(8, axis=0).repeat(8, axis=1))
    b = -np.roll(a, 1, axis=-1)  # deterministic target mapping
    to_u8 = lambda x: np.round((x * 0.5 + 0.5) * 255.0).astype(np.uint8)
    a8, b8 = to_u8(a), to_u8(b)
    if warp_b:
        # the STN regime (``TFC-STN/datasets_stn.py``: unaligned A/B): B is
        # the SAME scene misregistered by a small random affine — rotation
        # ±4°, translation ±6 px — matching the misalignment scale of the
        # on-chip anchor run (tools/train_stn_anchor_tpu.py)
        from PIL import Image

        deg = float(rng.uniform(-4.0, 4.0))
        tx, ty = (float(rng.uniform(-6.0, 6.0)) for _ in range(2))
        img = Image.fromarray(b8)
        b8 = np.asarray(
            img.rotate(deg, resample=Image.BILINEAR, translate=(tx, ty),
                       fillcolor=tuple(int(v) for v in b8.reshape(-1, 3).mean(0)))
        )
    return np.concatenate([a8, b8], axis=1)  # A|B side by side


def main() -> None:
    from PIL import Image

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="/tmp/e2e_pairs")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--test", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--warp-b", action="store_true",
                    help="misalign the B side with a small random affine "
                         "(the STN training regime)")
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    for split, count in (("train", args.n), ("test", args.test)):
        d = os.path.join(args.root, split)
        os.makedirs(d, exist_ok=True)
        have = len([f for f in os.listdir(d) if f.endswith(".png")])
        for i in range(have, count):
            Image.fromarray(make_pair(rng, args.size, warp_b=args.warp_b)).save(
                os.path.join(d, f"{i:05d}.png"))
        print(f"{split}: {max(have, count)} pairs at {d}")


if __name__ == "__main__":
    main()
