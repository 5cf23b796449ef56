"""Convert pretrained LPIPS (VGG16 + lin) torch weights into flax params.

Usage (on a machine with the checkpoints; this sandbox has no egress):

    python tools/convert_lpips.py --vgg vgg16-397923af.pth \
        --lpips lpips_vgg_v0.1.pth --out lpips_flax.msgpack

The output is a flax-serialized params tree loadable with:

    from tfcgan_tpu.models import LPIPS
    params = load_lpips_params("lpips_flax.msgpack")
    d = LPIPS().apply(params, x, y)

Mapping:
- torchvision VGG16 ``features.{0,2,5,7,10,12,14,17,19,21,24,26,28}`` conv
  weights (OIHW) -> ``vgg/conv{1..13}`` kernels (HWIO transpose) + biases.
- LPIPS ``lin{0..4}.model.1.weight`` (1x1 conv, (1, C, 1, 1)) -> ``lin{i}``
  vectors (C,). The flax module applies ``abs`` to the calibration weights,
  matching the published model's non-negativity.
"""

from __future__ import annotations

import argparse
import sys


# torchvision VGG16 conv layer indices inside `features`
VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert(vgg_state: dict, lpips_state: dict) -> dict:
    import numpy as np

    params: dict = {"vgg": {}}
    for i, li in enumerate(VGG16_CONV_IDX, start=1):
        w = vgg_state[f"features.{li}.weight"].cpu().numpy()  # (O, I, kh, kw)
        b = vgg_state[f"features.{li}.bias"].cpu().numpy()
        params["vgg"][f"conv{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": b,
        }
    for i in range(5):
        # published layouts vary: "lin{i}.model.1.weight" or "lins.{i}..."
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight",
                    f"lin{i}.weight"):
            if key in lpips_state:
                w = lpips_state[key].cpu().numpy().reshape(-1)
                params[f"lin{i}"] = w
                break
        else:
            raise KeyError(f"lin{i} weight not found in lpips checkpoint")
    return {"params": params}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg", required=True)
    ap.add_argument("--lpips", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch
    from flax import serialization

    vgg_state = torch.load(args.vgg, map_location="cpu")
    lpips_state = torch.load(args.lpips, map_location="cpu")
    variables = convert(vgg_state, lpips_state)
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(variables))
    print(f"wrote {args.out}")


def load_lpips_params(path: str):
    """Back-compat alias; the loader lives in the library now."""
    from tfcgan_tpu.models.lpips import load_lpips_params as _load

    return _load(path)


if __name__ == "__main__":
    sys.exit(main())
