"""Convert torchvision resnet18 weights into the frozen-backbone flax tree.

The debiased-family regional CNNs and the ThermalGAN encoder load
``torchvision.models.resnet18(pretrained=True)`` with a frozen backbone
(``/root/reference/TFC-GAN-FFT/TFCGAN_multigpu_patchFFT_debiased_V7.py:258-273``,
``/root/reference/ThermalGAN/ThermalGAN.py:183-215``). This sandbox has no
egress, so the converter runs wherever the checkpoint exists:

    python tools/convert_resnet.py --ckpt resnet18-f37072fd.pth \
        --out resnet18_flax.msgpack

Then point ``LossConfig.resnet_weights`` at the output; the recipes build the
CNNs with ``ResNet18(norm="folded")`` and splice the backbone in at init.

Because the backbone never trains, its BatchNorms run in eval mode — a fixed
affine transform — so each (conv, bn) pair is folded into one biased conv:
``W' = W·γ/√(σ²+ε)``, ``b' = β − μ·γ/√(σ²+ε)``. This is exact (fp round-off
aside) and removes the BN latency entirely. The classifier ``fc`` is NOT
converted: the reference replaces it with a fresh Dropout+Linear head
(``debiased_V7.py:266-269``), as do we.
"""

from __future__ import annotations

import argparse


def _fold(w, gamma, beta, mean, var, eps=1e-5):
    """(conv OIHW, eval-mode BN) -> (HWIO kernel, bias)."""
    import numpy as np

    scale = gamma / np.sqrt(var + eps)
    kernel = np.transpose(w * scale[:, None, None, None], (2, 3, 1, 0))
    bias = beta - mean * scale
    return {"kernel": kernel.astype(np.float32), "bias": bias.astype(np.float32)}


def convert(sd: dict) -> dict:
    """torchvision resnet18 state_dict (numpy arrays) -> backbone params tree
    matching ``ResNet18(norm="folded")`` (tfcgan_tpu/models/resnet.py)."""

    def fold(conv_key: str, bn_key: str):
        return _fold(
            sd[f"{conv_key}.weight"],
            sd[f"{bn_key}.weight"],
            sd[f"{bn_key}.bias"],
            sd[f"{bn_key}.running_mean"],
            sd[f"{bn_key}.running_var"],
        )

    params = {"stem": fold("conv1", "bn1")}
    for torch_layer, ours in ((1, 0), (2, 1), (3, 2), (4, 3)):
        for b in range(2):
            pre = f"layer{torch_layer}.{b}"
            blk = {
                "conv1": fold(f"{pre}.conv1", f"{pre}.bn1"),
                "conv2": fold(f"{pre}.conv2", f"{pre}.bn2"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["down"] = fold(f"{pre}.downsample.0", f"{pre}.downsample.1")
            params[f"layer{ours}_{b}"] = blk
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="torchvision resnet18 .pth")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch
    from flax import serialization

    sd = torch.load(args.ckpt, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params = convert(sd)

    # validate against the module structure before writing
    from tfcgan_tpu.models.resnet import ResNet18
    import jax, jax.numpy as jnp

    template = ResNet18(num_classes=None, norm="folded").init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )["params"]
    blob = serialization.to_bytes(serialization.from_state_dict(template, params))
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob)/1e6:.1f} MB)")


if __name__ == "__main__":
    import os, sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
