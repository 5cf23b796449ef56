"""Drive `cli train` end-to-end over a real PNG directory for each input
staging mode (pool / stream / sync fallback) on the 8-device CPU mesh —
verifies the round-2 input-pipeline wiring exactly the way a user hits it.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools/verify_cli_staging.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def make_dataset(root: str, n: int = 16, size: int = 64) -> None:
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        img = rng.randint(0, 255, (size, 2 * size, 3), np.uint8)
        Image.fromarray(img).save(os.path.join(root, "train", f"{i:03d}.png"))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tfcgan_tpu.cli import main as cli_main

    data_root = tempfile.mkdtemp(prefix="verify_pairs_")
    make_dataset(data_root)

    for staging, workers in [("pool", 8), ("stream", 2), ("stream", 0)]:
        out = tempfile.mkdtemp(prefix=f"verify_out_{staging}{workers}_")
        cli_main([
            "train", "--experiment", "ablation_noperc",
            "--data-root", data_root, "--batch-size", "8",
            "--image-size", "64", "--n-epochs", "1", "--dtype", "float32",
            "--staging", staging, "--num-workers", str(workers),
            "--out-dir", out,
        ])
        log = os.path.join(out, "logs", "ablation_noperc.jsonl")
        assert os.path.exists(log), f"no train log for {staging}/{workers}"
        print(f"OK staging={staging} workers={workers}: "
              f"{sum(1 for _ in open(log))} log lines")
    print("ALL STAGING MODES OK")


if __name__ == "__main__":
    main()
