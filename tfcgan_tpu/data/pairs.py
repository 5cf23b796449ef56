"""Paired side-by-side image dataset.

The reference stores pairs as one image with A|B side by side, split at w/2
and bicubic-resized to 256² (``/root/reference/TFC-GAN-FFT/datasets_temp.py:
49-63``). This loader keeps that host path (PIL, bit-identical inputs) but
stops there: normalization, temperature LUT, and patch crops are on-device.

Returned batches: {"A": (N,H,W,3) float32 in [-1,1], "B": same,
"T_B": (N,H,W) float32 Celsius, optional "LAB": (N,) int32}.
"""

from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

from tfcgan_tpu.ops.temperature import TEMP_MAX_C, TEMP_MIN_C


def load_pair(path: str, image_size: int = 256) -> tuple[np.ndarray, np.ndarray]:
    """One A|B image -> (A_u8, B_u8), each (H, W, 3) uint8."""
    img = Image.open(path).convert("RGB")
    w, h = img.size
    a = img.crop((0, 0, w / 2, h)).resize((image_size, image_size), Image.Resampling.BICUBIC)
    b = img.crop((w / 2, 0, w, h)).resize((image_size, image_size), Image.Resampling.BICUBIC)
    return np.asarray(a, dtype=np.uint8), np.asarray(b, dtype=np.uint8)


def _normalize(u8: np.ndarray) -> np.ndarray:
    # ToTensor + Normalize(0.5, 0.5): uint8/255 -> [-1, 1]
    return (u8.astype(np.float32) / 255.0 - 0.5) / 0.5


class PairedImageDataset:
    """File-list dataset over a ``root/mode`` directory of A|B pair images.

    ``cache=True`` keeps the decoded uint8 pairs in RAM (a 256² pair is
    384 KB — ~400 MB for a 1k-pair set), so epochs ≥ 2 skip the PNG decode
    entirely (~20 img/s on a 1-core host, the streaming-path bottleneck).
    ``raw_item`` exposes the uint8 pair pre-normalization — the input to the
    device-side staging paths (``data/pool.DevicePool``, uint8 streaming).
    """

    def __init__(
        self,
        root: str,
        mode: str = "train",
        image_size: int = 256,
        direction: str = "AtoB",
        labels: dict[str, int] | None = None,
        use_native: bool = True,
        cache: bool = False,
    ):
        self.files = sorted(glob.glob(os.path.join(root, mode, "*.*")))
        if not self.files:
            raise FileNotFoundError(f"no images under {os.path.join(root, mode)}")
        self.image_size = image_size
        self.direction = direction
        self.labels = labels
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] | None = (
            {} if cache else None
        )
        if use_native:
            from tfcgan_tpu.data import native

            self._native = native if native.available() else None
        else:
            self._native = None

    def __len__(self) -> int:
        return len(self.files)

    def enable_cache(self) -> None:
        """Turn on the decoded-uint8 RAM cache after construction (used by
        the CLI once it has sized the dataset)."""
        if self._cache is None:
            self._cache = {}

    def _raw_pair(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        """Decoded (A_u8, B_u8) after the direction swap; RAM-cached."""
        idx = idx % len(self.files)
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        if self._native is not None:
            # the native loader emits normalized floats (PIL-bit-exact from
            # uint8) — invert the lossless (u8/255 - .5)/.5 map to recover u8
            img = np.asarray(Image.open(self.files[idx]).convert("RGB"), np.uint8)
            a, b, _ = self._native.process_pair(img, self.image_size)
            to_u8 = lambda x: np.rint((x * 0.5 + 0.5) * 255.0).astype(np.uint8)
            a_u8, b_u8 = to_u8(a), to_u8(b)
        else:
            a_u8, b_u8 = load_pair(self.files[idx], self.image_size)
        if self.direction == "BtoA":
            a_u8, b_u8 = b_u8, a_u8
        if self._cache is not None:
            self._cache[idx] = (a_u8, b_u8)
        return a_u8, b_u8

    def _label_fields(self, idx: int) -> dict[str, np.ndarray]:
        if self.labels is None:
            return {}
        lab = self.labels.get(os.path.basename(self.files[idx % len(self.files)]), 0)
        if isinstance(lab, (tuple, list, np.ndarray)):
            # (gender, ethnicity, age) triple — debiased family
            lab3 = np.asarray(lab, np.int32)
            return {"LAB3": lab3, "LAB": np.int32(lab3[1])}
        return {"LAB": np.int32(lab)}

    def raw_item(self, idx: int) -> dict[str, np.ndarray]:
        """uint8 item {"A_u8", "B_u8", labels...} for device-side staging
        (normalization + temperature LUT happen on device — see data/pool)."""
        a_u8, b_u8 = self._raw_pair(idx)
        return {"A_u8": a_u8, "B_u8": b_u8, **self._label_fields(idx)}

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        if self._native is not None and self.direction == "AtoB" and self._cache is None:
            img = np.asarray(
                Image.open(self.files[idx % len(self.files)]).convert("RGB"), np.uint8
            )
            a, b, t_b = self._native.process_pair(img, self.image_size)
            item = {"A": a, "B": b, "T_B": t_b}
        else:
            a_u8, b_u8 = self._raw_pair(idx)
            t_b = TEMP_MIN_C + b_u8[..., 0].astype(np.float32) * (
                (TEMP_MAX_C - TEMP_MIN_C) / 255.0
            )
            item = {"A": _normalize(a_u8), "B": _normalize(b_u8), "T_B": t_b}
        item.update(self._label_fields(idx))
        return item


def batch_iterator(
    dataset: PairedImageDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 42,
    drop_last: bool = True,
    epochs: int | None = None,
):
    """Simple host-side batcher (drop_last matches the reference loader)."""
    rng = np.random.RandomState(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = np.arange(len(dataset))
        if shuffle:
            rng.shuffle(order)
        n_full = len(order) // batch_size if drop_last else -(-len(order) // batch_size)
        for i in range(n_full):
            idxs = order[i * batch_size : (i + 1) * batch_size]
            items = [dataset[int(j)] for j in idxs]
            yield {
                k: np.stack([it[k] for it in items]) for k in items[0]
            }
        epoch += 1


class UnpairedImageDataset:
    """CycleGAN-style unpaired loader (``cyclegan_og/datasets.py:16-48``):
    ``root/trainA`` and ``root/trainB`` dirs; B drawn at a random index when
    ``unaligned=True``."""

    def __init__(
        self,
        root: str,
        mode: str = "train",
        image_size: int = 256,
        unaligned: bool = True,
        seed: int = 42,
    ):
        self.files_a = sorted(glob.glob(os.path.join(root, f"{mode}A", "*.*")))
        self.files_b = sorted(glob.glob(os.path.join(root, f"{mode}B", "*.*")))
        if not self.files_a or not self.files_b:
            raise FileNotFoundError(f"no images under {root}/{mode}A|B")
        self.image_size = image_size
        self.unaligned = unaligned
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.files_a)

    def _load(self, path: str) -> np.ndarray:
        img = Image.open(path).convert("RGB").resize(
            (self.image_size, self.image_size), Image.Resampling.BICUBIC
        )
        return _normalize(np.asarray(img, np.uint8))

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        a = self._load(self.files_a[idx % len(self.files_a)])
        j = self.rng.randint(0, len(self.files_b)) if self.unaligned else idx % len(self.files_b)
        b = self._load(self.files_b[j])
        t_b = TEMP_MIN_C + ((b[..., 0] * 0.5 + 0.5) * 255.0) * (
            (TEMP_MAX_C - TEMP_MIN_C) / 255.0
        )
        return {"A": a, "B": b, "T_B": t_b.astype(np.float32)}


def load_annotations_csv(
    path: str,
    file_col: int = 0,
    label_col: int = 2,
    label_cols: tuple[int, int, int] | None = None,
) -> dict[str, int] | dict[str, tuple[int, int, int]]:
    """annots_csv labels for the debiased family
    (``datasets_temp_Debias.py:46-73``: gender/ethnicity/age columns; the V7
    trainer uses the ethnicity column). Returns {basename: int label}, or
    {basename: (gender, ethn, age)} when ``label_cols`` is given (the V1–V5
    multi-head trainers), for ``PairedImageDataset(labels=...)``."""
    import pandas as pd

    df = pd.read_csv(path)
    files = df.iloc[:, file_col].astype(str)
    if label_cols is not None:
        trip = [df.iloc[:, c].astype(int) for c in label_cols]
        return {
            os.path.basename(f): (int(g), int(e), int(a))
            for f, g, e, a in zip(files, *trip)
        }
    labels = df.iloc[:, label_col].astype(int)
    return {os.path.basename(f): int(l) for f, l in zip(files, labels)}
