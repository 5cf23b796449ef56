"""Threaded input pipeline: determinism vs the sync batcher, device
placement, and Trainer.fit integration (data/prefetch.py)."""

from __future__ import annotations

import numpy as np
import pytest
from PIL import Image

import jax

from tfcgan_tpu.data.pairs import PairedImageDataset, batch_iterator
from tfcgan_tpu.data.prefetch import PrefetchLoader, device_prefetch, is_device_batch


@pytest.fixture(scope="module")
def pair_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("pairs")
    (root / "train").mkdir()
    rng = np.random.RandomState(0)
    for i in range(10):
        img = rng.randint(0, 255, (32, 64, 3), np.uint8)  # A|B side by side
        Image.fromarray(img).save(root / "train" / f"{i:03d}.png")
    return str(root)


class TestPrefetchLoader:
    def test_matches_sync_batcher_exactly(self, pair_dir):
        ds = PairedImageDataset(pair_dir, "train", image_size=32)
        sync = list(batch_iterator(ds, 4, seed=7, epochs=2))
        threaded = []
        it = iter(PrefetchLoader(ds, 4, num_workers=3, seed=7, epochs=2))
        for b in it:
            threaded.append(b)
        assert len(sync) == len(threaded) == 4  # 10//4 = 2 per epoch
        for s, t in zip(sync, threaded):
            assert set(s) == set(t)
            for k in s:
                np.testing.assert_array_equal(s[k], t[k])

    def test_len(self, pair_dir):
        ds = PairedImageDataset(pair_dir, "train", image_size=32)
        assert len(PrefetchLoader(ds, 4)) == 2
        assert len(PrefetchLoader(ds, 4, drop_last=False)) == 3


class TestDevicePrefetch:
    def test_places_batches_and_fit_consumes_them(self, pair_dir):
        from tfcgan_tpu.config import get_experiment
        from tfcgan_tpu.recipes import build_recipe
        from tfcgan_tpu.train.trainer import Trainer

        cfg = get_experiment("ablation_noperc")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=8, image_size=32),
            train=cfg.train.__class__(compute_dtype="float32"),
            loss=cfg.loss.__class__(fft_mode="off", patch_grid=0, use_temp=False,
                                    use_lpips=False),
        )
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        ds = PairedImageDataset(pair_dir, "train", image_size=32)
        it = device_prefetch(
            PrefetchLoader(ds, 8, num_workers=2, epochs=2), trainer.mesh
        )
        first = next(it)
        assert is_device_batch(first)
        assert len(first["A"].sharding.device_set) == jax.device_count()
        state = trainer.init_state(jax.random.PRNGKey(0), first)
        state = trainer.fit(state, [first, *it])
        assert int(state.step) == 2  # 10//8 = 1 batch per epoch, 2 epochs

    def test_loader_errors_propagate(self):
        def bad():
            yield {"A": np.zeros((2, 8, 8, 3), np.float32)}
            raise RuntimeError("decode failed")

        from tfcgan_tpu.parallel.mesh import make_mesh

        it = device_prefetch(bad(), make_mesh())
        next(it)
        with pytest.raises(RuntimeError, match="decode failed"):
            list(it)
