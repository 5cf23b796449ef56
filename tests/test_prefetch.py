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
            # 64 is the UNet's minimum size (6 downsamples; a 32px input
            # reaches a 0-sized axis in down6's conv)
            data=cfg.data.__class__(batch_size=8, image_size=64),
            train=cfg.train.__class__(compute_dtype="float32"),
            loss=cfg.loss.__class__(fft_mode="off", patch_grid=0, use_temp=False,
                                    use_lpips=False),
        )
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        ds = PairedImageDataset(pair_dir, "train", image_size=64)
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
            yield {"A": np.zeros((8, 8, 8, 3), np.float32)}
            raise RuntimeError("decode failed")

        from tfcgan_tpu.parallel.mesh import make_mesh

        it = device_prefetch(bad(), make_mesh())
        next(it)
        with pytest.raises(RuntimeError, match="decode failed"):
            list(it)

    def test_uint8_streaming_bit_identical(self, pair_dir):
        """raw uint8 transfer + on-device normalize == host float path to
        1 ulp (XLA reassociates the affine normalize)."""
        from tfcgan_tpu.parallel.mesh import make_mesh

        ds = PairedImageDataset(pair_dir, "train", image_size=32)
        mesh = make_mesh(1)  # batch 4 won't device_put over the 8-dev mesh
        host = list(batch_iterator(ds, 4, seed=3, epochs=1))
        raw = PrefetchLoader(ds, 4, num_workers=2, seed=3, epochs=1, raw=True)
        dev = list(device_prefetch(iter(raw), mesh, via_uint8=True))
        assert len(host) == len(dev)
        for h, d in zip(host, dev):
            assert is_device_batch({k: d[k] for k in ("A", "B", "T_B")})
            for k in ("A", "B", "T_B"):
                np.testing.assert_allclose(h[k], np.asarray(d[k]), rtol=3e-7,
                                           atol=1.3e-7)


class TestDevicePool:
    def test_matches_batch_iterator_bitwise(self, pair_dir):
        """Pool staging + on-device assembly == host pipeline (same order,
        values to 1 fp32 ulp — XLA reassociates the normalize)."""
        from tfcgan_tpu.data.pool import DevicePool
        from tfcgan_tpu.parallel.mesh import make_mesh

        ds = PairedImageDataset(pair_dir, "train", image_size=32)
        pool = DevicePool(ds, make_mesh(1))  # batch 4: 1-device mesh
        host = list(batch_iterator(ds, 4, seed=11, epochs=2))
        dev = list(pool.batches(4, seed=11, epochs=2))
        assert len(host) == len(dev) == 4
        for h, d in zip(host, dev):
            assert is_device_batch(d)
            for k in ("A", "B", "T_B"):
                np.testing.assert_allclose(h[k], np.asarray(d[k]), rtol=3e-7,
                                           atol=1.3e-7)

    def test_sharded_over_mesh_and_fit_consumes(self, pair_dir):
        from tfcgan_tpu.config import get_experiment
        from tfcgan_tpu.data.pool import DevicePool
        from tfcgan_tpu.recipes import build_recipe
        from tfcgan_tpu.train.trainer import Trainer

        cfg = get_experiment("ablation_noperc")
        cfg = cfg.replace(
            # 64 is the UNet's minimum size (6 downsamples; a 32px input
            # reaches a 0-sized axis in down6's conv)
            data=cfg.data.__class__(batch_size=8, image_size=64),
            train=cfg.train.__class__(compute_dtype="float32"),
            loss=cfg.loss.__class__(fft_mode="off", patch_grid=0, use_temp=False,
                                    use_lpips=False),
        )
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        ds = PairedImageDataset(pair_dir, "train", image_size=64)
        pool = DevicePool(ds, trainer.mesh)
        it = pool.batches(8, epochs=2)
        first = next(it)
        # batch dim sharded over the data axis, pool assembly on device
        assert len(first["A"].sharding.device_set) == jax.device_count()
        state = trainer.init_state(jax.random.PRNGKey(0), first)
        state = trainer.fit(state, [first, *it])
        assert int(state.step) == 2

    def test_fused_pool_step_matches_regular_step(self, pair_dir):
        """Trainer.fit(pool=...) fuses batch assembly into the train-step
        program; with the same indices it must produce the same state as the
        assemble-then-step path bit for bit."""
        from tfcgan_tpu.config import get_experiment
        from tfcgan_tpu.data.pool import DevicePool
        from tfcgan_tpu.recipes import build_recipe
        from tfcgan_tpu.train.trainer import Trainer

        cfg = get_experiment("ablation_noperc")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=8, image_size=64),
            train=cfg.train.__class__(compute_dtype="float32"),
            loss=cfg.loss.__class__(fft_mode="off", patch_grid=0, use_temp=False,
                                    use_lpips=False),
        )
        recipe = build_recipe(cfg)
        ds = PairedImageDataset(pair_dir, "train", image_size=64)

        t_a = Trainer(cfg, recipe)
        pool_a = DevicePool(ds, t_a.mesh)
        idxs = list(pool_a.index_batches(8, seed=7, epochs=2))
        s_a = t_a.init_state(jax.random.PRNGKey(1), pool_a.batch(idxs[0]))
        s_a = t_a.fit(s_a, idxs, pool=pool_a)

        t_b = Trainer(cfg, recipe)
        pool_b = DevicePool(ds, t_b.mesh)
        s_b = t_b.init_state(jax.random.PRNGKey(1), pool_b.batch(idxs[0]))
        s_b = t_b.fit(s_b, [pool_b.batch(i) for i in idxs])

        assert int(s_a.step) == int(s_b.step) == len(idxs)
        eq = jax.tree_util.tree_map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            jax.device_get(s_a.g_params), jax.device_get(s_b.g_params))
        assert all(jax.tree_util.tree_leaves(eq))
        m = {k: float(v) for k, v in t_a.last_metrics.items()}
        assert all(np.isfinite(v) for v in m.values())

    def test_labels_ride_along(self, pair_dir):
        from tfcgan_tpu.data.pool import DevicePool
        from tfcgan_tpu.parallel.mesh import make_mesh

        files = sorted(__import__("os").listdir(f"{pair_dir}/train"))
        labels = {f: (i % 2, i % 4, i % 3) for i, f in enumerate(files)}
        ds = PairedImageDataset(pair_dir, "train", image_size=32, labels=labels)
        pool = DevicePool(ds, make_mesh(1))
        b = next(pool.batches(4, shuffle=False, epochs=1))
        assert b["LAB3"].shape == (4, 3)
        np.testing.assert_array_equal(
            np.asarray(b["LAB3"]),
            np.stack([labels[f] for f in files[:4]]),
        )


class TestRamCache:
    def test_cache_hits_identical_and_faster_path(self, pair_dir):
        ds = PairedImageDataset(pair_dir, "train", image_size=32, cache=True)
        cold = ds[2]
        assert len(ds._cache) == 1
        warm = ds[2]
        for k in cold:
            np.testing.assert_array_equal(cold[k], warm[k])
        # cached raw equals the no-cache decode
        ds2 = PairedImageDataset(pair_dir, "train", image_size=32)
        ref = ds2[2]
        for k in ref:
            np.testing.assert_array_equal(ref[k], cold[k])
