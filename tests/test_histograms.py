"""Weight/grad histogram observability (nemar/util/tb_visualizer.py parity)."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch, synthetic_iterator
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.histograms import (
    HistogramLogger,
    tree_histograms,
    write_histogram_html,
)
from tfcgan_tpu.train.trainer import Trainer


def small_cfg():
    cfg = get_experiment("fft_glo")
    return cfg.replace(
        data=cfg.data.__class__(batch_size=8, image_size=64),
        train=cfg.train.__class__(compute_dtype="float32"),
    )


class TestTreeHistograms:
    def test_counts_and_stats(self):
        tree = {"a": jnp.linspace(-1.0, 1.0, 1000), "b": {"w": jnp.ones((4, 5))}}
        h = tree_histograms(tree, bins=16)
        a = h["a"]
        assert int(np.asarray(a["counts"]).sum()) == 1000
        assert float(a["lo"]) == -1.0 and float(a["hi"]) == 1.0
        np.testing.assert_allclose(float(a["mean"]), 0.0, atol=1e-6)
        # constant leaf: everything lands in bin 0, span guard avoids NaN
        b = h["b"]["w"]
        counts = np.asarray(b["counts"])
        assert counts[0] == 20 and counts[1:].sum() == 0
        assert np.isfinite(float(b["std"]))

    def test_histogram_is_exact_vs_numpy(self):
        rng = np.random.RandomState(0)
        x = rng.randn(4096).astype(np.float32)
        h = tree_histograms({"x": jnp.asarray(x)}, bins=32)["x"]
        lo, hi = x.min(), x.max()
        idx = np.clip(((x - lo) / max(hi - lo, 1e-12) * 32).astype(np.int32), 0, 31)
        expect = np.bincount(idx, minlength=32)
        np.testing.assert_array_equal(np.asarray(h["counts"]), expect)


class TestTrainerHistogramLogging:
    def test_fit_writes_weight_and_grad_histograms(self, tmp_path):
        cfg = small_cfg()
        trainer = Trainer(cfg, build_recipe(cfg))
        batch = synthetic_batch(batch_size=8, image_size=64)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        logger = HistogramLogger(str(tmp_path / "hists.jsonl"))
        state = trainer.fit(
            state,
            synthetic_iterator(3, batch_size=8, image_size=64),
            hist_logger=logger,
            hist_every=2,
        )
        logger.close()
        assert int(state.step) == 3
        recs = [json.loads(l) for l in open(tmp_path / "hists.jsonl")]
        kinds = {(r["step"], r["kind"]) for r in recs}
        # steps 0 and 2 of the loop -> state.step 1 and 3
        assert kinds == {(1, "weights"), (1, "grads"), (3, "weights"), (3, "grads")}
        w = recs[0]["leaves"]
        # flattened names reach into both towers
        assert any(k.startswith("G/") for k in w) and any(k.startswith("D/") for k in w)
        first = next(iter(w.values()))
        assert sum(first["counts"]) > 0 and np.isfinite(first["l2"])
        # grads on histogram steps are the real thing: non-zero somewhere
        g = [r for r in recs if r["kind"] == "grads"][0]["leaves"]
        assert any(s["l2"] > 0 for s in g.values())

        out = write_histogram_html(str(tmp_path / "hists.jsonl"))
        html = open(out).read()
        assert "<svg" in html and "grads" in html and "weights" in html
