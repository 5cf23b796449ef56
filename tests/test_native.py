"""Native C++ data-pipeline kernels vs the PIL reference path."""

import numpy as np
import pytest
from PIL import Image

from tfcgan_tpu.data import native
from tfcgan_tpu.data.pairs import load_pair, _normalize
from tfcgan_tpu.ops.temperature import TEMP_MAX_C, TEMP_MIN_C

pytestmark = pytest.mark.skipif(not native.available(), reason="libfastpair not built")


def _pil_reference(img_u8, out_size):
    im = Image.fromarray(img_u8, "RGB")
    w, h = im.size
    a = im.crop((0, 0, w / 2, h)).resize((out_size, out_size), Image.Resampling.BICUBIC)
    b = im.crop((w / 2, 0, w, h)).resize((out_size, out_size), Image.Resampling.BICUBIC)
    a_u8, b_u8 = np.asarray(a, np.uint8), np.asarray(b, np.uint8)
    t = TEMP_MIN_C + b_u8[..., 0].astype(np.float32) * ((TEMP_MAX_C - TEMP_MIN_C) / 255.0)
    return _normalize(a_u8), _normalize(b_u8), t


class TestNativePair:
    @pytest.mark.parametrize("in_hw,out", [((64, 256), 64), ((100, 300), 128), ((256, 512), 256)])
    def test_matches_pil(self, in_hw, out):
        rng = np.random.RandomState(0)
        # smooth-ish content: PIL uses int fixed-point; allow 1 uint8 step
        base = rng.randint(0, 256, (in_hw[0] // 4, in_hw[1] // 4, 3), np.uint8)
        img = np.asarray(
            Image.fromarray(base, "RGB").resize((in_hw[1], in_hw[0]), Image.Resampling.BILINEAR)
        )
        a, b, t = native.process_pair(img, out)
        a_ref, b_ref, t_ref = _pil_reference(img, out)
        # normalized units: 1 uint8 step = 2/255 ≈ 0.00784
        assert np.abs(a - a_ref).max() <= 2.01 / 255.0 * 2
        assert np.abs(b - b_ref).max() <= 2.01 / 255.0 * 2
        assert np.abs(t - t_ref).max() <= 14.0 / 255.0 * 2.01

    def test_batch_threaded_matches_single(self):
        rng = np.random.RandomState(1)
        imgs = rng.randint(0, 256, (6, 64, 128, 3), np.uint8)
        a, b, t = native.process_pair_batch(imgs, 64, threads=4)
        for i in range(6):
            ai, bi, ti = native.process_pair(imgs[i], 64)
            np.testing.assert_array_equal(a[i], ai)
            np.testing.assert_array_equal(b[i], bi)
            np.testing.assert_array_equal(t[i], ti)
