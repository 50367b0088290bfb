"""Native C++ image pipeline: PIL parity and loader integration."""

import numpy as np
import pytest

from robustvlm_tpu.data import native


@pytest.mark.skipif(not native.available(), reason="native lib not built")
class TestNativeOps:
    def test_layout_conversion(self):
        rng = np.random.RandomState(0)
        img = (rng.rand(10, 12, 3) * 255).astype(np.uint8)
        out = native.to_chw_f32(img)
        assert out.shape == (3, 10, 12)
        np.testing.assert_allclose(
            out, img.transpose(2, 0, 1).astype(np.float32) / 255.0, atol=1e-6
        )

    def test_resize_matches_pil(self):
        from PIL import Image

        rng = np.random.RandomState(1)
        img = (rng.rand(97, 131, 3) * 255).astype(np.uint8)
        ours = native.resize_bicubic(img, 48, 64)
        ref = (
            np.asarray(
                Image.fromarray(img).resize((64, 48), Image.BICUBIC),
                np.float32,
            ).transpose(2, 0, 1)
            / 255.0
        )
        assert ours.shape == ref.shape
        # PIL rounds its intermediate horizontal pass to uint8; ours keeps
        # full precision, so allow 3/255 max (mean stays well under 1/255)
        assert float(np.abs(ours - ref).max()) <= 3.0 / 255.0 + 1e-6
        assert float(np.abs(ours - ref).mean()) <= 1.0 / 255.0

    def test_upscale_matches_pil(self):
        from PIL import Image

        rng = np.random.RandomState(2)
        img = (rng.rand(20, 24, 3) * 255).astype(np.uint8)
        ours = native.resize_bicubic(img, 40, 48)
        ref = (
            np.asarray(
                Image.fromarray(img).resize((48, 40), Image.BICUBIC),
                np.float32,
            ).transpose(2, 0, 1)
            / 255.0
        )
        assert float(np.abs(ours - ref).max()) <= 3.0 / 255.0 + 1e-6

    def test_center_crop_shape_and_range(self):
        rng = np.random.RandomState(3)
        img = (rng.rand(100, 150, 3) * 255).astype(np.uint8)
        out = native.resize_center_crop(img, 64)
        assert out.shape == (3, 64, 64)
        assert 0.0 <= out.min() and out.max() <= 1.0

    def test_default_transform_uses_native(self):
        from PIL import Image

        from robustvlm_tpu.data.loaders import default_image_transform

        rng = np.random.RandomState(4)
        img = Image.fromarray((rng.rand(50, 70, 3) * 255).astype(np.uint8))
        tf_native = default_image_transform(32, prefer_native=True)
        tf_pil = default_image_transform(32, prefer_native=False)
        a = tf_native(img)
        b = tf_pil(img)
        assert a.shape == b.shape == (3, 32, 32)
        # both are antialiased bicubic pipelines; allow small numeric slack
        assert float(np.abs(a - b).mean()) < 0.02
