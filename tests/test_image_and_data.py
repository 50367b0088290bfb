import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from robustvlm_tpu.data.loaders import (
    DataLoader,
    SyntheticClassificationDataset,
)
from robustvlm_tpu.ops.image import (
    OPENAI_MEAN,
    OPENAI_STD,
    center_crop,
    normalize_clip,
    resize_bicubic,
)


class TestNormalize:
    def test_matches_manual(self):
        x = np.random.RandomState(0).rand(2, 3, 8, 8).astype(np.float32)
        out = np.asarray(normalize_clip(jnp.asarray(x)))
        for c in range(3):
            expect = (x[:, c] - OPENAI_MEAN[c]) / OPENAI_STD[c]
            np.testing.assert_allclose(out[:, c], expect, rtol=1e-5)


class TestResize:
    @pytest.mark.parametrize("src,dst", [(32, 224), (32, 64), (224, 224)])
    def test_matches_torch_bicubic(self, src, dst):
        x = np.random.RandomState(0).rand(2, 3, src, src).astype(np.float32)
        ours = np.asarray(resize_bicubic(jnp.asarray(x), dst))
        ref = F.interpolate(
            torch.from_numpy(x), size=(dst, dst), mode="bicubic",
            align_corners=False, antialias=False,
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_differentiable(self):
        import jax

        x = jnp.asarray(np.random.RandomState(1).rand(1, 3, 32, 32), jnp.float32)
        g = jax.grad(lambda im: jnp.sum(resize_bicubic(im, 64) ** 2))(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_center_crop(self):
        x = jnp.asarray(np.arange(2 * 3 * 8 * 8).reshape(2, 3, 8, 8), jnp.float32)
        c = center_crop(x, 4)
        assert c.shape == (2, 3, 4, 4)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(x[:, :, 2:6, 2:6]))


class TestDataLoader:
    def test_batches_and_determinism(self):
        ds = SyntheticClassificationDataset(n=20, size=8, n_classes=5)
        dl = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True, seed=0,
                        num_threads=2)
        batches = list(dl)
        assert len(batches) == 2
        x, y = batches[0]
        assert x.shape == (8, 3, 8, 8) and x.dtype == np.float32
        assert y.shape == (8,)
        assert x.min() >= 0 and x.max() <= 1
        # same seed -> same first-epoch order
        dl2 = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True, seed=0,
                         num_threads=2)
        x2, y2 = next(iter(dl2))
        np.testing.assert_array_equal(y, y2)

    def test_epoch_reshuffles(self):
        ds = SyntheticClassificationDataset(n=64, size=4)
        dl = DataLoader(ds, batch_size=32, seed=0, num_threads=1)
        y1 = next(iter(dl))[1]
        y2 = next(iter(dl))[1]
        assert not np.array_equal(y1, y2)

    def test_no_drop_last(self):
        ds = SyntheticClassificationDataset(n=20, size=4)
        dl = DataLoader(ds, batch_size=8, drop_last=False, shuffle=False,
                        num_threads=1)
        sizes = [b[0].shape[0] for b in dl]
        assert sizes == [8, 8, 4]


class TestCheckpointManager:
    def test_roundtrip_and_fallback_cleanup(self, tmp_path):
        import jax

        from robustvlm_tpu.utils.checkpoint import CheckpointManager

        params = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
        opt_state = {"m": jnp.zeros(4)}
        cm = CheckpointManager(str(tmp_path), total_steps=1000, fallback_every=200)
        cm.maybe_save(200, params, opt_state)
        cm.maybe_save(400, params, opt_state)
        names = {p.name for p in (tmp_path / "checkpoints").iterdir()}
        assert "fallback_400" in names and "fallback_200" not in names
        assert "step_400" in names  # snapshot_every = 100 -> 400 is a snapshot
        p2, o2 = cm.restore("step_400", params, opt_state)
        np.testing.assert_array_equal(np.asarray(p2["a"]), np.asarray(params["a"]))
        np.testing.assert_array_equal(np.asarray(o2["m"]), np.asarray(opt_state["m"]))

    def test_final_and_torch_export(self, tmp_path):
        import jax

        from robustvlm_tpu.models.clip import CLIP_CONFIGS, init_clip_params
        from robustvlm_tpu.utils.checkpoint import CheckpointManager

        cfg = CLIP_CONFIGS["test-tiny"]
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
        cm = CheckpointManager(str(tmp_path), total_steps=10)
        cm.save_final(params, {"m": jnp.zeros(2)})
        pt = cm.export_torch_visual(params, cfg)
        sd = torch.load(pt, weights_only=True)
        assert "conv1.weight" in sd
        assert tuple(sd["conv1.weight"].shape) == (64, 3, 8, 8)
