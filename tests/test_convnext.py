"""ConvNeXt CLIP tower parity vs an independent torch oracle.

The oracle is a from-scratch torch ConvNeXt whose state-dict key layout
matches open_clip's TimmModel (trunk.stem / trunk.stages.{s}.blocks.{i} /
trunk.head.norm / head.proj) — validating both the import key mapping and
the JAX forward math (LN eps 1e-6, gamma layer-scale, NHWC conv layout,
avg-pool head) end to end, as tests/test_clip_model.py does for the ViT.
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from robustvlm_tpu.models.clip import CLIP_CONFIGS, init_clip_params
from robustvlm_tpu.models.clip.import_torch import (
    export_visual_state_dict,
    import_visual_state_dict,
    load_clip_checkpoint,
)
from robustvlm_tpu.models.clip.model import encode_image

CFG = CLIP_CONFIGS["test-tiny-convnext"]
CNX = CFG.convnext


class LayerNorm2d(nn.LayerNorm):
    """Channel LayerNorm on NCHW (timm.layers.LayerNorm2d), eps 1e-6."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim, k=7, mlp_ratio=4):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, k, padding=k // 2, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, mlp_ratio * dim)
        self.gamma = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        sh = x
        x = self.conv_dw(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.gamma * self.mlp(x)
        return sh + x.permute(0, 3, 1, 2)


class Stage(nn.Module):
    def __init__(self, in_dim, dim, depth, first):
        super().__init__()
        self.downsample = (
            nn.Identity()
            if first
            else nn.Sequential(LayerNorm2d(in_dim, eps=1e-6),
                               nn.Conv2d(in_dim, dim, 2, 2))
        )
        self.blocks = nn.Sequential(*[Block(dim, CNX.kernel_size) for _ in range(depth)])

    def forward(self, x):
        return self.blocks(self.downsample(x))


class Trunk(nn.Module):
    def __init__(self):
        super().__init__()
        d = CNX.dims
        self.stem = nn.Sequential(
            nn.Conv2d(3, d[0], CNX.patch_size, CNX.patch_size),
            LayerNorm2d(d[0], eps=1e-6),
        )
        self.stages = nn.Sequential(*[
            Stage(d[max(0, s - 1)], d[s], CNX.depths[s], s == 0)
            for s in range(len(d))
        ])
        # timm classifier head with num_classes=0: avg pool + LN, fc=Identity
        self.head = nn.Module()
        self.head.norm = nn.LayerNorm(d[-1], eps=1e-6)

    def forward(self, x):
        x = self.stem(x)
        x = self.stages(x)
        x = x.mean(dim=(2, 3))
        return self.head.norm(x)


class TorchConvNeXtVisual(nn.Module):
    """open_clip TimmModel layout: trunk + linear proj head."""

    def __init__(self):
        super().__init__()
        self.trunk = Trunk()
        self.head = nn.Sequential(
            OrderedDict([("proj", nn.Linear(CNX.dims[-1], CFG.embed_dim))])
        )

    def forward(self, x):
        return self.head(self.trunk(x))


@pytest.fixture(scope="module")
def torch_visual():
    torch.manual_seed(0)
    m = TorchConvNeXtVisual().eval()
    # break the degenerate init symmetry a bit
    with torch.no_grad():
        for p in m.parameters():
            p.add_(0.02 * torch.randn_like(p))
    return m


class TestConvNeXtParity:
    def test_forward_matches_torch(self, torch_visual):
        sd = torch_visual.state_dict()
        visual = import_visual_state_dict(sd, CFG)
        params = {"visual": visual}

        x = np.random.RandomState(0).rand(2, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            ref = torch_visual(torch.from_numpy(x)).numpy()
        out = np.asarray(
            encode_image(params, jnp.asarray(x), CFG, compute_dtype=jnp.float32)
        )
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-4)

    def test_export_roundtrip(self, torch_visual):
        sd = torch_visual.state_dict()
        visual = import_visual_state_dict(sd, CFG)
        back = export_visual_state_dict(visual, CFG)
        for k, v in back.items():
            np.testing.assert_allclose(
                v, sd[k].numpy(), atol=1e-6, err_msg=k
            )

    def test_visual_only_checkpoint_load(self, torch_visual):
        base = init_clip_params(jax.random.PRNGKey(0), CFG)
        sd = torch_visual.state_dict()
        params = load_clip_checkpoint(
            {k: v.numpy() for k, v in sd.items()}, CFG, base_params=base
        )
        x = jnp.asarray(
            np.random.RandomState(1).rand(2, 3, 32, 32).astype(np.float32)
        )
        e = encode_image(params, x, CFG, normalize=True)
        assert np.all(np.isfinite(np.asarray(e)))

    def test_grad_wrt_pixels_finite(self, torch_visual):
        sd = torch_visual.state_dict()
        params = {"visual": import_visual_state_dict(sd, CFG)}
        x = jnp.asarray(
            np.random.RandomState(2).rand(2, 3, 32, 32).astype(np.float32)
        )
        g = jax.grad(
            lambda t: jnp.sum(encode_image(params, t, CFG, remat="dots") ** 2)
        )(x)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0
