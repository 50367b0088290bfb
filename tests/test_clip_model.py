"""CLIP forward parity vs an independent torch oracle.

The oracle is a from-scratch torch implementation of the openai CLIP
architecture (conv patch embed, pre-LN transformer with QuickGELU,
argmax-EOT-pooled causal text tower) whose state-dict key layout matches
open_clip's — validating both the import key mapping and the JAX forward
math (LayerNorm eps, attention scaling, residual order) end to end.
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from robustvlm_tpu.models.clip import (
    CLIP_CONFIGS,
    encode_image,
    encode_text,
    import_clip_state_dict,
    import_visual_state_dict,
    export_visual_state_dict,
    init_clip_params,
    load_clip_checkpoint,
    vision_forward,
)

CFG = CLIP_CONFIGS["test-tiny"]


class TorchQuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class TorchBlock(nn.Module):
    def __init__(self, w, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(w)
        self.attn = nn.MultiheadAttention(w, heads)
        self.ln_2 = nn.LayerNorm(w)
        self.mlp = nn.Sequential(
            OrderedDict(
                [
                    ("c_fc", nn.Linear(w, 4 * w)),
                    ("gelu", TorchQuickGELU()),
                    ("c_proj", nn.Linear(4 * w, w)),
                ]
            )
        )
        self.mask = None

    def forward(self, x):  # x: (N, B, W)
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False, attn_mask=self.mask)[0]
        return x + self.mlp(self.ln_2(x))


class TorchTransformer(nn.Module):
    def __init__(self, w, layers, heads):
        super().__init__()
        self.resblocks = nn.ModuleList([TorchBlock(w, heads) for _ in range(layers)])

    def forward(self, x):
        for b in self.resblocks:
            x = b(x)
        return x


class TorchVisionTower(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        w = cfg.vision.width
        self.conv1 = nn.Conv2d(3, w, cfg.patch_size, cfg.patch_size, bias=False)
        scale = w ** -0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(w))
        self.positional_embedding = nn.Parameter(
            scale * torch.randn(cfg.n_vision_tokens, w)
        )
        self.ln_pre = nn.LayerNorm(w)
        self.transformer = TorchTransformer(w, cfg.vision.layers, cfg.vision.heads)
        self.ln_post = nn.LayerNorm(w)
        self.proj = nn.Parameter(scale * torch.randn(w, cfg.embed_dim))

    def forward(self, x):
        x = self.conv1(x)  # (B, W, g, g)
        x = x.flatten(2).permute(0, 2, 1)  # (B, N, W)
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x).permute(1, 0, 2)  # LND
        x = self.transformer(x).permute(1, 0, 2)
        return self.ln_post(x[:, 0]) @ self.proj


class TorchCLIP(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.visual = TorchVisionTower(cfg)
        wt = cfg.text.width
        self.token_embedding = nn.Embedding(cfg.vocab_size, wt)
        self.positional_embedding = nn.Parameter(
            0.01 * torch.randn(cfg.context_length, wt)
        )
        self.transformer = TorchTransformer(wt, cfg.text.layers, cfg.text.heads)
        mask = torch.full((cfg.context_length, cfg.context_length), float("-inf"))
        mask.triu_(1)
        for b in self.transformer.resblocks:
            b.mask = mask
        self.ln_final = nn.LayerNorm(wt)
        self.text_projection = nn.Parameter(
            (wt ** -0.5) * torch.randn(wt, cfg.embed_dim)
        )
        self.logit_scale = nn.Parameter(torch.tensor(np.log(1 / 0.07), dtype=torch.float32))

    def encode_text(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding
        x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        x = self.ln_final(x)
        return x[torch.arange(x.shape[0]), tokens.argmax(-1)] @ self.text_projection


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = TorchCLIP(CFG)
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_params(torch_model):
    return import_clip_state_dict(torch_model.state_dict(), CFG)


class TestVisionParity:
    def test_embedding_matches(self, torch_model, jax_params):
        rng = np.random.RandomState(0)
        x = rng.rand(4, 3, CFG.image_size, CFG.image_size).astype(np.float32)
        with torch.no_grad():
            ref = torch_model.visual(torch.from_numpy(x)).numpy()
        ours = np.asarray(encode_image(jax_params, jnp.asarray(x), CFG))
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)

    def test_normalized_embedding(self, jax_params):
        x = jnp.asarray(np.random.RandomState(1).rand(2, 3, 32, 32), jnp.float32)
        e = encode_image(jax_params, x, CFG, normalize=True)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(e), axis=-1), 1.0, rtol=1e-5
        )

    def test_tokens_output_shape(self, jax_params):
        x = jnp.asarray(np.random.RandomState(2).rand(2, 3, 32, 32), jnp.float32)
        t = vision_forward(jax_params, x, CFG, tokens=True)
        assert t.shape == (2, CFG.n_vision_tokens, CFG.vision.width)

    def test_skip_last_block(self, torch_model, jax_params):
        # penultimate-layer features (robust LLaVA tower trick)
        rng = np.random.RandomState(3)
        x = rng.rand(2, 3, 32, 32).astype(np.float32)
        xt = torch.from_numpy(x)
        with torch.no_grad():
            v = torch_model.visual
            h = v.conv1(xt).flatten(2).permute(0, 2, 1)
            h = torch.cat([v.class_embedding.expand(2, 1, -1), h], 1)
            h = v.ln_pre(h + v.positional_embedding).permute(1, 0, 2)
            for blk in v.transformer.resblocks[:-1]:
                h = blk(h)
            ref = h.permute(1, 0, 2).numpy()
        ours = np.asarray(
            vision_forward(jax_params, jnp.asarray(x), CFG, tokens=True, n_skip_last=1)
        )
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)

    def test_remat_matches(self, jax_params):
        x = jnp.asarray(np.random.RandomState(4).rand(2, 3, 32, 32), jnp.float32)
        a = encode_image(jax_params, x, CFG)
        b = encode_image(jax_params, x, CFG, remat=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestTextParity:
    def test_encode_text_matches(self, torch_model, jax_params):
        rng = np.random.RandomState(5)
        toks = rng.randint(1, CFG.vocab_size - 1, (4, CFG.context_length))
        toks[:, 0] = 0
        toks[:, -1] = CFG.vocab_size - 1  # EOT = max id
        with torch.no_grad():
            ref = torch_model.encode_text(torch.from_numpy(toks)).numpy()
        ours = np.asarray(encode_text(jax_params, jnp.asarray(toks), CFG))
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


class TestCheckpointRoundtrip:
    def test_visual_export_import_roundtrip(self, torch_model, jax_params):
        sd = export_visual_state_dict(jax_params["visual"], CFG)
        # reload into the torch oracle; forward must be unchanged
        torch_model.visual.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
        )
        x = np.random.RandomState(6).rand(2, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            ref = torch_model.visual(torch.from_numpy(x)).numpy()
        ours = np.asarray(encode_image(jax_params, jnp.asarray(x), CFG))
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)

    def test_load_visual_only_overlay(self, torch_model, jax_params):
        base = init_clip_params(jax.random.PRNGKey(0), CFG)
        sd = torch_model.visual.state_dict()
        params = load_clip_checkpoint(sd, CFG, base_params=base)
        x = jnp.asarray(np.random.RandomState(7).rand(2, 3, 32, 32), jnp.float32)
        ours = np.asarray(encode_image(params, x, CFG))
        ref = np.asarray(encode_image(jax_params, x, CFG))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_load_tecoa_layout(self, torch_model, jax_params):
        base = init_clip_params(jax.random.PRNGKey(0), CFG)
        sd = {"vision_encoder_state_dict": torch_model.visual.state_dict()}
        params = load_clip_checkpoint(sd, CFG, base_params=base)
        x = jnp.asarray(np.random.RandomState(8).rand(2, 3, 32, 32), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(encode_image(params, x, CFG)),
            np.asarray(encode_image(jax_params, x, CFG)),
            atol=1e-6,
        )

    def test_beta_interpolation(self, torch_model):
        base = init_clip_params(jax.random.PRNGKey(0), CFG)
        sd = torch_model.visual.state_dict()
        p_half = load_clip_checkpoint(
            sd, CFG, base_params=base, beta=0.5, interpolate_with=sd
        )
        # 0.5*sd + 0.5*sd == sd
        p_full = load_clip_checkpoint(sd, CFG, base_params=base)
        x = jnp.asarray(np.random.RandomState(9).rand(2, 3, 32, 32), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(encode_image(p_half, x, CFG)),
            np.asarray(encode_image(p_full, x, CFG)),
            atol=1e-5,
        )


class TestClsSplitAttention:
    """The tile-aligned [cls; patches] attention decomposition is exact
    (same row max and denominator as the dense softmax), fwd and grad."""

    def _mk(self, n, heads, hd, seed=0):
        rng = np.random.RandomState(seed)
        w = heads * hd
        x = jnp.asarray(rng.randn(2, n, w).astype(np.float32))
        p = {
            "qkv_w": jnp.asarray(rng.randn(w, 3 * w).astype(np.float32) * 0.05),
            "qkv_b": jnp.asarray(rng.randn(3 * w).astype(np.float32) * 0.05),
            "out_w": jnp.asarray(rng.randn(w, w).astype(np.float32) * 0.05),
            "out_b": jnp.asarray(rng.randn(w).astype(np.float32) * 0.05),
        }
        return x, p

    @pytest.mark.parametrize("n", [17, 65])
    def test_matches_dense_path(self, n, monkeypatch):
        import robustvlm_tpu.models.clip.model as M
        from robustvlm_tpu.models.clip.model import _attention

        monkeypatch.setattr(M, "CLS_SPLIT_ATTENTION", True)
        x, p = self._mk(n, heads=4, hd=16)
        split = _attention(x, p, 4, None)  # (n-1) % 8 == 0 -> split path
        dense = _attention(x, p, 4, jnp.zeros((n, n), jnp.float32))
        np.testing.assert_allclose(
            np.asarray(split), np.asarray(dense), atol=1e-5
        )

        g_s = jax.grad(lambda t: jnp.sum(_attention(t, p, 4, None) ** 2))(x)
        g_d = jax.grad(
            lambda t: jnp.sum(
                _attention(t, p, 4, jnp.zeros((n, n), jnp.float32)) ** 2
            )
        )(x)
        np.testing.assert_allclose(
            np.asarray(g_s), np.asarray(g_d), atol=1e-4
        )


class TestMlpRatioAndLargeConfigs:
    """open_clip's larger LAION variants (reference CLIP_benchmark
    model_collection.py:8-17) and the mlp_ratio knob that ViT-g-14 needs."""

    def test_registry_dims_match_open_clip(self):
        # (embed_dim, image, patch, vW, vL, vH, v_mlp_hidden, tW, tL, tH)
        expect = {
            "ViT-B-16-plus-240": (640, 240, 16, 896, 12, 14, 3584, 640, 12, 10),
            "ViT-H-14": (1024, 224, 14, 1280, 32, 16, 5120, 1024, 24, 16),
            "ViT-g-14": (1024, 224, 14, 1408, 40, 16, 6144, 1024, 24, 16),
        }
        for name, (ed, im, p, vw, vl, vh, vm, tw, tl, th) in expect.items():
            c = CLIP_CONFIGS[name]
            assert (c.embed_dim, c.image_size, c.patch_size) == (ed, im, p)
            assert (c.vision.width, c.vision.layers, c.vision.heads) == (vw, vl, vh)
            assert int(c.vision.width * c.vision.mlp_ratio) == vm
            assert (c.text.width, c.text.layers, c.text.heads) == (tw, tl, th)
            assert not c.quick_gelu

    def test_init_shapes_without_allocation(self):
        # eval_shape: full-size param trees checked without allocating them
        from robustvlm_tpu.models.clip.model import CLIPConfig

        for name in ("ViT-H-14", "ViT-g-14", "ViT-B-16-plus-240"):
            cfg = CLIP_CONFIGS[name]
            tree = jax.eval_shape(
                lambda c=cfg: init_clip_params(jax.random.PRNGKey(0), c)
            )
            vb = tree["visual"]["blocks"]
            l, w = cfg.vision.layers, cfg.vision.width
            h = int(w * cfg.vision.mlp_ratio)
            assert vb["mlp"]["fc_w"].shape == (l, w, h)
            assert vb["mlp"]["proj_w"].shape == (l, h, w)
            assert vb["attn"]["qkv_w"].shape == (l, w, 3 * w)
            assert tree["visual"]["proj"].shape == (w, cfg.embed_dim)
            n_tok = (cfg.image_size // cfg.patch_size) ** 2 + 1
            assert tree["visual"]["positional_embedding"].shape == (n_tok, w)

    def test_fractional_ratio_forward_and_roundtrip(self):
        # a tiny non-integer-ratio tower must init, run, and round-trip
        # through the torch-layout export/import unchanged
        from robustvlm_tpu.models.clip.model import CLIPConfig, TransformerConfig

        cfg = CLIPConfig(
            "tiny-g", 64, 32, 8,
            TransformerConfig(64, 2, 4, mlp_ratio=4.3637),
            TransformerConfig(64, 2, 4),
            vocab_size=512, context_length=16, quick_gelu=False,
        )
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
        assert params["visual"]["blocks"]["mlp"]["fc_w"].shape == (2, 64, 279)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 32, 32), jnp.float32)
        emb = np.asarray(encode_image(params, x, cfg))
        assert emb.shape == (2, 64) and np.isfinite(emb).all()

        sd = export_visual_state_dict(params["visual"], cfg)
        re = import_visual_state_dict(sd, cfg)
        emb2 = np.asarray(encode_image({"visual": re}, x, cfg))
        np.testing.assert_allclose(emb2, emb, atol=1e-6)


class TestFoldNormalization:
    """fold_normalization absorbs normalize_clip into the patch embed:
    value AND pixel-gradient parity (the attack differentiates wrt pixels)."""

    def _setup(self):
        from robustvlm_tpu.ops.image import normalize_clip

        params = init_clip_params(jax.random.PRNGKey(3), CFG)
        x = jnp.asarray(
            np.random.RandomState(1).rand(2, 3, CFG.image_size, CFG.image_size)
            .astype(np.float32)
        )
        return params, x, normalize_clip

    def test_value_parity_fp32(self):
        from robustvlm_tpu.models.clip.model import fold_normalization

        params, x, normalize_clip = self._setup()
        ref = encode_image(
            params, normalize_clip(x), CFG, normalize=True,
            compute_dtype=jnp.float32,
        )
        folded = {"visual": fold_normalization(params["visual"], CFG.patch_size)}
        got = encode_image(folded, x, CFG, normalize=True, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

    def test_grad_parity_wrt_pixels(self):
        from robustvlm_tpu.models.clip.model import fold_normalization

        params, x, normalize_clip = self._setup()
        folded = {"visual": fold_normalization(params["visual"], CFG.patch_size)}
        tgt = jax.random.normal(jax.random.PRNGKey(9), (CFG.embed_dim,))

        def loss_ref(xa):
            e = encode_image(
                params, normalize_clip(xa), CFG, normalize=True,
                compute_dtype=jnp.float32,
            )
            return jnp.sum(e @ tgt)

        def loss_fold(xa):
            e = encode_image(
                folded, xa, CFG, normalize=True, compute_dtype=jnp.float32
            )
            return jnp.sum(e @ tgt)

        g_ref = np.asarray(jax.grad(loss_ref)(x))
        g_fold = np.asarray(jax.grad(loss_fold)(x))
        np.testing.assert_allclose(
            g_fold, g_ref, atol=2e-5,
            err_msg="pixel gradients must match through the folded tower",
        )

    def test_bf16_compute_close(self):
        from robustvlm_tpu.models.clip.model import fold_normalization

        params, x, normalize_clip = self._setup()
        ref = encode_image(
            params, normalize_clip(x), CFG, normalize=True,
            compute_dtype=jnp.bfloat16,
        )
        folded = {"visual": fold_normalization(params["visual"], CFG.patch_size)}
        got = encode_image(folded, x, CFG, normalize=True, compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2)

    def test_requires_vit_tree(self):
        from robustvlm_tpu.models.clip.model import fold_normalization

        with pytest.raises(ValueError):
            fold_normalization({"stem": {}}, 14)
