"""Multilingual open_clip family (models/mclip.py): XLM-RoBERTa text tower
+ CLIP ViT vision (reference CLIP_benchmark model_collection.py:19-22
"openclip_multilingual", loaded there via open_clip's HFTextEncoder with
mean_pooler + proj='mlp').

Oracle pattern as tests/test_jaclip.py: transformers.XLMRobertaModel is
constructible offline with random weights; the full open_clip text path
(encoder -> masked mean -> bias-free MLP proj with exact GELU) is rebuilt
in torch and pinned bit-for-bit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_cfg():
    from robustvlm_tpu.models.mclip import MCLIP_CONFIGS

    return MCLIP_CONFIGS["test-tiny-mclip"]


def _hf_xlmr(tc):
    torch = pytest.importorskip("torch")
    from transformers import XLMRobertaConfig, XLMRobertaModel

    cfg = XLMRobertaConfig(
        vocab_size=tc.vocab_size, hidden_size=tc.hidden,
        num_hidden_layers=tc.layers, num_attention_heads=tc.heads,
        intermediate_size=tc.intermediate,
        max_position_embeddings=tc.max_positions,
        type_vocab_size=tc.type_vocab, pad_token_id=tc.pad_token_id,
        layer_norm_eps=tc.layer_norm_eps, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    m = XLMRobertaModel(cfg, add_pooling_layer=False)
    m.eval()
    return m


class TestXlmRobertaParity:
    def test_full_open_clip_text_path_matches_torch(self):
        """encoder -> attention-masked mean pool -> Linear/GELU/Linear
        (bias-free) == the torch rebuild of open_clip hf_model.py's
        mean_pooler + proj='mlp', bit-for-bit on random weights."""
        torch = pytest.importorskip("torch")
        from robustvlm_tpu.models.jaclip.import_torch import import_hf_roberta
        from robustvlm_tpu.models.mclip import encode_text, init_mclip_params

        cfg = _tiny_cfg()
        tc = cfg.text
        m = _hf_xlmr(tc)

        hid = cfg.proj_hidden
        torch.manual_seed(1)
        proj = torch.nn.Sequential(
            torch.nn.Linear(tc.hidden, hid, bias=False),
            torch.nn.GELU(),
            torch.nn.Linear(hid, cfg.embed_dim, bias=False),
        )
        proj.eval()

        params = init_mclip_params(jax.random.PRNGKey(0), cfg)
        params["text"] = import_hf_roberta(m.state_dict(), tc)
        params["text_projection"] = {
            "fc_w": jnp.asarray(proj[0].weight.detach().numpy().T),
            "out_w": jnp.asarray(proj[2].weight.detach().numpy().T),
        }

        rng = np.random.RandomState(0)
        ids = rng.randint(5, tc.vocab_size, (2, 11))
        mask = np.ones((2, 11), np.int64)
        mask[1, 7:] = 0
        ids[1, 7:] = tc.pad_token_id

        with torch.no_grad():
            h = m(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
            ).last_hidden_state
            tm = torch.tensor(mask)[..., None].float()
            pooled = (h * tm).sum(1) / tm.sum(1).clamp(min=1.0)
            ref = proj(pooled).numpy()

        ours = np.asarray(
            encode_text(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
        )
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_registry_dims_match_hf_xlm_roberta(self):
        from robustvlm_tpu.models.mclip import MCLIP_CONFIGS

        base = MCLIP_CONFIGS["xlm-roberta-base-ViT-B-32"]
        large = MCLIP_CONFIGS["xlm-roberta-large-ViT-H-14"]
        for c in (base, large):
            assert c.text.vocab_size == 250002
            assert c.text.max_positions == 514
            assert c.text.pool == "mean" and c.proj_arch == "mlp"
        assert (base.text.hidden, base.text.layers, base.text.heads,
                base.text.intermediate) == (768, 12, 12, 3072)
        assert (large.text.hidden, large.text.layers, large.text.heads,
                large.text.intermediate) == (1024, 24, 16, 4096)
        assert base.embed_dim == 512 and base.vision.name == "ViT-B-32-laion"
        assert large.embed_dim == 1024 and large.vision.name == "ViT-H-14"
        # full-size trees type-check without allocation
        from robustvlm_tpu.models.mclip import init_mclip_params

        tree = jax.eval_shape(
            lambda: init_mclip_params(jax.random.PRNGKey(0), base)
        )
        assert tree["text_projection"]["fc_w"].shape == (768, 640)
        assert tree["text_projection"]["out_w"].shape == (640, 512)


class TestOpenClipImporter:
    def test_composite_checkpoint_roundtrip(self, tmp_path):
        """A synthetic open_clip-layout multilingual checkpoint
        (text.transformer.* HF tower, text.proj.0/2.weight Sequential,
        visual.* ViT) imports; text encodes match the torch oracle."""
        torch = pytest.importorskip("torch")
        from robustvlm_tpu.models.clip.import_torch import (
            export_visual_state_dict,
        )
        from robustvlm_tpu.models.mclip import (
            encode_image,
            encode_text,
            import_open_clip_mclip,
            init_mclip_params,
        )

        cfg = _tiny_cfg()
        tc = cfg.text
        m = _hf_xlmr(tc)
        hid = cfg.proj_hidden
        torch.manual_seed(1)
        fc = torch.nn.Linear(tc.hidden, hid, bias=False)
        out = torch.nn.Linear(hid, cfg.embed_dim, bias=False)

        sd = {f"text.transformer.{k}": v for k, v in m.state_dict().items()}
        sd["text.proj.0.weight"] = fc.weight.detach()
        sd["text.proj.2.weight"] = out.weight.detach()
        native = init_mclip_params(jax.random.PRNGKey(0), cfg)
        for k, v in export_visual_state_dict(
            native["visual"], cfg.vision
        ).items():
            sd[f"visual.{k}"] = torch.tensor(np.asarray(v))
        sd["logit_scale"] = torch.tensor(3.3)
        p = tmp_path / "mclip.pt"
        torch.save(sd, p)

        params = import_open_clip_mclip(str(p), cfg)
        assert float(params["logit_scale"]) == pytest.approx(3.3)

        ids = jnp.asarray([[5, 6, 7, 8]])
        mask = jnp.ones((1, 4), jnp.int32)
        e = np.asarray(encode_text(params, ids, mask, cfg))
        with torch.no_grad():
            h = m(
                input_ids=torch.tensor(np.asarray(ids)),
                attention_mask=torch.tensor(np.asarray(mask)),
            ).last_hidden_state
            pooled = h.mean(1)  # all positions valid
            ref = out(torch.nn.functional.gelu(fc(pooled))).numpy()
        np.testing.assert_allclose(e, ref, atol=2e-5)

        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 3, 32, 32), jnp.float32
        )
        img = np.asarray(encode_image(params, x, cfg))
        ref_img = np.asarray(encode_image(native, x, cfg))
        np.testing.assert_allclose(img, ref_img, atol=1e-5)

    def test_missing_proj_raises(self, tmp_path):
        torch = pytest.importorskip("torch")
        from robustvlm_tpu.models.mclip import import_open_clip_mclip

        cfg = _tiny_cfg()
        m = _hf_xlmr(cfg.text)
        sd = {f"text.transformer.{k}": v for k, v in m.state_dict().items()}
        p = tmp_path / "bad.pt"
        torch.save(sd, p)
        with pytest.raises(ValueError, match="MLP text projection"):
            import_open_clip_mclip(str(p), cfg)


class TestMclipCli:
    def test_zeroshot_cli_end_to_end(self, tmp_path, monkeypatch):
        """`--model test-tiny-mclip --language it` runs the full zero-shot
        benchmark CLI through the multilingual text tower."""
        from tests.test_benchmark import TestTfdsVtabAdapter

        rng = np.random.RandomState(0)
        examples = [
            {"image": rng.randint(0, 255, (32, 32, 3), np.uint8),
             "label": i % 2}
            for i in range(4)
        ]
        TestTfdsVtabAdapter._install_fake_tfds(
            monkeypatch, examples, label_names=("gatto", "cane")
        )
        from robustvlm_tpu.benchmark.cli import main

        res = main([
            "eval", "--model", "test-tiny-mclip", "--pretrained", "random",
            "--dataset", "tfds/cifar10", "--dataset_root", "",
            "--task", "zeroshot_classification",
            "--batch_size", "2", "--n_samples", "4",
            "--output", str(tmp_path / "{model}_{dataset}_{task}.json"),
        ])
        assert len(res) == 1 and "acc1" in res[0]["metrics"]

    def test_non_classification_task_raises(self):
        from robustvlm_tpu.benchmark.cli import main

        with pytest.raises(NotImplementedError, match="zeroshot_classification"):
            main([
                "eval", "--model", "xlm-roberta-base-ViT-B-32",
                "--pretrained", "random", "--dataset", "mscoco_captions",
                "--dataset_root", "x", "--task", "zeroshot_retrieval",
            ])
