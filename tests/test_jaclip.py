"""ja_clip family: native BERT/RoBERTa text tower + CLIP ViT vision
(reference CLIP_benchmark/clip_benchmark/models/japanese_clip.py — rinna's
Japanese CLIP via the external `japanese_clip` package; here native).

The text encoder is pinned against transformers.RobertaModel (constructible
offline with random weights) through the HF importer — the same oracle
pattern as the torch attack-parity suite."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_cfg():
    from robustvlm_tpu.models.jaclip import JACLIP_CONFIGS

    return JACLIP_CONFIGS["test-tiny"]


class TestBertParityVsTransformers:
    def _hf_model(self, tc):
        torch = pytest.importorskip("torch")
        from transformers import RobertaConfig, RobertaModel

        cfg = RobertaConfig(
            vocab_size=tc.vocab_size, hidden_size=tc.hidden,
            num_hidden_layers=tc.layers, num_attention_heads=tc.heads,
            intermediate_size=tc.intermediate,
            max_position_embeddings=tc.max_positions,
            type_vocab_size=tc.type_vocab, pad_token_id=tc.pad_token_id,
            layer_norm_eps=tc.layer_norm_eps, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        torch.manual_seed(0)
        m = RobertaModel(cfg, add_pooling_layer=False)
        m.eval()
        return m

    def test_last_hidden_state_matches_hf(self):
        torch = pytest.importorskip("torch")
        from robustvlm_tpu.models.jaclip import bert_text_forward
        from robustvlm_tpu.models.jaclip.import_torch import import_hf_roberta

        tc = _tiny_cfg().text
        m = self._hf_model(tc)
        params = import_hf_roberta(m.state_dict(), tc)

        rng = np.random.RandomState(0)
        ids = rng.randint(5, tc.vocab_size, (2, 11))
        mask = np.ones((2, 11), np.int64)
        mask[1, 7:] = 0  # ragged batch: padding must be masked identically
        ids[1, 7:] = tc.pad_token_id

        with torch.no_grad():
            ref = m(
                input_ids=torch.tensor(ids),
                attention_mask=torch.tensor(mask),
            ).last_hidden_state.numpy()

        ours = np.asarray(
            bert_text_forward(
                params, jnp.asarray(ids), jnp.asarray(mask), tc
            )
        )
        # valid positions must match tightly; padded positions are dead
        np.testing.assert_allclose(ref[0], ours[0], atol=2e-5)
        np.testing.assert_allclose(ref[1, :7], ours[1, :7], atol=2e-5)

    def test_position_ids_follow_roberta_convention(self):
        """RoBERTa: positions count real tokens from offset 2; pads get
        pad_token_id. (The reference wrapper warns position_ids are
        required for correct ja_clip results.)"""
        from robustvlm_tpu.models.jaclip import default_position_ids

        tc = _tiny_cfg().text
        mask = jnp.asarray([[1, 1, 1, 0, 0]])
        pos = default_position_ids(jnp.zeros((1, 5), jnp.int32), mask, tc)
        assert pos.tolist() == [[2, 3, 4, tc.pad_token_id, tc.pad_token_id]]

    def test_rinna_config_uses_arange_positions(self):
        """rinna's ja_clip.tokenize passes explicit position_ids =
        arange(seq_len) for every row, pads included — NOT the HF cumsum
        convention (the wrapper's 'you must input ... position_ids'
        warning exists precisely because they differ)."""
        import dataclasses

        from robustvlm_tpu.models.jaclip import (
            JACLIP_CONFIGS, default_position_ids,
        )

        tc = JACLIP_CONFIGS["ja_clip-vit-b-16"].text
        assert tc.position_convention == "arange"
        mask = jnp.asarray([[1, 1, 1, 0, 0]])
        pos = default_position_ids(jnp.zeros((1, 5), jnp.int32), mask, tc)
        assert pos.tolist() == [[0, 1, 2, 3, 4]]
        # the two conventions produce different embeddings for the same ids
        rob = dataclasses.replace(tc, position_convention="roberta")
        assert (
            default_position_ids(jnp.zeros((1, 5), jnp.int32), mask, rob)
            .tolist() != pos.tolist()
        )


class TestJaTokenizerProtocol:
    class _FakeHFTok:
        """Stands in for rinna's T5-based japanese-roberta-base tokenizer:
        does NOT auto-add [CLS] (add_special_tokens=False path)."""

        cls_token_id = 4

        def __call__(self, texts, *, padding, truncation, max_length,
                     add_special_tokens, return_tensors):
            assert add_special_tokens is False  # rinna prepends CLS itself
            ids = np.ones((len(texts), max_length), np.int64)  # pad=1
            mask = np.zeros((len(texts), max_length), np.int64)
            for i, t in enumerate(texts):
                toks = [10 + j for j in range(len(str(t).split()))][:max_length]
                ids[i, : len(toks)] = toks
                mask[i, : len(toks)] = 1
            return {"input_ids": ids, "attention_mask": mask}

    def test_hf_wrapper_prepends_cls(self):
        """rinna protocol: encode to max_len-1 with add_special_tokens=False
        then prepend cls_token_id by hand (japanese_clip tokenize)."""
        from robustvlm_tpu.models.jaclip import wrap_hf_ja_tokenizer

        tokenize = wrap_hf_ja_tokenizer(self._FakeHFTok(), max_len=8)
        ids, mask = tokenize(["a b c", "d"])
        assert ids.shape == (2, 8) and mask.shape == (2, 8)
        assert ids[:, 0].tolist() == [4, 4]  # CLS slot first
        assert mask[:, 0].tolist() == [1, 1]
        assert ids[0, 1:4].tolist() == [10, 11, 12]

    def test_hf_wrapper_requires_cls_id(self):
        from robustvlm_tpu.models.jaclip import wrap_hf_ja_tokenizer

        class NoCls:
            cls_token_id = None
            bos_token_id = None

        with pytest.raises(ValueError, match="cls_token_id"):
            wrap_hf_ja_tokenizer(NoCls())

    def test_hash_tokenizer_has_cls_slot(self):
        """The offline hash tokenizer mirrors the protocol: constant CLS
        token (id 0) in slot 0 so pool='cls' reads a real CLS position."""
        from robustvlm_tpu.models.jaclip import get_ja_tokenizer

        cfg = _tiny_cfg()
        tokenize = get_ja_tokenizer(None, cfg, max_len=8)
        ids, mask = tokenize(["some words here", "x"])
        assert ids[:, 0].tolist() == [0, 0]
        assert mask[:, 0].tolist() == [1, 1]
        assert int(ids[0, 1]) >= 2  # content tokens follow


class TestJaClipModel:
    def test_encode_text_shapes_and_normalize(self):
        from robustvlm_tpu.models.jaclip import (
            encode_text, init_jaclip_params,
        )

        cfg = _tiny_cfg()
        params = init_jaclip_params(jax.random.PRNGKey(0), cfg)
        ids = jnp.asarray([[5, 6, 7, 1, 1], [8, 9, 10, 11, 12]])
        mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])
        e = encode_text(params, ids, mask, cfg, normalize=True)
        assert e.shape == (2, cfg.embed_dim)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(e), axis=-1), 1.0, atol=1e-5
        )

    def test_encode_image_is_clip_tower(self):
        from robustvlm_tpu.models.jaclip import encode_image, init_jaclip_params

        cfg = _tiny_cfg()
        params = init_jaclip_params(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((2, 3, cfg.image_size, cfg.image_size))
        e = encode_image(params, x, cfg, normalize=True)
        assert e.shape == (2, cfg.vision.embed_dim)

    def test_mean_pool_differs_from_cls(self):
        import dataclasses

        from robustvlm_tpu.models.jaclip import encode_text, init_jaclip_params

        cfg = _tiny_cfg()
        params = init_jaclip_params(jax.random.PRNGKey(0), cfg)
        ids = jnp.asarray([[5, 6, 7, 8, 9]])
        mask = jnp.ones((1, 5), jnp.int32)
        e_cls = encode_text(params, ids, mask, cfg)
        cfg_mean = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text, pool="mean")
        )
        e_mean = encode_text(params, ids, mask, cfg_mean)
        assert not np.allclose(np.asarray(e_cls), np.asarray(e_mean))


class TestJaClipCli:
    def test_zeroshot_cli_end_to_end(self, tmp_path, monkeypatch):
        """`--model ja_clip-test-tiny --language jp` runs the full zero-shot
        benchmark CLI through the native BERT text tower (round-2 gap: this
        path was a NotImplementedError stub)."""
        from tests.test_benchmark import TestTfdsVtabAdapter

        rng = np.random.RandomState(0)
        examples = [
            {"image": rng.randint(0, 255, (32, 32, 3), np.uint8),
             "label": i % 2}
            for i in range(4)
        ]
        TestTfdsVtabAdapter._install_fake_tfds(
            monkeypatch, examples, label_names=("猫", "犬")
        )
        from robustvlm_tpu.benchmark.cli import main

        res = main([
            "eval", "--model", "ja_clip-test-tiny", "--pretrained", "random",
            "--dataset", "tfds/cifar10", "--dataset_root", "",
            "--task", "zeroshot_classification", "--language", "jp",
            "--batch_size", "2", "--n_samples", "4",
            "--output", str(tmp_path / "{model}_{dataset}_{task}.json"),
        ])
        assert len(res) == 1 and "acc1" in res[0]["metrics"]

    def test_unknown_ja_clip_model_raises(self):
        """No silent fallback to the b-16 config: an unknown name must be a
        loud KeyError, matching the non-ja branch's CLIP_CONFIGS lookup."""
        from robustvlm_tpu.benchmark.cli import main

        with pytest.raises(KeyError, match="unknown ja_clip"):
            main([
                "eval", "--model", "ja_clip-vit-l-14", "--pretrained",
                "random", "--dataset", "tfds/cifar10", "--dataset_root", "",
                "--task", "zeroshot_classification", "--language", "jp",
            ])

    def test_non_classification_task_raises(self):
        from robustvlm_tpu.benchmark.cli import main

        with pytest.raises(NotImplementedError, match="zeroshot_classification"):
            main([
                "eval", "--model", "ja_clip-test-tiny", "--pretrained",
                "random", "--dataset", "mscoco_captions", "--dataset_root",
                "x", "--task", "zeroshot_retrieval",
            ])


class TestRinnaImporterDiagnostics:
    def test_missing_text_tower_raises_with_keys(self, tmp_path):
        torch = pytest.importorskip("torch")
        from robustvlm_tpu.models.jaclip.import_torch import import_rinna_jaclip

        p = tmp_path / "bad.pt"
        torch.save({"some.random.key": torch.zeros(2)}, p)
        with pytest.raises(ValueError, match="word_embeddings"):
            import_rinna_jaclip(str(p), _tiny_cfg())

    def test_roundtrip_from_hf_plus_clip_layout(self, tmp_path):
        """A synthetic rinna-style checkpoint (HF text tower under
        text_model., CLIP visual under visual., text_projection Linear)
        imports and encodes."""
        torch = pytest.importorskip("torch")
        from transformers import RobertaConfig, RobertaModel

        from robustvlm_tpu.models.clip.import_torch import (
            export_visual_state_dict,
        )
        from robustvlm_tpu.models.jaclip import (
            encode_text, init_jaclip_params,
        )
        from robustvlm_tpu.models.jaclip.import_torch import import_rinna_jaclip

        cfg = _tiny_cfg()
        tc = cfg.text
        hf = RobertaModel(
            RobertaConfig(
                vocab_size=tc.vocab_size, hidden_size=tc.hidden,
                num_hidden_layers=tc.layers, num_attention_heads=tc.heads,
                intermediate_size=tc.intermediate,
                max_position_embeddings=tc.max_positions,
                type_vocab_size=tc.type_vocab, pad_token_id=tc.pad_token_id,
            ),
            add_pooling_layer=False,
        )
        sd = {f"text_model.{k}": v for k, v in hf.state_dict().items()}
        sd["text_projection.weight"] = torch.zeros(cfg.embed_dim, tc.hidden)
        native = init_jaclip_params(jax.random.PRNGKey(0), cfg)
        for k, v in export_visual_state_dict(native["visual"], cfg.vision).items():
            sd[f"visual.{k}"] = torch.tensor(np.asarray(v))
        p = tmp_path / "rinna.pt"
        torch.save(sd, p)

        params = import_rinna_jaclip(str(p), cfg)
        ids = jnp.asarray([[5, 6, 7]])
        e = encode_text(params, ids, jnp.ones((1, 3), jnp.int32), cfg)
        assert e.shape == (1, cfg.embed_dim)
        assert params["visual"]["patch_embed"].shape == native["visual"]["patch_embed"].shape
