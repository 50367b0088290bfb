"""BLIP-2 family vs a tiny HF Blip2ForConditionalGeneration oracle.

Same strategy as the LLaMA/MPT parity tests: build a random tiny HF model on
CPU, import its weights, and require activation/logit/loss agreement — then
the big checkpoints import by construction (the state-dict layout is
identical for Salesforce/blip2-opt-*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from robustvlm_tpu.models.blip2 import (
    BLIP2_CONFIGS,
    blip2_forward,
    blip2_per_sample_loss,
    blip2_vision_forward,
    init_blip2_params,
    qformer_forward,
)
from robustvlm_tpu.models.blip2.import_torch import import_blip2_torch_model
from robustvlm_tpu.models.opt import OPT_CONFIGS, init_opt_cache, init_opt_params, opt_forward
from robustvlm_tpu.ops.image import normalize_clip

CFG = BLIP2_CONFIGS["test-tiny"]
IMAGE_TOKEN_ID = 120  # < tiny vocab 128


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Blip2Config, Blip2ForConditionalGeneration

    torch.manual_seed(0)
    cfg = Blip2Config(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            image_size=32, patch_size=8, intermediate_size=64,
            hidden_act="gelu",
        ),
        qformer_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, encoder_hidden_size=32,
            cross_attention_frequency=2, hidden_act="gelu",
        ),
        text_config=dict(
            model_type="opt", hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, ffn_dim=128, vocab_size=128,
            word_embed_proj_dim=64, max_position_embeddings=64,
            activation_function="relu", do_layer_norm_before=True,
        ),
        num_query_tokens=4,
        image_token_index=IMAGE_TOKEN_ID,
    )
    model = Blip2ForConditionalGeneration(cfg).eval()
    return model


@pytest.fixture(scope="module")
def params(hf_model):
    return import_blip2_torch_model(hf_model, CFG)


@pytest.fixture(scope="module")
def pixels():
    # normalized-pixel tensor fed identically to both frameworks
    return np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)


class TestVisionParity:
    def test_last_hidden_state(self, hf_model, params, pixels):
        with torch.no_grad():
            ref = hf_model.vision_model(
                pixel_values=torch.from_numpy(pixels)
            ).last_hidden_state.numpy()
        out = blip2_vision_forward(params, jnp.asarray(pixels), CFG)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-4)


class TestQFormerParity:
    def test_query_output(self, hf_model, params, pixels):
        with torch.no_grad():
            img = hf_model.vision_model(
                pixel_values=torch.from_numpy(pixels)
            ).last_hidden_state
            q = hf_model.query_tokens.expand(img.shape[0], -1, -1)
            ref = hf_model.qformer(
                query_embeds=q,
                encoder_hidden_states=img,
                encoder_attention_mask=torch.ones(img.shape[:-1], dtype=torch.long),
            ).last_hidden_state.numpy()
        img_j = blip2_vision_forward(params, jnp.asarray(pixels), CFG)
        out = qformer_forward(params, img_j, CFG)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-4)


class TestFullModelParity:
    def test_logits(self, hf_model, params, pixels):
        rng = np.random.RandomState(1)
        text = rng.randint(0, 100, (2, 6))
        input_ids = np.concatenate(
            [np.full((2, CFG.num_query_tokens), IMAGE_TOKEN_ID), text], axis=1
        )
        with torch.no_grad():
            ref = hf_model(
                pixel_values=torch.from_numpy(pixels),
                input_ids=torch.from_numpy(input_ids),
                attention_mask=torch.ones_like(torch.from_numpy(input_ids)),
            ).logits.numpy()
        out = blip2_forward(
            params,
            # invert the in-model normalization so both see the same
            # normalized pixels while our API takes [0,1]-space input
            _unnormalize(pixels),
            jnp.asarray(text),
            CFG,
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=5e-4)

    def test_per_sample_loss_matches_hf(self, hf_model, params, pixels):
        rng = np.random.RandomState(2)
        text = rng.randint(0, 100, (1, 6))
        input_ids = np.concatenate(
            [np.full((1, CFG.num_query_tokens), IMAGE_TOKEN_ID), text], axis=1
        )
        # HF masks the prompt with -100; answer span = last 3 tokens
        labels = np.full_like(input_ids, -100)
        labels[:, -3:] = input_ids[:, -3:]
        with torch.no_grad():
            ref = float(
                hf_model(
                    pixel_values=torch.from_numpy(pixels[:1]),
                    input_ids=torch.from_numpy(input_ids),
                    attention_mask=torch.ones_like(torch.from_numpy(input_ids)),
                    labels=torch.from_numpy(labels),
                ).loss
            )
        mask = np.zeros_like(text, dtype=np.float32)
        mask[:, -3:] = 1.0
        loss = blip2_per_sample_loss(
            params,
            _unnormalize(pixels[:1]),
            jnp.asarray(text),
            jnp.asarray(text),
            jnp.asarray(mask),
            CFG,
        )
        assert abs(float(loss[0]) - ref) < 5e-5

    def test_grads_flow_to_pixels(self, params):
        x01 = jnp.asarray(
            np.random.RandomState(3).rand(1, 3, 32, 32).astype(np.float32)
        )
        text = jnp.asarray([[5, 6, 7, 8]])
        mask = jnp.asarray([[0.0, 1.0, 1.0, 1.0]])

        def f(x):
            return jnp.sum(
                blip2_per_sample_loss(params, x, text, text, mask, CFG)
            )

        g = jax.grad(f)(x01)
        assert float(jnp.max(jnp.abs(g))) > 0.0
        assert np.all(np.isfinite(np.asarray(g)))


class TestOPT:
    def test_kv_cache_matches_full_forward(self):
        cfg = OPT_CONFIGS["test-tiny"]
        params = init_opt_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(0)
        toks = jnp.asarray(rng.randint(0, cfg.vocab_size, (2, 10)))
        full = opt_forward(params, toks, cfg=cfg, compute_dtype=jnp.float32)

        cache = init_opt_cache(cfg, 2, max_len=16, dtype=jnp.float32)
        pre, cache = opt_forward(
            params, toks[:, :7], cfg=cfg, compute_dtype=jnp.float32,
            cache=cache, cache_pos=0,
        )
        np.testing.assert_allclose(pre, full[:, :7], atol=1e-5, rtol=1e-4)
        for t in range(7, 10):
            step, cache = opt_forward(
                params, toks[:, t : t + 1], cfg=cfg,
                compute_dtype=jnp.float32, cache=cache, cache_pos=t,
            )
            np.testing.assert_allclose(
                step[:, 0], full[:, t], atol=1e-5, rtol=1e-4
            )

    def test_hf_opt_parity(self):
        from transformers import OPTConfig as HFOPTConfig
        from transformers import OPTForCausalLM

        torch.manual_seed(1)
        hf = OPTForCausalLM(
            HFOPTConfig(
                hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
                ffn_dim=128, vocab_size=128, word_embed_proj_dim=64,
                max_position_embeddings=64, activation_function="relu",
                do_layer_norm_before=True,
            )
        ).eval()
        from robustvlm_tpu.models.blip2.import_torch import _import_opt

        cfg = OPT_CONFIGS["test-tiny"]
        params = _import_opt(hf.state_dict(), cfg, prefix="")
        toks = np.random.RandomState(4).randint(0, 128, (2, 9))
        with torch.no_grad():
            ref = hf(torch.from_numpy(toks)).logits.numpy()
        out = opt_forward(params, jnp.asarray(toks), cfg=cfg,
                          compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-4)


def _unnormalize(pixels_norm: np.ndarray) -> jax.Array:
    """Invert normalize_clip so blip2_forward (which normalizes inside, per
    the threat-model contract) sees exactly `pixels_norm`."""
    zeros = jnp.zeros_like(jnp.asarray(pixels_norm))
    ones = jnp.ones_like(zeros)
    lo = normalize_clip(zeros)          # (0 - mean) / std
    hi = normalize_clip(ones)           # (1 - mean) / std
    std_inv = hi - lo                   # 1 / std
    return (jnp.asarray(pixels_norm) - lo) / std_inv


class TestBlip2EvalModel:
    @pytest.fixture(scope="class")
    def adapter(self):
        from robustvlm_tpu.vlm_eval.eval_models import Blip2EvalModel, WordTokenizer

        params = init_blip2_params(jax.random.PRNGKey(0), CFG)
        tok = WordTokenizer(vocab_size=CFG.opt.vocab_size)
        return Blip2EvalModel(params, CFG, tok, max_len=16)

    def test_prompts_match_reference(self, adapter):
        # reference blip.py:105-112
        assert adapter.get_vqa_prompt("why?", "maybe") == "Question:why? Short answer:maybe"
        assert adapter.get_caption_prompt("a cat") == "A photo of a cat"
        assert adapter.get_caption_prompt() == "A photo of "

    def test_loss_and_mask(self, adapter):
        x01 = jnp.asarray(np.random.RandomState(0).rand(2, 3, 32, 32).astype(np.float32))
        adapter.set_inputs([
            adapter.get_vqa_prompt("what color", "blue"),
            adapter.get_caption_prompt("a dog runs"),
        ])
        loss = adapter(x01)
        assert loss.shape == (2,)
        assert np.all(np.isfinite(np.asarray(loss)))
        # answer mask excludes the context span
        _, _, mask = adapter._cached
        m = np.asarray(mask)
        assert m[0].sum() >= 2 and m[0][0] == 0.0

    def test_apgd_attack_increases_loss(self, adapter):
        from robustvlm_tpu.attacks.apgd import apgd_attack

        x01 = jnp.asarray(np.random.RandomState(1).rand(1, 3, 32, 32).astype(np.float32))
        adapter.set_inputs([adapter.get_vqa_prompt("what", "yes")])
        base = float(adapter(x01)[0])
        res = apgd_attack(
            adapter, x01, None, criterion=lambda o, y: o,
            eps=8 / 255, n_iter=5, norm="linf",
        )
        assert float(res.loss_best[0]) >= base
        assert float(jnp.max(jnp.abs(res.x_best - x01))) <= 8 / 255 + 1e-6

    def test_get_outputs_greedy_and_beam(self, adapter):
        x01 = jnp.asarray(np.random.RandomState(2).rand(2, 3, 32, 32).astype(np.float32))
        prompts = [adapter.get_caption_prompt(), adapter.get_caption_prompt()]
        outs = adapter.get_outputs(x01, prompts, max_new_tokens=4)
        assert len(outs) == 2 and all(isinstance(o, str) for o in outs)
        outs_beam = adapter.get_outputs(
            x01, prompts, max_new_tokens=4, num_beams=2, length_penalty=1.0
        )
        assert len(outs_beam) == 2


class TestAnswerSplit:
    def test_colon_in_answer_stays_whole(self):
        from robustvlm_tpu.vlm_eval.eval_models import Blip2EvalModel

        split = Blip2EvalModel._answer_split
        ctx, ans = split("Question:when? Short answer:4:30")
        assert ctx == "Question:when? Short answer:" and ans == "4:30"
        ctx, ans = split("A photo of a sign that reads: stop")
        assert ctx == "A photo of " and ans == "a sign that reads: stop"
        ctx, ans = split("Question:why? Short answer:maybe")
        assert ans == "maybe"
