"""LLaVA: multimodal splice, teacher-forced loss (attack target), HF vision
tower import parity, generation smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.models.generation import greedy_generate, left_pad
from robustvlm_tpu.models.llava.conversation import (
    answer_span,
    get_caption_prompt,
    get_vqa_prompt,
    split_at_image,
)
from robustvlm_tpu.models.llava.model import (
    LLAVA_CONFIGS,
    init_llava_params,
    llava_forward,
    llava_per_sample_loss,
    make_llava_decode_fns,
)

CFG = LLAVA_CONFIGS["test-tiny"]


def _inputs(b=2, t_pre=3, t_post=5, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(b, 3, CFG.vision.image_size, CFG.vision.image_size).astype(np.float32))
    pre = jnp.asarray(rng.randint(0, CFG.llama.vocab_size, (b, t_pre)))
    post = jnp.asarray(rng.randint(0, CFG.llama.vocab_size, (b, t_post)))
    return x, pre, post


class TestForward:
    def test_shapes(self):
        params = init_llava_params(jax.random.PRNGKey(0), CFG)
        x, pre, post = _inputs()
        logits = llava_forward(params, x, pre, post, CFG, compute_dtype=jnp.float32)
        t_expected = pre.shape[1] + CFG.n_image_tokens + post.shape[1]
        assert logits.shape == (2, t_expected, CFG.llama.vocab_size)

    def test_image_affects_logits(self):
        params = init_llava_params(jax.random.PRNGKey(0), CFG)
        x, pre, post = _inputs()
        l1 = llava_forward(params, x, pre, post, CFG, compute_dtype=jnp.float32)
        l2 = llava_forward(params, x + 0.05, pre, post, CFG, compute_dtype=jnp.float32)
        assert np.abs(np.asarray(l1 - l2)).max() > 1e-4


class TestLoss:
    def test_per_sample_and_grad(self):
        """The attack target: per-sample loss, differentiable wrt pixels."""
        params = init_llava_params(jax.random.PRNGKey(0), CFG)
        x, pre, post = _inputs()
        labels = post
        mask = jnp.ones_like(post, jnp.float32).at[:, :2].set(0.0)  # mask ctx

        def loss_fn(xx):
            return jnp.sum(
                llava_per_sample_loss(
                    params, xx, pre, post, labels, mask, CFG,
                    compute_dtype=jnp.float32,
                )
            )

        l, g = jax.value_and_grad(loss_fn)(x)
        assert np.isfinite(float(l))
        assert float(jnp.abs(g).max()) > 0

        per = llava_per_sample_loss(
            params, x, pre, post, labels, mask, CFG, compute_dtype=jnp.float32
        )
        assert per.shape == (2,)

    def test_mask_effect(self):
        params = init_llava_params(jax.random.PRNGKey(0), CFG)
        x, pre, post = _inputs()
        full = llava_per_sample_loss(
            params, x, pre, post, post, jnp.ones_like(post, jnp.float32),
            CFG, compute_dtype=jnp.float32, reduction_per_token="sum",
        )
        half_mask = jnp.ones_like(post, jnp.float32).at[:, : post.shape[1] // 2].set(0.0)
        half = llava_per_sample_loss(
            params, x, pre, post, post, half_mask,
            CFG, compute_dtype=jnp.float32, reduction_per_token="sum",
        )
        assert (np.asarray(half) <= np.asarray(full) + 1e-5).all()


class TestHFVisionImport:
    def test_tower_matches_hf(self):
        torch = pytest.importorskip("torch")
        from transformers import CLIPVisionConfig, CLIPVisionModel

        from robustvlm_tpu.models.clip.model import CLIPConfig, TransformerConfig, vision_forward
        from robustvlm_tpu.models.llava.import_torch import import_hf_clip_vision

        vc = CLIPConfig(
            "hf-tiny", 64, 32, 8, TransformerConfig(64, 2, 4),
            TransformerConfig(64, 2, 4), quick_gelu=False,
        )
        hf_cfg = CLIPVisionConfig(
            hidden_size=64, intermediate_size=256, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
            hidden_act="gelu", layer_norm_eps=1e-5,
        )
        torch.manual_seed(0)
        hf = CLIPVisionModel(hf_cfg).eval()
        sd = {"pfx." + k: v for k, v in hf.state_dict().items()}
        visual = import_hf_clip_vision(sd, vc, "pfx.")

        x = np.random.RandomState(0).rand(2, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            # hidden_states[-2] == output of all-but-last encoder layer
            # (pre final layernorm) — what LLaVA consumes (select_layer=-2)
            out = hf(torch.from_numpy(x), output_hidden_states=True)
            ref = out.hidden_states[-2].numpy()
        ours = np.asarray(
            vision_forward(
                {"visual": visual}, jnp.asarray(x), vc, tokens=True,
                n_skip_last=1, compute_dtype=jnp.float32,
            )
        )
        np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


class TestGeneration:
    def test_greedy_smoke_and_image_dependence(self):
        params = init_llava_params(jax.random.PRNGKey(0), CFG)
        x, pre, _ = _inputs(b=1)
        post, n_pad = left_pad([[7, 8, 9]])
        pf, df = make_llava_decode_fns(
            params, CFG, x, pre[:1], max_total_len=12, compute_dtype=jnp.float32
        )
        r1 = greedy_generate(
            pf, df, jnp.asarray(post), jnp.asarray(n_pad),
            max_new_tokens=4, eos_id=-1,
        )
        assert r1.tokens.shape == (1, 4)
        pf2, df2 = make_llava_decode_fns(
            params, CFG, jnp.clip(x + 0.3, 0, 1), pre[:1], max_total_len=12,
            compute_dtype=jnp.float32,
        )
        r2 = greedy_generate(
            pf2, df2, jnp.asarray(post), jnp.asarray(n_pad),
            max_new_tokens=4, eos_id=-1,
        )
        # different image -> (almost surely) different continuation scores
        assert float(abs(r1.scores[0] - r2.scores[0])) > 1e-6


class TestConversation:
    def test_vqa_prompt_structure(self):
        p = get_vqa_prompt("What is this?", "a cat")
        assert "<image>" in p and "USER:" in p and "ASSISTANT:" in p
        pre, post = split_at_image(p)
        assert "<image>" not in pre + post

    def test_answer_span(self):
        p = get_caption_prompt("a dog on grass")
        ctx, ans = answer_span(p)
        assert ctx.endswith("ASSISTANT:")
        assert "a dog on grass" in ans


class TestLlavaMpt:
    """MPT-backed LLaVA (reference llava/model/language_model/llava_mpt.py):
    same splice/loss/generation machinery over the MPT decoder."""

    @pytest.fixture(scope="class")
    def setup(self):
        from robustvlm_tpu.models.llava.model import (
            LLAVA_CONFIGS, init_llava_params,
        )

        cfg = LLAVA_CONFIGS["test-tiny-mpt"]
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
        return cfg, params

    def test_forward_shapes_and_loss(self, setup):
        from robustvlm_tpu.models.llava.model import (
            llava_forward, llava_per_sample_loss,
        )

        cfg, params = setup
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(2, 3, 32, 32).astype(np.float32))
        pre = jnp.asarray(rng.randint(3, 100, (2, 4)))
        post = jnp.asarray(rng.randint(3, 100, (2, 6)))
        logits = llava_forward(params, x, pre, post, cfg,
                               compute_dtype=jnp.float32)
        n_img = cfg.n_image_tokens
        assert logits.shape == (2, 4 + n_img + 6, cfg.mpt.vocab_size)
        mask = jnp.ones((2, 6), jnp.float32)
        loss = llava_per_sample_loss(params, x, pre, post, post, mask, cfg,
                                     compute_dtype=jnp.float32)
        assert loss.shape == (2,) and np.all(np.isfinite(np.asarray(loss)))

    def test_grads_reach_pixels(self, setup):
        from robustvlm_tpu.models.llava.model import llava_per_sample_loss

        cfg, params = setup
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(1, 3, 32, 32).astype(np.float32))
        pre = jnp.asarray(rng.randint(3, 100, (1, 3)))
        post = jnp.asarray(rng.randint(3, 100, (1, 5)))
        mask = jnp.ones((1, 5), jnp.float32)

        def f(xx):
            return jnp.sum(llava_per_sample_loss(
                params, xx, pre, post, post, mask, cfg,
                compute_dtype=jnp.float32,
            ))

        g = jax.grad(f)(x)
        assert float(jnp.abs(g).max()) > 0.0

    def test_cached_decode_matches_forward(self, setup):
        """Prefill+decode path (generation) agrees with the full forward."""
        from robustvlm_tpu.models.llava.model import (
            llava_forward, make_llava_decode_fns,
        )

        cfg, params = setup
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.rand(1, 3, 32, 32).astype(np.float32))
        pre = jnp.asarray(rng.randint(3, 100, (1, 3)))
        post = np.asarray(rng.randint(3, 100, (1, 5)))
        full = llava_forward(params, x, pre, jnp.asarray(post), cfg,
                             compute_dtype=jnp.float32)
        pf, df = make_llava_decode_fns(
            params, cfg, x, pre, max_total_len=16, compute_dtype=jnp.float32,
        )
        kv_valid = jnp.ones((1, 5), bool)
        positions = jnp.broadcast_to(jnp.arange(5)[None], (1, 5))
        last, cache = pf(jnp.asarray(post), kv_valid, positions)
        np.testing.assert_allclose(
            np.asarray(last), np.asarray(full[:, -1]), atol=2e-4, rtol=2e-3
        )

    def test_generation_invariant_to_batch_padding(self, setup):
        """Regression (ALiBi + mid-sequence padding): a short prompt's
        greedy generation must be identical whether it is batched with a
        longer prompt (left-padded) or run alone — slot-distance ALiBi
        inflated image/prefix distances by n_pad for padded rows."""
        from robustvlm_tpu.models.generation import greedy_generate, left_pad
        from robustvlm_tpu.models.llava.model import make_llava_decode_fns

        cfg, params = setup
        rng = np.random.RandomState(3)
        x1 = jnp.asarray(rng.rand(1, 3, 32, 32).astype(np.float32))
        short = list(rng.randint(3, 100, 4))
        long = list(rng.randint(3, 100, 9))

        def gen(x, seqs, max_total):
            toks, n_pad = left_pad(seqs, 0)
            pf, df = make_llava_decode_fns(
                params, cfg, x, jnp.asarray([[5, 6, 7]] * x.shape[0]),
                max_total_len=max_total, compute_dtype=jnp.float32,
            )
            return greedy_generate(
                pf, df, jnp.asarray(toks), jnp.asarray(n_pad),
                max_new_tokens=5, eos_id=2, pad_id=0,
            ).tokens

        solo = np.asarray(gen(x1, [short], 16))[0]
        batched = np.asarray(
            gen(jnp.concatenate([x1, x1]), [short, long], 16)
        )[0]
        np.testing.assert_array_equal(solo, batched)

    def test_beam_generation_runs(self, setup):
        """Beam search over the MPT-family carry (cache + kv position
        table) — exercises the reorder_carry protocol."""
        from robustvlm_tpu.models.generation import beam_generate, left_pad
        from robustvlm_tpu.models.llava.model import make_llava_decode_fns

        cfg, params = setup
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.rand(2, 3, 32, 32).astype(np.float32))
        seqs = [list(rng.randint(3, 100, 4)), list(rng.randint(3, 100, 6))]
        toks, n_pad = left_pad(seqs, 0)
        pf, df = make_llava_decode_fns(
            params, cfg, x, jnp.asarray([[5, 6, 7]] * 2),
            max_total_len=12, compute_dtype=jnp.float32,
        )
        res = beam_generate(
            pf, df, jnp.asarray(toks), jnp.asarray(n_pad),
            max_new_tokens=4, eos_id=2, num_beams=2, pad_id=0,
        )
        assert res.tokens.shape == (2, 4)
        assert np.all(np.isfinite(np.asarray(res.scores)))


class TestLlavaMptImport:
    def test_llava_mpt_state_dict_roundtrip(self):
        """Reference LlavaMPTForCausalLM layout (everything under
        `transformer.`, llava_mpt.py:54) imports into a working model."""
        from robustvlm_tpu.models.clip.import_torch import (
            export_visual_state_dict,
        )
        from robustvlm_tpu.models.llava.import_torch import (
            import_llava_state_dict,
        )
        from robustvlm_tpu.models.llava.model import (
            LLAVA_CONFIGS, init_llava_params, llava_forward,
        )
        from robustvlm_tpu.models.mpt.model import init_mpt_params

        cfg = LLAVA_CONFIGS["test-tiny-mpt"]
        src = init_llava_params(jax.random.PRNGKey(3), cfg)

        # fabricate the torch-layout dict: MPT keys (inverse of
        # import_mpt_state_dict's map) + transformer.mm_projector
        mpt = src["mpt"]
        sd = {"transformer.wte.weight": np.asarray(mpt["tok_embedding"])}
        for i in range(cfg.mpt.n_layers):
            blk = f"transformer.blocks.{i}."
            b = mpt["blocks"]
            sd[blk + "norm_1.weight"] = np.asarray(b["norm_1"][i])
            sd[blk + "norm_2.weight"] = np.asarray(b["norm_2"][i])
            sd[blk + "attn.Wqkv.weight"] = np.asarray(b["attn"]["wqkv"][i]).T
            sd[blk + "attn.out_proj.weight"] = np.asarray(b["attn"]["out_w"][i]).T
            sd[blk + "ffn.up_proj.weight"] = np.asarray(b["mlp"]["up_w"][i]).T
            sd[blk + "ffn.down_proj.weight"] = np.asarray(b["mlp"]["down_w"][i]).T
        sd["transformer.norm_f.weight"] = np.asarray(mpt["norm_f"])
        pr = src["projector"]
        sd["transformer.mm_projector.0.weight"] = np.asarray(pr["w1"]).T
        sd["transformer.mm_projector.0.bias"] = np.asarray(pr["b1"])
        sd["transformer.mm_projector.2.weight"] = np.asarray(pr["w2"]).T
        sd["transformer.mm_projector.2.bias"] = np.asarray(pr["b2"])

        vis_sd = export_visual_state_dict(src["vision"], cfg.vision)
        params = import_llava_state_dict(sd, cfg, robust_vision_sd=vis_sd)

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 3, 32, 32).astype(np.float32))
        pre = jnp.asarray(rng.randint(3, 100, (1, 3)))
        post = jnp.asarray(rng.randint(3, 100, (1, 4)))
        ref = llava_forward(src, x, pre, post, cfg, compute_dtype=jnp.float32)
        out = llava_forward(params, x, pre, post, cfg, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-4)
