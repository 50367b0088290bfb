"""LLaMA decoder: HF-parity, KV-cache consistency, generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.models.generation import (
    beam_generate,
    greedy_generate,
    left_pad,
    strip_after_eos,
)
from robustvlm_tpu.models.llama.model import (
    LLAMA_CONFIGS,
    init_cache,
    init_llama_params,
    llama_forward,
)

CFG = LLAMA_CONFIGS["test-tiny"]


class TestForward:
    def test_shapes_and_finite(self):
        params = init_llama_params(jax.random.PRNGKey(0), CFG)
        toks = jnp.asarray(np.random.RandomState(0).randint(0, CFG.vocab_size, (2, 10)))
        logits = llama_forward(params, toks, cfg=CFG, compute_dtype=jnp.float32)
        assert logits.shape == (2, 10, CFG.vocab_size)
        assert np.isfinite(np.asarray(logits)).all()

    def test_unrolled_blocks_match_scan(self):
        """unroll_blocks=True (the 7B single-chip memory path: static
        per-layer slices fold transposes into the dots instead of
        relayout-copying the stacked weights) is the same math as the
        scan."""
        params = init_llama_params(jax.random.PRNGKey(0), CFG)
        toks = jnp.asarray(
            np.random.RandomState(2).randint(0, CFG.vocab_size, (2, 9))
        )
        l_scan = llama_forward(
            params, toks, cfg=CFG, compute_dtype=jnp.float32
        )
        l_unroll = llama_forward(
            params, toks, cfg=CFG, compute_dtype=jnp.float32,
            unroll_blocks=True,
        )
        np.testing.assert_allclose(l_scan, l_unroll, atol=1e-5)

    def test_causality(self):
        """Changing a future token must not affect past logits."""
        params = init_llama_params(jax.random.PRNGKey(0), CFG)
        rng = np.random.RandomState(1)
        toks = rng.randint(0, CFG.vocab_size, (1, 12))
        toks2 = toks.copy()
        toks2[0, -1] = (toks2[0, -1] + 7) % CFG.vocab_size
        l1 = llama_forward(params, jnp.asarray(toks), cfg=CFG, compute_dtype=jnp.float32)
        l2 = llama_forward(params, jnp.asarray(toks2), cfg=CFG, compute_dtype=jnp.float32)
        np.testing.assert_allclose(l1[:, :-1], l2[:, :-1], atol=1e-5)
        assert np.abs(np.asarray(l1[:, -1] - l2[:, -1])).max() > 1e-4

    def test_hf_parity(self):
        """Import a random HF LlamaForCausalLM and match its logits."""
        torch = pytest.importorskip("torch")
        from transformers import LlamaConfig as HFConfig
        from transformers import LlamaForCausalLM

        from robustvlm_tpu.models.llama.import_torch import import_llama_state_dict

        hf_cfg = HFConfig(
            vocab_size=CFG.vocab_size, hidden_size=CFG.dim,
            intermediate_size=CFG.ffn_dim, num_hidden_layers=CFG.n_layers,
            num_attention_heads=CFG.n_heads, num_key_value_heads=CFG.n_kv_heads,
            max_position_embeddings=CFG.max_seq_len, rms_norm_eps=CFG.norm_eps,
            rope_theta=CFG.rope_theta, attention_bias=False, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        hf = LlamaForCausalLM(hf_cfg).eval()
        toks = np.random.RandomState(2).randint(0, CFG.vocab_size, (2, 9))
        with torch.no_grad():
            ref = hf(torch.from_numpy(toks)).logits.numpy()
        params = import_llama_state_dict(hf.state_dict(), CFG)
        ours = np.asarray(
            llama_forward(params, jnp.asarray(toks), cfg=CFG, compute_dtype=jnp.float32)
        )
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)

    @pytest.mark.parametrize("name", ["test-tiny-gqa"])
    def test_gqa_hf_parity(self, name):
        torch = pytest.importorskip("torch")
        from transformers import LlamaConfig as HFConfig
        from transformers import LlamaForCausalLM

        from robustvlm_tpu.models.llama.import_torch import import_llama_state_dict

        cfg = LLAMA_CONFIGS[name]
        hf_cfg = HFConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
            intermediate_size=cfg.ffn_dim, num_hidden_layers=cfg.n_layers,
            num_attention_heads=cfg.n_heads, num_key_value_heads=cfg.n_kv_heads,
            max_position_embeddings=cfg.max_seq_len, rms_norm_eps=cfg.norm_eps,
            rope_theta=cfg.rope_theta, attention_bias=False, tie_word_embeddings=False,
        )
        torch.manual_seed(1)
        hf = LlamaForCausalLM(hf_cfg).eval()
        toks = np.random.RandomState(3).randint(0, cfg.vocab_size, (1, 7))
        with torch.no_grad():
            ref = hf(torch.from_numpy(toks)).logits.numpy()
        params = import_llama_state_dict(hf.state_dict(), cfg)
        ours = np.asarray(
            llama_forward(params, jnp.asarray(toks), cfg=cfg, compute_dtype=jnp.float32)
        )
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


class TestCache:
    def test_cached_matches_full(self):
        """Prefill + stepwise decode logits == full forward logits."""
        params = init_llama_params(jax.random.PRNGKey(0), CFG)
        toks = np.random.RandomState(4).randint(0, CFG.vocab_size, (2, 8))
        full = np.asarray(
            llama_forward(params, jnp.asarray(toks), cfg=CFG, compute_dtype=jnp.float32)
        )
        cache = init_cache(CFG, 2, max_len=16, dtype=jnp.float32)
        # prefill first 5
        l5, cache = llama_forward(
            params, jnp.asarray(toks[:, :5]), cfg=CFG, compute_dtype=jnp.float32,
            cache=cache, cache_pos=0,
        )
        np.testing.assert_allclose(np.asarray(l5), full[:, :5], atol=1e-4)
        # decode 5..8 one token at a time
        for i in range(5, 8):
            li, cache = llama_forward(
                params, jnp.asarray(toks[:, i : i + 1]), cfg=CFG,
                compute_dtype=jnp.float32, cache=cache, cache_pos=i,
            )
            np.testing.assert_allclose(
                np.asarray(li[:, 0]), full[:, i], atol=1e-4
            )


def _make_fns(params, max_total):
    def prefill_fn(tokens, kv_valid, positions):
        cache = init_cache(CFG, tokens.shape[0], max_len=max_total, dtype=jnp.float32)
        logits, cache = llama_forward(
            params, tokens, cfg=CFG, compute_dtype=jnp.float32,
            positions=positions, cache=cache, cache_pos=0, kv_mask=kv_valid,
        )
        return logits[:, -1], cache

    def decode_fn(tok, cache, pos, kv_mask, qpos):
        return llama_forward(
            params, tok, cfg=CFG, compute_dtype=jnp.float32,
            positions=qpos, cache=cache, cache_pos=pos,
            kv_mask=kv_mask,
        )

    return prefill_fn, decode_fn


class TestGeneration:
    def test_greedy_matches_manual_argmax(self):
        params = init_llama_params(jax.random.PRNGKey(0), CFG)
        prompt = [[5, 6, 7, 8]]
        toks, n_pad = left_pad(prompt)
        pre, dec = _make_fns(params, max_total=16)
        res = greedy_generate(
            pre, dec, jnp.asarray(toks), jnp.asarray(n_pad),
            max_new_tokens=4, eos_id=-1,
        )
        # manual: roll the full forward
        seq = list(prompt[0])
        for _ in range(4):
            logits = llama_forward(
                params, jnp.asarray([seq]), cfg=CFG, compute_dtype=jnp.float32
            )
            seq.append(int(jnp.argmax(logits[0, -1])))
        assert list(np.asarray(res.tokens[0])) == seq[4:]

    def test_greedy_left_padded_batch(self):
        """Different-length prompts in one batch generate the same tokens as
        each alone."""
        params = init_llama_params(jax.random.PRNGKey(0), CFG)
        prompts = [[5, 6, 7, 8], [9, 10]]
        toks, n_pad = left_pad(prompts)
        pre, dec = _make_fns(params, max_total=16)
        res = greedy_generate(
            pre, dec, jnp.asarray(toks), jnp.asarray(n_pad),
            max_new_tokens=3, eos_id=-1,
        )
        for i, p in enumerate(prompts):
            t1, n1 = left_pad([p])
            r1 = greedy_generate(
                pre, dec, jnp.asarray(t1), jnp.asarray(n1),
                max_new_tokens=3, eos_id=-1,
            )
            assert list(np.asarray(res.tokens[i])) == list(np.asarray(r1.tokens[0])), i

    def test_beam_not_worse_than_greedy(self):
        params = init_llama_params(jax.random.PRNGKey(1), CFG)
        toks, n_pad = left_pad([[3, 4, 5]])
        pre, dec = _make_fns(params, max_total=16)
        g = greedy_generate(
            pre, dec, jnp.asarray(toks), jnp.asarray(n_pad),
            max_new_tokens=4, eos_id=-1,
        )
        b = beam_generate(
            pre, dec, jnp.asarray(toks), jnp.asarray(n_pad),
            max_new_tokens=4, eos_id=-1, num_beams=3, length_penalty=0.0,
        )
        assert float(b.scores[0]) >= float(g.scores[0]) - 1e-4

    def test_strip_after_eos(self):
        out = strip_after_eos(np.array([[4, 5, 2, 9], [1, 0, 0, 0]]), eos_id=2)
        assert out == [[4, 5], [1]]
