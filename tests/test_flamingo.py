"""MPT decoder + Flamingo: ALiBi, causality, cache parity, media masking,
teacher-forced loss (attack target), generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.models.flamingo.model import (
    FLAMINGO_CONFIGS,
    encode_vision,
    flamingo_forward,
    flamingo_per_sample_loss,
    init_flamingo_params,
    make_flamingo_decode_fns,
    masked_cross_attention,
    perceiver_resampler,
)
from robustvlm_tpu.models.generation import greedy_generate, left_pad
from robustvlm_tpu.models.mpt.model import (
    MPT_CONFIGS,
    alibi_slopes,
    init_mpt_cache,
    init_mpt_params,
    mpt_forward,
)

MCFG = MPT_CONFIGS["test-tiny"]
FCFG = FLAMINGO_CONFIGS["test-tiny"]


class TestAlibi:
    def test_slopes_power_of_two(self):
        s = alibi_slopes(4, 8.0)
        np.testing.assert_allclose(s, [2.0 ** -2, 2.0 ** -4, 2.0 ** -6, 2.0 ** -8])

    def test_slopes_non_power_of_two(self):
        s = alibi_slopes(6, 8.0)
        # n'=8: slopes_8 = 2^-1..2^-8; interleave odd idx then even, take 6
        s8 = [2.0 ** -(i + 1) for i in range(8)]
        expect = np.concatenate([s8[1::2], s8[::2]])[:6]
        np.testing.assert_allclose(s, expect)


class TestMPT:
    def test_causality(self):
        params = init_mpt_params(jax.random.PRNGKey(0), MCFG)
        toks = np.random.RandomState(0).randint(0, MCFG.vocab_size, (1, 10))
        t2 = toks.copy()
        t2[0, -1] = (t2[0, -1] + 5) % MCFG.vocab_size
        l1 = mpt_forward(params, jnp.asarray(toks), cfg=MCFG, compute_dtype=jnp.float32)
        l2 = mpt_forward(params, jnp.asarray(t2), cfg=MCFG, compute_dtype=jnp.float32)
        np.testing.assert_allclose(l1[:, :-1], l2[:, :-1], atol=1e-5)

    def test_alibi_shift_invariance_differs_from_no_bias(self):
        """ALiBi must make logits depend on relative distance: permuting
        distant context tokens changes the last-token logits differently than
        near ones would under pure bag-of-words."""
        params = init_mpt_params(jax.random.PRNGKey(0), MCFG)
        toks = np.random.RandomState(1).randint(0, MCFG.vocab_size, (1, 12))
        base = mpt_forward(params, jnp.asarray(toks), cfg=MCFG, compute_dtype=jnp.float32)
        perm = toks.copy()
        perm[0, 0], perm[0, 5] = perm[0, 5], perm[0, 0]
        swapped = mpt_forward(params, jnp.asarray(perm), cfg=MCFG, compute_dtype=jnp.float32)
        assert np.abs(np.asarray(base[:, -1] - swapped[:, -1])).max() > 1e-6

    def test_cache_matches_full(self):
        params = init_mpt_params(jax.random.PRNGKey(0), MCFG)
        toks = np.random.RandomState(2).randint(0, MCFG.vocab_size, (2, 8))
        full = np.asarray(
            mpt_forward(params, jnp.asarray(toks), cfg=MCFG, compute_dtype=jnp.float32)
        )
        cache = init_mpt_cache(MCFG, 2, max_len=12, dtype=jnp.float32)
        l5, cache = mpt_forward(
            params, jnp.asarray(toks[:, :5]), cfg=MCFG, compute_dtype=jnp.float32,
            cache=cache, cache_pos=0,
        )
        np.testing.assert_allclose(np.asarray(l5), full[:, :5], atol=1e-4)
        for i in range(5, 8):
            li, cache = mpt_forward(
                params, jnp.asarray(toks[:, i : i + 1]), cfg=MCFG,
                compute_dtype=jnp.float32, cache=cache, cache_pos=i,
                positions=jnp.asarray([i]),
            )
            np.testing.assert_allclose(np.asarray(li[:, 0]), full[:, i], atol=1e-4)


class TestPerceiver:
    def test_output_shape(self):
        params = init_flamingo_params(jax.random.PRNGKey(0), FCFG)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 1, 16, 64).astype(np.float32))
        out = perceiver_resampler(params["perceiver"], x, FCFG)
        assert out.shape == (2, 3, FCFG.num_latents, 64)

    def test_media_slots_independent(self):
        """Each media slot resamples independently (no cross-T leakage)."""
        params = init_flamingo_params(jax.random.PRNGKey(0), FCFG)
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(1, 2, 1, 16, 64).astype(np.float32))
        out = perceiver_resampler(params["perceiver"], x, FCFG)
        x2 = x.at[:, 1].set(jnp.asarray(rng.rand(1, 1, 16, 64)))
        out2 = perceiver_resampler(params["perceiver"], x2, FCFG)
        np.testing.assert_allclose(out[:, 0], out2[:, 0], atol=1e-6)
        assert np.abs(np.asarray(out[:, 1] - out2[:, 1])).max() > 1e-4


class TestMediaMasking:
    def test_immediate_media_only(self):
        """A text token after media 1 must ignore media 2's latents."""
        params = init_flamingo_params(jax.random.PRNGKey(0), FCFG)
        xp = jax.tree.map(lambda a: a[0], params["xattn"])["attn"]
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 6, 64).astype(np.float32))
        media = jnp.asarray(rng.rand(1, 2, 4, 64).astype(np.float32))
        # tokens 0..2 follow media 1 (loc at 0); tokens 3.. follow media 2
        locs = jnp.asarray([[True, False, False, True, False, False]])
        out1 = masked_cross_attention(x, media, xp, FCFG.resampler_heads, locs)
        media2 = media.at[:, 1].set(jnp.asarray(rng.rand(1, 4, 64)))
        out2 = masked_cross_attention(x, media2, xp, FCFG.resampler_heads, locs)
        np.testing.assert_allclose(out1[:, :3], out2[:, :3], atol=1e-6)
        assert np.abs(np.asarray(out1[:, 3:] - out2[:, 3:])).max() > 1e-5

    def test_no_preceding_media_zeroed(self):
        params = init_flamingo_params(jax.random.PRNGKey(0), FCFG)
        xp = jax.tree.map(lambda a: a[0], params["xattn"])["attn"]
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(1, 4, 64).astype(np.float32))
        media = jnp.asarray(rng.rand(1, 1, 4, 64).astype(np.float32))
        locs = jnp.asarray([[False, False, True, False]])
        out = masked_cross_attention(x, media, xp, FCFG.resampler_heads, locs)
        # first two tokens (no media before them): xattn output must be 0
        np.testing.assert_allclose(np.asarray(out[:, :2]), 0.0, atol=1e-6)


def _gated_params():
    """Random Flamingo params with OPEN gates (reference inits gates at 0 =
    identity; tests need image influence)."""
    params = init_flamingo_params(jax.random.PRNGKey(0), FCFG)
    params["xattn"]["attn_gate"] = jnp.ones_like(params["xattn"]["attn_gate"]) * 0.5
    params["xattn"]["ff_gate"] = jnp.ones_like(params["xattn"]["ff_gate"]) * 0.5
    return params


class TestFlamingoForward:
    def test_shapes_and_image_dependence(self):
        params = _gated_params()
        rng = np.random.RandomState(0)
        vx = jnp.asarray(rng.rand(1, 1, 1, 3, 32, 32).astype(np.float32))
        lang = jnp.asarray([[cfg_media := 500, 5, 6, 7, 8]])
        cfg = FCFG.__class__(**{**FCFG.__dict__, "media_token_id": 500})
        logits = flamingo_forward(params, vx, lang, cfg, compute_dtype=jnp.float32)
        assert logits.shape == (1, 5, MCFG.vocab_size)
        l2 = flamingo_forward(
            params, jnp.clip(vx + 0.2, 0, 1), lang, cfg, compute_dtype=jnp.float32
        )
        assert np.abs(np.asarray(logits - l2)).max() > 1e-5

    def test_loss_grad_wrt_pixels(self):
        params = _gated_params()
        cfg = FCFG.__class__(**{**FCFG.__dict__, "media_token_id": 500})
        rng = np.random.RandomState(0)
        vx = jnp.asarray(rng.rand(1, 1, 1, 3, 32, 32).astype(np.float32))
        lang = jnp.asarray([[500, 5, 6, 7, 8]])
        mask = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 1.0]])

        def f(v):
            return jnp.sum(
                flamingo_per_sample_loss(
                    params, v, lang, lang, mask, cfg, compute_dtype=jnp.float32
                )
            )

        l, g = jax.value_and_grad(f)(vx)
        assert np.isfinite(float(l))
        assert float(jnp.abs(g).max()) > 0


class TestFlamingoGeneration:
    def test_greedy_smoke(self):
        params = _gated_params()
        cfg = FCFG.__class__(**{**FCFG.__dict__, "media_token_id": 500})
        rng = np.random.RandomState(0)
        vx = jnp.asarray(rng.rand(1, 1, 1, 3, 32, 32).astype(np.float32))
        toks, n_pad = left_pad([[500, 5, 6, 7]])
        pf, df = make_flamingo_decode_fns(
            params, cfg, vx, max_total_len=16, compute_dtype=jnp.float32
        )
        res = greedy_generate(
            pf, df, jnp.asarray(toks), jnp.asarray(n_pad),
            max_new_tokens=4, eos_id=-1,
        )
        assert res.tokens.shape == (1, 4)

    def test_cached_decode_matches_full_forward(self):
        """Greedy via KV cache == argmax rollout of the full forward."""
        params = _gated_params()
        cfg = FCFG.__class__(**{**FCFG.__dict__, "media_token_id": 500})
        rng = np.random.RandomState(3)
        vx = jnp.asarray(rng.rand(1, 1, 1, 3, 32, 32).astype(np.float32))
        seq = [500, 5, 6]
        toks, n_pad = left_pad([seq])
        pf, df = make_flamingo_decode_fns(
            params, cfg, vx, max_total_len=16, compute_dtype=jnp.float32
        )
        res = greedy_generate(
            pf, df, jnp.asarray(toks), jnp.asarray(n_pad),
            max_new_tokens=3, eos_id=-1,
        )
        manual = list(seq)
        for _ in range(3):
            logits = flamingo_forward(
                params, vx, jnp.asarray([manual]), cfg, compute_dtype=jnp.float32
            )
            manual.append(int(jnp.argmax(logits[0, -1])))
        assert list(np.asarray(res.tokens[0])) == manual[len(seq):]


class TestFlamingoBeam:
    def test_beam_generation_runs(self):
        """Regression: beam search reorders the (cache, media_locations)
        carry — the default axis-1 gather corrupted media_locations
        (batch is on axis 0 there) and crashed the scan."""
        from robustvlm_tpu.models.generation import beam_generate

        params = _gated_params()
        cfg = FCFG.__class__(**{**FCFG.__dict__, "media_token_id": 500})
        rng = np.random.RandomState(5)
        vx = jnp.asarray(rng.rand(2, 1, 1, 3, 32, 32).astype(np.float32))
        toks, n_pad = left_pad([[500, 5, 6, 7], [500, 9, 11]])
        pf, df = make_flamingo_decode_fns(
            params, cfg, vx, max_total_len=12, compute_dtype=jnp.float32
        )
        res = beam_generate(
            pf, df, jnp.asarray(toks), jnp.asarray(n_pad),
            max_new_tokens=3, eos_id=-1, num_beams=2,
        )
        assert res.tokens.shape == (2, 3)
        assert np.all(np.isfinite(np.asarray(res.scores)))


class TestStreamingDecode:
    def test_stream_tokens_match_greedy(self):
        """greedy_generate_stream must emit exactly greedy_generate's
        token sequence (the serving stream is the same math, host-driven)."""
        from robustvlm_tpu.models.generation import greedy_generate_stream

        params = _gated_params()
        cfg = FCFG.__class__(**{**FCFG.__dict__, "media_token_id": 500})
        rng = np.random.RandomState(8)
        vx = jnp.asarray(rng.rand(1, 1, 1, 3, 32, 32).astype(np.float32))
        toks, n_pad = left_pad([[500, 5, 6, 7]])
        pf, df = make_flamingo_decode_fns(
            params, cfg, vx, max_total_len=16, compute_dtype=jnp.float32
        )
        res = greedy_generate(
            pf, df, jnp.asarray(toks), jnp.asarray(n_pad),
            max_new_tokens=4, eos_id=-1,
        )
        streamed = [
            int(t[0]) for t in greedy_generate_stream(
                pf, df, jnp.asarray(toks), jnp.asarray(n_pad),
                max_new_tokens=4, eos_id=-1,
            )
        ]
        assert streamed == [int(v) for v in np.asarray(res.tokens[0])]
