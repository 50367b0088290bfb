"""Prompt-lookup speculative decoding (serve/speculative.py): greedy
verification makes the emitted stream TOKEN-EXACT vs the plain jitted
stream decode for ANY drafter — every scenario here pins that parity, plus
the drafter/acceptance bookkeeping. Beyond-reference feature: the
reference worker generates strictly one token per forward
(llava/serve/model_worker.py:126-226)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.serve.speculative import (
    draft_prompt_lookup,
    spec_stream_tokens,
)


@pytest.fixture(scope="module")
def setup():
    from robustvlm_tpu.models.llava.model import (
        LLAVA_CONFIGS,
        init_llava_params,
    )
    from robustvlm_tpu.vlm_eval.eval_models import (
        LlavaEvalModel,
        WordTokenizer,
    )

    cfg = LLAVA_CONFIGS["test-tiny"]
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    model = LlavaEvalModel(
        params, cfg, WordTokenizer(cfg.llama.vocab_size),
        compute_dtype=jnp.float32, max_post_len=16,
    )
    rng = np.random.RandomState(1)
    imgs = [rng.rand(3, 32, 32).astype(np.float32) for _ in range(3)]
    prompt = model.get_caption_prompt()

    def collect(gen, tok):
        ids = []
        for t in gen:
            tid = int(t[0])
            if tid in (tok.eos_token_id, tok.pad_token_id):
                break
            ids.append(tid)
        return ids

    def solo(m, img, max_new=8):
        return collect(
            m.stream_tokens(jnp.asarray(img)[None], [prompt], max_new),
            m.tok,
        )

    return cfg, params, model, imgs, prompt, collect, solo


# ---------------------------------------------------------------- drafter
def test_drafter_latest_ngram_wins():
    # [5,6] occurs at 0 and 4; the most recent (4) supplies the draft
    assert draft_prompt_lookup(
        [5, 6, 7, 9, 5, 6, 8, 5, 6], 2
    ) == [8, 5]


def test_drafter_no_match_repeats_last():
    assert draft_prompt_lookup([1, 2, 3], 3) == [3, 3, 3]


def test_drafter_short_continuation_pads():
    # match at 0, only 2 continuation tokens available for k=3
    assert draft_prompt_lookup([9, 5, 9, 5], 3) == [9, 5, 5]


def test_drafter_prefers_longer_ngram():
    # 1-gram [6] would draft 9 (latest [... ,6,9]); the 2-gram [5,6]
    # match must win and draft 7
    ids = [5, 6, 7, 3, 6, 9, 5, 6]
    assert draft_prompt_lookup(ids, 1)[0] == 7


def test_drafter_k_zero():
    assert draft_prompt_lookup([1, 2], 0) == []


# ------------------------------------------------------------- exactness
@pytest.mark.parametrize("k", [1, 3, 8])
def test_token_exact_vs_stream(setup, k):
    _, _, model, imgs, prompt, collect, solo = setup
    for img in imgs[:2]:
        ref = solo(model, img)
        got = collect(
            spec_stream_tokens(
                model, jnp.asarray(img)[None], [prompt], 8, k=k
            ),
            model.tok,
        )
        assert got == ref


def test_token_exact_int8_kv(setup):
    cfg, params, _, imgs, prompt, collect, solo = setup
    from robustvlm_tpu.vlm_eval.eval_models import (
        LlavaEvalModel,
        WordTokenizer,
    )

    m = LlavaEvalModel(
        params, cfg, WordTokenizer(cfg.llama.vocab_size),
        compute_dtype=jnp.float32, max_post_len=16,
    )
    m.quantize_kv = True
    ref = solo(m, imgs[0])
    got = collect(
        spec_stream_tokens(
            m, jnp.asarray(imgs[0])[None], [prompt], 8, k=3
        ),
        m.tok,
    )
    assert got == ref


def test_token_exact_unstacked_serving_layout(setup):
    """The 7B serving layout (params['layers']) — the layout the real chip
    serves speculative requests from."""
    cfg, params, _, imgs, prompt, collect, solo = setup
    from robustvlm_tpu.vlm_eval.eval_models import (
        LlavaEvalModel,
        WordTokenizer,
    )

    p = jax.tree.map(lambda a: a, params)
    blocks = p["llama"]["blocks"]
    p["layers"] = tuple(
        jax.tree.map(lambda a, i=i: a[i], blocks)
        for i in range(cfg.llama.n_layers)
    )
    m = LlavaEvalModel(
        p, cfg, WordTokenizer(cfg.llama.vocab_size),
        compute_dtype=jnp.float32, max_post_len=16,
    )
    ref = solo(m, imgs[0])
    got = collect(
        spec_stream_tokens(
            m, jnp.asarray(imgs[0])[None], [prompt], 8, k=4
        ),
        m.tok,
    )
    assert got == ref


def test_adversarial_drafter_cannot_corrupt_output(setup):
    """The strongest cache-safety probe: a drafter that proposes maximally
    wrong tokens (never accepted, every verify writes k stale rows) still
    yields the exact greedy stream — rejected rows are provably never
    read (module docstring)."""
    _, _, model, imgs, prompt, collect, solo = setup
    ref = solo(model, imgs[0])

    def hostile(ids, k):
        # propose tokens != anything plausible: cycle through ids far from
        # the argmax trajectory; correctness must not depend on content
        return [(7 + 13 * j + len(ids)) % 500 for j in range(k)]

    got = collect(
        spec_stream_tokens(
            model, jnp.asarray(imgs[0])[None], [prompt], 8, k=5,
            drafter=hostile,
        ),
        model.tok,
    )
    assert got == ref


# ------------------------------------------------------------ acceptance
def test_oracle_drafter_full_acceptance(setup):
    """A drafter that proposes the true greedy continuation gets every
    draft accepted: emission runs in bursts of k+1 per verify step and the
    stats record accept_rate 1.0. (Drives the m>0 burst path explicitly —
    the random tiny model rarely self-agrees via n-gram lookup.)"""
    _, _, model, imgs, prompt, collect, solo = setup
    k, max_new = 3, 8
    for img in imgs:
        ref = solo(model, img, max_new)
        if len(ref) == max_new:  # no EOS inside the window: clean oracle
            break
    else:
        pytest.skip("all probe images hit EOS early")
    x = jnp.asarray(img)[None]
    pre_ids, toks, n_pad = model._tokenize_gen([prompt])
    prompt_ids = list(pre_ids) + [int(v) for v in toks[0][int(n_pad[0]):]]

    def oracle(ids, kk):
        g = len(ids) - len(prompt_ids)  # tokens generated so far
        cont = ref[g: g + kk]
        return list(cont) + [0] * (kk - len(cont))

    stats = {}
    got = collect(
        spec_stream_tokens(
            model, x, [prompt], max_new, k=k, drafter=oracle, stats=stats
        ),
        model.tok,
    )
    assert got == ref
    # full acceptance until the cap: ceil((max_new - 1) / (k + 1)) steps
    assert stats["verify_steps"] == -(-(max_new - 1) // (k + 1))
    assert stats["emitted"] == max_new
    assert stats["accept_rate"] > 0.5  # the cap can truncate the last burst


def test_stats_counts_rejections(setup):
    _, _, model, imgs, prompt, collect, _ = setup

    def hostile(ids, k):
        return [499] * k

    stats = {}
    collect(
        spec_stream_tokens(
            model, jnp.asarray(imgs[0])[None], [prompt], 6, k=2,
            drafter=hostile, stats=stats,
        ),
        model.tok,
    )
    # hostile drafts never accepted: one verify per emitted token past the
    # prefill token (unless EOS ended the stream first)
    assert stats["verify_steps"] >= 1
    assert stats["accept_rate"] == 0.0


# ------------------------------------------------------------------ edges
def test_max_new_cap_mid_burst(setup):
    """The cap can land inside an accepted burst: emission must stop at
    exactly max_new tokens and match the plain stream's prefix."""
    _, _, model, imgs, prompt, collect, solo = setup
    full = solo(model, imgs[0], 8)
    if len(full) < 5:
        pytest.skip("EOS before the cap point on this seed")

    # oracle: always draft the remaining true tokens
    pre_ids, toks, n_pad = model._tokenize_gen([prompt])
    n_prompt = len(pre_ids) + (toks.shape[1] - int(n_pad[0]))

    def oracle(ids, kk):
        g = len(ids) - n_prompt
        cont = full[g: g + kk]
        return list(cont) + [0] * (kk - len(cont))

    got = collect(
        spec_stream_tokens(
            model, jnp.asarray(imgs[0])[None], [prompt], 5, k=8,
            drafter=oracle,
        ),
        model.tok,
    )
    assert got == full[:5]


def test_max_new_zero_emits_nothing(setup):
    _, _, model, imgs, prompt, _, _ = setup
    assert list(
        spec_stream_tokens(model, jnp.asarray(imgs[0])[None], [prompt], 0)
    ) == []


def test_batch_gt1_rejected(setup):
    _, _, model, imgs, prompt, _, _ = setup
    x = jnp.asarray(np.stack(imgs[:2]))
    with pytest.raises(ValueError, match="single-stream"):
        next(iter(spec_stream_tokens(model, x, [prompt, prompt], 4)))


def test_bad_k_rejected(setup):
    _, _, model, imgs, prompt, _, _ = setup
    with pytest.raises(ValueError, match="k must be"):
        next(iter(
            spec_stream_tokens(
                model, jnp.asarray(imgs[0])[None], [prompt], 4, k=0
            )
        ))


def test_worker_stream_routes_through_speculative(setup):
    """--speculate worker path: /worker_generate_stream through the
    speculative decoder yields the same final text as the plain stream."""
    from robustvlm_tpu.serve.model_worker import ModelWorker
    from robustvlm_tpu.vlm_eval.eval_models import truncate_at_stops

    _, _, model, imgs, prompt, collect, solo = setup
    ref_text = truncate_at_stops(
        model.tok.decode(solo(model, imgs[0])), model.DEFAULT_STOPS
    )
    w = ModelWorker(
        model, "llava-tiny", worker_address="",
        controller_address=None, image_size=32, speculate=3,
    )
    payload = {"image": imgs[0].tolist(), "task": "caption",
               "max_new_tokens": 8}
    chunks = list(w.generate_stream(dict(payload)))
    assert all(c["error_code"] == 0 for c in chunks)
    assert chunks[-1]["text"] == ref_text
