"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from robustvlm_tpu.models.clip import CLIP_CONFIGS, init_clip_params
from robustvlm_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    replicate,
    shard_params,
)
from robustvlm_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step

CFG = CLIP_CONFIGS["test-tiny"]


class TestMesh:
    def test_mesh_shapes(self):
        assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
        m = make_mesh()
        assert m.shape == {"data": 8, "fsdp": 1, "model": 1}
        m2 = make_mesh(data=2, fsdp=2, model=2)
        assert m2.shape == {"data": 2, "fsdp": 2, "model": 2}
        with pytest.raises(ValueError):
            make_mesh(data=3, fsdp=2, model=2)

    def test_param_rules_cover_tree(self):
        params = init_clip_params(jax.random.PRNGKey(0), CFG)
        mesh = make_mesh(data=2, fsdp=2, model=2)
        sh = param_sharding_rules(params, mesh)
        specs = jax.tree.leaves(
            jax.tree.map(lambda s: s.spec, sh,
                         is_leaf=lambda x: hasattr(x, "spec"))
        )
        # at least the attention/mlp weights must be model-sharded
        assert any("model" in str(s) for s in specs)

    def test_shard_params_places(self):
        params = init_clip_params(jax.random.PRNGKey(0), CFG)
        mesh = make_mesh(data=2, fsdp=2, model=2)
        sp = shard_params(params, mesh)
        qkv = sp["visual"]["blocks"]["attn"]["qkv_w"]
        assert qkv.sharding.spec == P(None, "fsdp", "model")
        # values unchanged
        np.testing.assert_array_equal(
            np.asarray(qkv), np.asarray(params["visual"]["blocks"]["attn"]["qkv_w"])
        )


class TestDataParallelTrainStep:
    def test_dp_step_matches_single_device(self):
        cfg = TrainConfig(attack="pgd", iterations_adv=2, eps=4 / 255,
                          warmup=2, steps=10, lr=1e-3)
        params = init_clip_params(jax.random.PRNGKey(0), CFG)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(8, 3, 32, 32).astype(np.float32))
        y = jnp.asarray(rng.randint(0, 10, 8))
        opt = make_optimizer(cfg)
        step = jax.jit(make_train_step(cfg, CFG, None))

        # single-device result
        p1, _, m1 = step(params, params, opt.init(params), x, y,
                         jax.random.PRNGKey(0), 0)

        # 8-way data parallel
        mesh = make_mesh()
        xs = jax.device_put(x, batch_sharding(mesh))
        ys = jax.device_put(y, batch_sharding(mesh, 1))
        pr = replicate(params, mesh)
        p2, _, m2 = step(pr, pr, opt.init(pr), xs, ys, jax.random.PRNGKey(0), 0)

        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
        # cross-shard reduction order perturbs grads at float ulp; Adam's
        # grad/sqrt(v) normalization can amplify that to O(lr) on individual
        # coordinates, so bound the divergence by one update magnitude.
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p1, p2)
        assert max(jax.tree.leaves(d)) < 2 * cfg.lr

    def test_tp_fsdp_step_executes(self):
        """Full train step with TP+FSDP+DP sharded params (the dryrun path)."""
        cfg = TrainConfig(attack="apgd", iterations_adv=2, eps=4 / 255,
                          warmup=2, steps=10, lr=1e-3)
        params = init_clip_params(jax.random.PRNGKey(0), CFG)
        mesh = make_mesh(data=2, fsdp=2, model=2)
        params = shard_params(params, mesh)
        rng = np.random.RandomState(0)
        x = jax.device_put(
            jnp.asarray(rng.rand(8, 3, 32, 32).astype(np.float32)),
            batch_sharding(mesh),
        )
        y = jax.device_put(jnp.asarray(rng.randint(0, 10, 8)),
                           batch_sharding(mesh, 1))
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        step = jax.jit(make_train_step(cfg, CFG, None))
        p2, _, m = step(params, params, opt_state, x, y, jax.random.PRNGKey(0), 0)
        assert np.isfinite(float(m["loss"]))
        # sharding preserved on outputs
        assert p2["visual"]["blocks"]["attn"]["qkv_w"].sharding.spec == P(
            None, "fsdp", "model"
        )


class TestShardedAttack:
    def test_dp_apgd_matches_single_device(self):
        """APGD sharded over the 8-device mesh == single-device APGD."""
        from robustvlm_tpu.attacks.apgd import apgd_attack
        from robustvlm_tpu.ops.losses import ce_loss
        from robustvlm_tpu.parallel.mesh import make_mesh, shard_attack

        rng = np.random.RandomState(0)
        W = jnp.asarray(rng.randn(3 * 8 * 8, 5).astype(np.float32)) * 0.1
        fn = lambda x: x.reshape(x.shape[0], -1) @ W
        x = jnp.asarray(rng.rand(16, 3, 8, 8).astype(np.float32))
        y = jnp.argmax(fn(x), -1)

        def attack(xx, yy):
            return apgd_attack(
                fn, xx, yy,
                criterion=lambda o, t: ce_loss(o, t, reduction="none"),
                eps=8 / 255, n_iter=8, norm="linf",
            ).x_best_adv

        single = attack(x, y)
        mesh = make_mesh()
        sharded = shard_attack(attack, mesh)(x, y)
        np.testing.assert_allclose(
            np.asarray(single), np.asarray(sharded), atol=2e-5
        )

        # params-as-jit-argument form (the production shape: the tree is a
        # runtime operand, never a closure constant)
        def attack_p(w, xx, yy):
            fn_w = lambda t: t.reshape(t.shape[0], -1) @ w
            return apgd_attack(
                fn_w, xx, yy,
                criterion=lambda o, t: ce_loss(o, t, reduction="none"),
                eps=8 / 255, n_iter=8, norm="linf",
            ).x_best_adv

        sharded_p = shard_attack(attack_p, mesh, params=W)(x, y)
        np.testing.assert_allclose(
            np.asarray(single), np.asarray(sharded_p), atol=2e-5
        )


def _sharded_fraction(params, mesh):
    """Fraction of tree bytes whose sharding is non-replicated."""
    sh = param_sharding_rules(params, mesh)
    total = sharded = 0
    for leaf, s in zip(jax.tree.leaves(params), jax.tree.leaves(
            sh, is_leaf=lambda x: hasattr(x, "spec"))):
        nbytes = leaf.size * leaf.dtype.itemsize
        total += nbytes
        if any(ax is not None for ax in s.spec):
            sharded += nbytes
    return sharded / total


class TestLMShardingRules:
    """The reference's FSDP scope (flamingo.py:252-351) covers the 7B LMs —
    the sharding rules must actually hit LLaMA/MPT/Flamingo param names, not
    just CLIP (round-1 gap: everything fell through to replicated)."""

    def test_llama_tree_mostly_sharded(self):
        from robustvlm_tpu.models.llama import LLAMA_CONFIGS
        from robustvlm_tpu.models.llama.model import init_llama_params

        params = init_llama_params(
            jax.random.PRNGKey(0), LLAMA_CONFIGS["test-tiny"]
        )
        mesh = make_mesh(data=2, fsdp=2, model=2)
        assert _sharded_fraction(params, mesh) > 0.5

    def test_mpt_tree_mostly_sharded(self):
        from robustvlm_tpu.models.mpt.model import MPT_CONFIGS, init_mpt_params

        params = init_mpt_params(jax.random.PRNGKey(0), MPT_CONFIGS["test-tiny"])
        mesh = make_mesh(data=2, fsdp=2, model=2)
        assert _sharded_fraction(params, mesh) > 0.5

    def test_flamingo_tree_mostly_sharded(self):
        from robustvlm_tpu.models.flamingo import (
            FLAMINGO_CONFIGS, init_flamingo_params,
        )

        params = init_flamingo_params(
            jax.random.PRNGKey(0), FLAMINGO_CONFIGS["test-tiny"]
        )
        mesh = make_mesh(data=2, fsdp=2, model=2)
        assert _sharded_fraction(params, mesh) > 0.5
        # resampler / xattn specifically (the reference FSDP wrap targets)
        frac_p = _sharded_fraction(params["perceiver"], mesh)
        frac_x = _sharded_fraction(params["xattn"], mesh)
        assert frac_p > 0.5 and frac_x > 0.5

    def test_llava_tree_mostly_sharded(self):
        from robustvlm_tpu.models.llava import LLAVA_CONFIGS, init_llava_params

        params = init_llava_params(
            jax.random.PRNGKey(0), LLAVA_CONFIGS["test-tiny"]
        )
        mesh = make_mesh(data=2, fsdp=2, model=2)
        assert _sharded_fraction(params, mesh) > 0.5

    def test_sharded_llava_grad_step_executes(self):
        """Grad-wrt-pixels through a (fsdp, model)-sharded LLaVA on the
        8-device mesh — the whole-VLM attack path of the ensemble harness."""
        from robustvlm_tpu.models.llava import LLAVA_CONFIGS, init_llava_params
        from robustvlm_tpu.models.llava.model import llava_per_sample_loss

        cfg = LLAVA_CONFIGS["test-tiny"]
        mesh = make_mesh(data=2, fsdp=2, model=2)
        params = shard_params(
            init_llava_params(jax.random.PRNGKey(0), cfg), mesh
        )
        rng = np.random.RandomState(0)
        b, t = 8, 12
        x = jax.device_put(
            jnp.asarray(rng.rand(b, 3, 32, 32).astype(np.float32)),
            batch_sharding(mesh),
        )
        tokens = jax.device_put(
            jnp.asarray(rng.randint(5, cfg.llama.vocab_size, (b, t))),
            batch_sharding(mesh, 2),
        )
        mask = jax.device_put(
            jnp.asarray(rng.rand(b, t) > 0.4, jnp.float32),
            batch_sharding(mesh, 2),
        )

        @jax.jit
        def grad_step(params, x, tokens, mask):
            def f(xx):
                return jnp.sum(llava_per_sample_loss(
                    params, xx, tokens, tokens, tokens, mask, cfg,
                    compute_dtype=jnp.float32,
                ))
            return jax.grad(f)(x)

        g = grad_step(params, x, tokens, mask)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0.0


    def test_blip2_tree_mostly_sharded(self):
        from robustvlm_tpu.models.blip2 import BLIP2_CONFIGS, init_blip2_params

        params = init_blip2_params(
            jax.random.PRNGKey(0), BLIP2_CONFIGS["test-tiny"]
        )
        mesh = make_mesh(data=2, fsdp=2, model=2)
        assert _sharded_fraction(params, mesh) > 0.5
        # the Q-Former's grouped (n_groups, freq, in, out) stacks must shard
        # on their trailing dims (opt decoder matched by the LM rules)
        assert _sharded_fraction(params["qformer"], mesh) > 0.5
        assert _sharded_fraction(params["opt"], mesh) > 0.5

    def test_sharded_blip2_grad_step_executes(self):
        from robustvlm_tpu.models.blip2 import BLIP2_CONFIGS, init_blip2_params
        from robustvlm_tpu.models.blip2.model import blip2_per_sample_loss

        cfg = BLIP2_CONFIGS["test-tiny"]
        mesh = make_mesh(data=2, fsdp=2, model=2)
        params = shard_params(
            init_blip2_params(jax.random.PRNGKey(0), cfg), mesh
        )
        rng = np.random.RandomState(0)
        b, t = 8, 8
        x = jax.device_put(
            jnp.asarray(rng.rand(b, 3, 32, 32).astype(np.float32)),
            batch_sharding(mesh),
        )
        tokens = jax.device_put(
            jnp.asarray(rng.randint(5, cfg.opt.vocab_size, (b, t))),
            batch_sharding(mesh, 2),
        )
        mask = jax.device_put(
            jnp.asarray(rng.rand(b, t) > 0.4, jnp.float32),
            batch_sharding(mesh, 2),
        )

        @jax.jit
        def grad_step(params, x, tokens, mask):
            def f(xx):
                return jnp.sum(blip2_per_sample_loss(
                    params, xx, tokens, tokens, mask, cfg,
                    compute_dtype=jnp.float32,
                ))
            return jax.grad(f)(x)

        g = grad_step(params, x, tokens, mask)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0.0


class TestMultihost:
    """DDP-equivalent eval sharding/merge (reference eval_model.py:20-22 +
    all_gather_object merge, run_evaluation.py:1766-1775)."""

    def test_shard_bounds_cover_exactly(self):
        from robustvlm_tpu.parallel.multihost import (
            process_shard_bounds, process_shard_indices,
        )

        for n in (0, 1, 7, 16, 100):
            for p in (1, 2, 3, 8):
                all_idx = np.concatenate([
                    process_shard_indices(n, i, p) for i in range(p)
                ]) if p else np.arange(0)
                np.testing.assert_array_equal(all_idx, np.arange(n))
                sizes = [
                    process_shard_bounds(n, i, p)[1]
                    - process_shard_bounds(n, i, p)[0]
                    for i in range(p)
                ]
                assert max(sizes) - min(sizes) <= 1  # balanced

    def test_single_process_gather_identity(self):
        from robustvlm_tpu.parallel.multihost import (
            all_gather_results, merge_metric_means,
        )

        local = {"acc": 0.5, "ids": np.asarray([1, 2])}
        merged = all_gather_results(local)
        assert merged == [{"acc": 0.5, "ids": [1, 2]}]
        m = merge_metric_means([{"acc": 0.25}, {"acc": 0.75}], [1, 3])
        assert m["acc"] == pytest.approx(0.625)


class TestBertTowerShardingRules:
    """BERT/XLM-R text towers (ja_clip + the multilingual mclip family)
    must shard like the other LMs — stacked (L,D,D) attention and (L,D,I)
    ffn on (fsdp, model), word embeddings on fsdp."""

    def test_mclip_tree_mostly_sharded(self):
        from robustvlm_tpu.models.mclip import MCLIP_CONFIGS, init_mclip_params

        params = init_mclip_params(
            jax.random.PRNGKey(0), MCLIP_CONFIGS["test-tiny-mclip"]
        )
        mesh = make_mesh(data=2, fsdp=2, model=2)
        assert _sharded_fraction(params, mesh) > 0.5
        assert _sharded_fraction(params["text"], mesh) > 0.5
        # the MLP projection dict (text_projection/fc_w|out_w) must shard
        # (checked through the FULL tree: the rule keys on the path prefix)
        sh = param_sharding_rules(params, mesh)
        assert tuple(sh["text_projection"]["fc_w"].spec) == ("fsdp", "model")
        assert tuple(sh["text_projection"]["out_w"].spec) == ("model", "fsdp")

    def test_sharded_mclip_text_encode_executes(self):
        from robustvlm_tpu.models.mclip import (
            MCLIP_CONFIGS, encode_text, init_mclip_params,
        )

        cfg = MCLIP_CONFIGS["test-tiny-mclip"]
        mesh = make_mesh(data=2, fsdp=2, model=2)
        params = shard_params(
            init_mclip_params(jax.random.PRNGKey(0), cfg), mesh
        )
        rng = np.random.RandomState(0)
        ids = jax.device_put(
            jnp.asarray(rng.randint(5, cfg.text.vocab_size, (8, 12))),
            batch_sharding(mesh, 2),
        )
        mask = jax.device_put(
            jnp.ones((8, 12), jnp.int32), batch_sharding(mesh, 2)
        )
        e = jax.jit(
            lambda p, i, m: encode_text(p, i, m, cfg, normalize=True)
        )(params, ids, mask)
        e = np.asarray(e)
        assert e.shape == (8, cfg.embed_dim) and np.isfinite(e).all()
        np.testing.assert_allclose(
            np.linalg.norm(e, axis=-1), 1.0, atol=1e-5
        )


class TestFitSpec:
    """Divisibility-aware spec degradation (parallel/mesh._fit_spec): a
    named axis that doesn't divide a param dim must fall back to
    replication for THAT dim only — ViT-L/14's (588, 1024) patch_embed
    with an 8-way fsdp axis is the production case (588 = 3*14*14)."""

    def test_indivisible_dim_replicates(self):
        from robustvlm_tpu.parallel.mesh import param_sharding_rules

        mesh = make_mesh(data=1, fsdp=8, model=1)
        tree = {"patch_embed": jnp.zeros((588, 1024))}
        sh = param_sharding_rules(tree, mesh)["patch_embed"]
        assert sh.spec == P(None, None) or sh.spec == P()

    def test_divisible_dim_keeps_rule(self):
        from robustvlm_tpu.parallel.mesh import param_sharding_rules

        mesh = make_mesh(data=1, fsdp=8, model=1)
        tree = {"patch_embed": jnp.zeros((768, 1024))}
        sh = param_sharding_rules(tree, mesh)["patch_embed"]
        assert sh.spec == P("fsdp", None) or sh.spec == P("fsdp")

    def test_real_of9b_tree_places_on_fsdp8(self):
        """The full OF-9B abstract tree must produce valid shardings on an
        8-way fsdp mesh (this failed before _fit_spec: device_put/lower
        raised on patch_embed)."""
        from robustvlm_tpu.models.flamingo import (
            FLAMINGO_CONFIGS, init_flamingo_params,
        )
        from robustvlm_tpu.parallel.mesh import param_sharding_rules

        cfg = FLAMINGO_CONFIGS["openflamingo-9b"]
        shapes = jax.eval_shape(
            lambda k: init_flamingo_params(k, cfg), jax.random.PRNGKey(0)
        )
        mesh = make_mesh(data=1, fsdp=8, model=1)
        shardings = param_sharding_rules(shapes, mesh)
        # every sharding must tile its leaf evenly (shard_shape raises if not)
        for s, sh in zip(jax.tree.leaves(shapes), jax.tree.leaves(
            shardings, is_leaf=lambda x: hasattr(x, "spec")
        )):
            sh.shard_shape(s.shape)  # must not raise
        # and the big MPT weights must actually BE sharded, not replicated
        wqkv = shardings["mpt"]["blocks"]["attn"]["wqkv"]
        assert "fsdp" in str(wqkv.spec)
