"""Validate scripts/bench_llava7b.attack_step_matmul_flops against XLA.

The 7B bench's roofline block divides an ANALYTIC matmul FLOP count by the
measured step wall — so the count itself needs an oracle. XLA's compiled
cost_analysis() counts every HLO flop (matmul + elementwise) of the real
grad-wrt-pixels program; at a mid-size config the matmuls dominate, so the
analytic count must land just below the XLA total (the gap is elementwise:
LN/RMSNorm/rope/gelu/softmax).

Both remat variants are validated. Two subtleties the bounds encode:

  - The oracle compiles in a CLEAN-ENV SUBPROCESS: under the suite's
    conftest (forced 8-device CPU platform + global matmul precision
    'highest'), XLA:CPU reports ~12% more flops for the identical traced
    program — measured, and independent of a trace-time
    default_matmul_precision scope — which would smear the bounds past
    usefulness. A fresh default-config process reproduces the TPU bench's
    single-pass-bf16 accounting.
  - XLA dead-codes parts of the checkpoint replay (probs@v and the final
    mlp matmul contribute no backward-needed outputs) and slices the
    lm_head matmul to the t_post supervised rows; the counter models both
    (see attack_step_matmul_flops docstring), which is exactly what these
    bounds pin — an unmodeled replay would read ~1.13x the oracle.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import bench_llava7b  # noqa: E402

from robustvlm_tpu.models.clip.model import (  # noqa: E402
    CLIPConfig,
    TransformerConfig,
)
from robustvlm_tpu.models.llama.model import LlamaConfig  # noqa: E402
from robustvlm_tpu.models.llava.model import LlavaConfig  # noqa: E402

T_PRE, T_POST = 5, 4


def _midsize_cfg():
    """Large enough that matmuls dominate the flop count (dims >= 128),
    small enough for a fast CPU compile. drop_last_vision_block=True with 2
    vision layers leaves a 1-trip block scan — counted identically by any
    while-loop flop convention."""
    vision = CLIPConfig(
        "mid-vis", 64, 112, 16,
        TransformerConfig(128, 2, 4), TransformerConfig(64, 1, 2),
        vocab_size=64, context_length=16,
    )
    llama = LlamaConfig("mid-lm", 256, 2, 4, 4, 768, 2048, max_seq_len=256)
    return LlavaConfig("mid", llama, vision)


def _xla_flops(cfg, batch, remat):
    loss_fn = bench_llava7b._make_unstacked_loss(cfg, remat=remat)
    params = bench_llava7b._init_bf16_on_device(cfg)

    def total(p, pre, post, labels, mask, xa):
        return jnp.sum(loss_fn(p, pre, post, labels, mask, xa))

    grad = jax.jit(jax.grad(total, argnums=5))
    sh = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
    args = (
        jax.tree.map(sh, params),
        jax.ShapeDtypeStruct((batch, T_PRE), jnp.int32),
        jax.ShapeDtypeStruct((batch, T_POST), jnp.int32),
        jax.ShapeDtypeStruct((batch, T_POST), jnp.int32),
        jax.ShapeDtypeStruct((batch, T_POST), jnp.float32),
        jax.ShapeDtypeStruct(
            (batch, 3, cfg.vision.image_size, cfg.vision.image_size),
            jnp.float32,
        ),
    )
    ca = grad.lower(*args).compile().cost_analysis()
    assert ca and ca.get("flops", 0) > 0, "cost_analysis returned no flops"
    return ca["flops"]


def _xla_flops_clean_env(batch, remat):
    """_xla_flops in a fresh default-config process (see module docstring:
    the conftest environment inflates XLA:CPU's flop accounting ~12%)."""
    code = (
        "import sys\n"
        f"sys.path.insert(0, {REPO!r})\n"
        f"sys.path.insert(0, {os.path.join(REPO, 'scripts')!r})\n"
        "import tests.test_llava7b_flops as T\n"
        f"print(T._xla_flops(T._midsize_cfg(), {batch}, {remat}))\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return float(out.stdout.strip().splitlines()[-1])


@pytest.mark.parametrize("remat", [False, True])
def test_analytic_matches_xla_cost_analysis(remat):
    cfg = _midsize_cfg()
    analytic = bench_llava7b.attack_step_matmul_flops(
        cfg, 2, T_PRE, T_POST, remat=remat
    )
    xla = _xla_flops_clean_env(2, remat)
    ratio = analytic / xla
    # analytic counts matmuls only, XLA counts everything — so analytic
    # must sit just under the XLA total at matmul-dominated sizes; above
    # 1.0 means a modeled-dead matmul actually executed (or vice versa).
    # Measured: 0.885 (remat=False), 0.905 (remat=True).
    assert 0.85 <= ratio <= 0.97, (analytic, xla, ratio)


def test_remat_multiplier_and_batch_linearity():
    cfg = _midsize_cfg()
    base = bench_llava7b.attack_step_matmul_flops(
        cfg, 1, T_PRE, T_POST, remat=False
    )
    remat = bench_llava7b.attack_step_matmul_flops(
        cfg, 1, T_PRE, T_POST, remat=True
    )
    # remat replays each block interior once: one extra forward on the
    # interior matmuls — strictly more, but less than a full extra step
    assert 1.2 < remat / base < 1.6, remat / base
    b4 = bench_llava7b.attack_step_matmul_flops(cfg, 4, T_PRE, T_POST)
    b1 = bench_llava7b.attack_step_matmul_flops(cfg, 1, T_PRE, T_POST)
    assert b4 == pytest.approx(4 * b1)


def test_7b_magnitude():
    """The real 7B step: ~27 TFLOP (6.6e9 matmul params x 635 tokens x 2
    x ~3 passes, plus attention/vision) — pin the order of magnitude so a
    units slip (x2 vs x4, tokens vs params) can't ship silently."""
    from robustvlm_tpu.models.llava.model import LLAVA_CONFIGS

    f = bench_llava7b.attack_step_matmul_flops(
        LLAVA_CONFIGS["llava-1.5-7b"], 1,
        bench_llava7b.T_PRE, bench_llava7b.T_POST,
    )
    assert 2.0e13 < f < 3.5e13, f
