"""Headline benchmark: APGD attack-steps/sec/chip on CLIP ViT-L/14.

Measures the #1 hot path (SURVEY.md §3.2) with the REAL attack engine:
`robustvlm_tpu.attacks.apgd.apgd_attack` — the full scan-based AutoPGD
(per-example adaptive step sizes, best tracking, oscillation checkpoints)
driving fwd+grad-wrt-pixels through the ViT-L/14 vision tower in the
production eval configuration (ℓ∞ ε=2/255, CE vs a 1000-class zero-shot
classifier, bf16 activations, fp32 softmax).

Tuned configuration and its measurement trail (v5e, round 2, see
scripts/perf_sweep.py):
  - batch 8 is the per-example throughput peak on this chip: bare fused
    steps/s by batch = 1:150, 2:226, 4:274, 6:294, 8:302, 12:295, 16:285,
    32:241, 64:204 — per-example cost rises monotonically with batch
    (XLA's attention fusions tile better when the (B,H,N,N) softmax
    intermediates stay small).
  - remat='dots' (save param-matmul outputs, recompute elementwise +
    attention): bwd(dx) is ~2.2x fwd wall. Measured alternatives all lose:
    no-remat 244/s @b16 (fails to compile at b32), dots_saveable 219 @b32,
    saving softmax probs across remat ('dots_probs') 212 @b32 — the HBM
    round-trip for (B,H,N,N) tensors costs more than the recompute.
  - fp32 vs bf16 softmax: identical wall (241.4 vs 241.6 @b32) — keep fp32.
  - attention kernels: XLA's einsum attention spreads the batched
    (257,64)x(64,257) matmuls across the chip's 4 MXUs (~42 TF/s in-model);
    Pallas batched dots serialize (~5-8 TF/s), so the whole-sequence fused
    kernel (ops/pallas/vit_attention.py, 228/s @b32) and the flash kernel
    (101/s) both lose to XLA here and stay off the default path. Round-3
    heads-per-program packing sweep at b8 (VIT_ATTN_HP env): hp=8 248.5,
    hp=16 250.2 steps/s — still ~20% behind the einsum path's ~310; hp>=32
    fails to compile (3 fp32 (hp,272,272) temporaries overflow VMEM). The
    packing lever is measured and closed.
  - params pre-cast to bf16: +2% (240.7/s bare).
  - batch data + params as LOOP OPERANDS, never closure constants: the
    eager scan with closed-over params ran 180/s; with everything as
    runtime operands the same attack runs ~237/s AND fresh batches reuse
    the compiled program (HLO constants changed the cache key per batch).
  - per-dispatch host-loop overhead through the remote tunnel ~14 ms/call;
    the in-jit scan path amortizes it.
  - XLA TPU backend flags are NOT tunable from this client: the axon
    CPU-side XLA rejects --xla_tpu_* names in XLA_FLAGS (fatal
    "Unknown flag"), so compile-option sweeps (scoped_vmem etc.) are
    impossible through the tunnel — measured round 3, lever closed.
  - speed-of-light audit (round 2): back-to-back bf16 matmul at the exact
    qkv shape (8224x1024x3072) calibrates to 140.4 TF/s on this chip — the
    in-model 135 TF/s is 96% of that practical ceiling. Step decomposition
    at b8 (ablations, scripts/perf_sweep.py): matmul-only skeleton
    19.25 ms (fwd 8.98 + bwd 10.3), attention fwd 1.67 ms, attention
    bwd+recompute 5.4 ms (FLOP-fair: 3x the fwd einsums) = 26.3 ms total,
    ~91% of the composable ceiling (~24 ms). Structural alternatives all
    measured SLOWER: cls-split tile-aligned attention (fwd 11.45 vs
    10.65 ms; step 28.5 — slice/concat pad-transposes in the remat bwd),
    scan unroll 2/4/24 (249/238/290 steps/s), dots_probs 261,
    dots_saveable 279, no-remat 251, sdpa == einsum.

Unit: per-example attack steps (model evals) per second per chip; the
attack performs n_iter+1 evals. vs_baseline anchors the A100 PyTorch
reference derived from the published targeted-attack cost (≈2 h/image
@10k iters on LLaVA-7B, reference README.md:326-328) scaled by the
LLaVA-7B : bare-ViT-L FLOP ratio -> ≈80 example-steps/s/A100 fp16.

Output contract: the HEADLINE attack metric is the LAST JSON line printed
(the driver parses the last line). The default invocation also prints
auxiliary JSON lines first — the real-size LLaVA-7B attack bench (batch 1,
the reference's only published speed datum), the FARE fine-tune train
metric, and the serving decode sweeps (int8 and int4 at b1+b4, plus the
aggregate-champion int8+int8KV config at b8; each stage's last line a
llava7b_greedy_decode_tokens_per_sec summary) — so one driver
run carries the whole perf story. BENCH_LLAVA=0 skips the 13 GiB attack
stage, BENCH_DECODE=0 the decode stages; BENCH_TRAIN=1 /
BENCH_ATTACK_ONLY=1 run a single stage (used by scripts/perf_sweep.py
A/Bs).
"""

import json
import os
import time

import jax  # noqa: E402  (cache config must precede first compile)

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


_REPO = os.path.dirname(os.path.abspath(__file__))
# "init" until the first device-touching call returns; flipped to
# "device_ok" by _mark_device_ok() right after warmup. The watchdog only
# hard-exits in "init": past it, the process may be mid-TPU-step, and
# killing a chip-holding process wedges the pool for hours (CLAUDE.md) —
# the exact failure the watchdog exists to report.
_STAGE = {"v": "init"}


def _mark_device_ok():
    _STAGE["v"] = "device_ok"


def _latest_bench_value():
    """Newest non-null driver-captured value (BENCH_r*.json 'parsed' blocks)
    — replaces a hardcoded previous-value string that would go stale."""
    import glob

    latest = None
    for f in sorted(glob.glob(os.path.join(_REPO, "BENCH_r[0-9]*.json"))):
        try:
            with open(f) as fh:
                d = json.load(fh)
        except (OSError, ValueError):
            continue
        v = (d.get("parsed") or {}).get("value")
        if v is not None:
            latest = f"{v} ({os.path.basename(f)})"
    return latest


def _probe_pool(timeout_s: float = 45.0):
    """Bounded pool probe (scripts/tpu_probe.py) so a wedged round is
    self-diagnosing. Only called from the watchdog while THIS process is
    still blocked in the claim queue — the probe child is a second queued
    claimant, killed before any grant, which does not deepen the wedge."""
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, os.path.join(_REPO, "scripts", "tpu_probe.py"),
             str(timeout_s)],
            capture_output=True, text=True, timeout=timeout_s + 30,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as e:  # noqa: BLE001 — diagnostics must never raise
        return {"tpu_ok": False, "error": f"probe failed: {e!r}"}


def _watchdog(seconds: float):
    """A wedged TPU pool makes the first device touch block INDEFINITELY
    (claim_timeout is infinite — see CLAUDE.md): without a watchdog the
    driver's bench run would hang the round instead of recording a
    failure. On expiry, print an honest error JSON line; hard-exit ONLY if
    the device was never granted (still queued in the claim — safe to
    kill). If the run is merely slow (cold compile, first run), the error
    line notes the run continues and the real measurement prints LAST, so
    last-line parsers still record it. BENCH_WATCHDOG_S=0 disables."""
    import threading as _threading

    def fire():
        queued = _STAGE["v"] == "init"
        prev = _latest_bench_value()
        err = {
            "metric": "apgd_attack_steps_per_sec_per_chip_vitl14",
            "value": None,
            "unit": "example-steps/s/chip",
            "error": (
                f"no measurement within {seconds:.0f}s: "
                + ("TPU device never granted (pool claim wedged — see "
                   "CLAUDE.md)" if queued
                   else "device granted but run still in flight (slow "
                        "compile?); leaving it to finish — a later JSON "
                        "line supersedes this one")
            ),
            "tpu_probe": _probe_pool() if queued else {"tpu_ok": True},
        }
        if prev is not None:
            err["previous_measured"] = prev
        print(json.dumps(err), flush=True)
        if queued:
            os._exit(3)

    t = _threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


A100_ANCHOR_STEPS_PER_SEC = 80.0

BATCH = int(os.environ.get("BENCH_BATCH", 8))
# 100 iterations = the production eval protocol (BASELINE.md: AutoAttack
# APGD-CE/APGD-T at 100 iters) and amortizes the attack's fixed setup
# (init eval, first-step bookkeeping; 20-iter runs read ~5-10% lower).
# Round-4 same-session A/B at 100 iters settles the epilogue question:
# fwd-only final iteration (skip_last_grad, attacks/apgd.py) 310.83 vs
# 308.57 without — a real ~0.7% win, default ON; earlier 309.4-vs-312
# readings were run-to-run jitter around ~310. Round-4 full-story run:
# 311.59 (driver headline). BENCH_FOLD_NORM=1 (normalize folded into the
# patch embed): 309.47 — NO measurable effect; XLA already fuses the
# (B,3,224,224) normalize into neighbors, so the lever stays off-default
# (kept for attribution, exact math, parity-tested).
N_ITER = int(os.environ.get("BENCH_ITERS", 100))


def _timed_run(attack):
    t0 = time.perf_counter()
    res = attack()
    float(jnp.sum(res.x_best))
    return time.perf_counter() - t0


def main_train():
    """BENCH_TRAIN=1: the second driver metric — FARE fine-tune imgs/sec/chip
    (BASELINE.json "FARE fine-tune imgs/sec/chip"; recipe README.md:275-284 /
    BASELINE.md: ViT-L/14, PGD-10 inner attack on the unsupervised l2
    embedding loss, batch 128, AdamW).

    Same operand discipline as the attack bench: params/opt-state as jit
    arguments (donated), persistent compile cache, scalar-readback sync.
    grad_accum splits the 128-batch into chunks scanned on-device (one
    optimizer update per step, numerically identical): per-example fwd+bwd
    cost RISES with batch on this chip (bench curve above), so chunked
    execution is faster AND caps HBM. BENCH_TRAIN_ACCUM tunes it.

    vs_baseline: no A100 FARE throughput was published, so the anchor is
    DERIVED from the same A100 attack anchor (80 fwd+bwd evals/s): one FARE
    step per example costs 10 inner fwd+bwd evals + frozen fwd + 2 outer
    fwds + 1 outer param-bwd ~= 11.9 eval-equivalents (fwd ~= 0.31 eval,
    param-bwd ~= 0.69 eval at the measured 2.2x bwd/fwd ratio)
    -> ~= 6.7 imgs/s/A100.

    Measured (v5e, round 3): 25.71 imgs/s/chip at batch 128 / accum 16
    (chunks of 8, the attack bench's per-example throughput peak)
    = 3.84x the derived anchor — consistent with the attack bench's 3.85x,
    as expected since the train step is ~12 attack-evals of the same tower.
    Ceiling check: 11.9 eval-equivalents/img at the 333 evals/s composable
    ceiling -> ~28 imgs/s/chip; 25.7 is ~92% of it.
    """
    import numpy as np

    from robustvlm_tpu.models.clip import CLIP_CONFIGS, init_clip_params
    from robustvlm_tpu.train.trainer import TrainConfig, make_optimizer, make_train_step

    batch = int(os.environ.get("BENCH_TRAIN_BATCH", 128))
    accum = int(os.environ.get("BENCH_TRAIN_ACCUM", 16))
    n_steps = int(os.environ.get("BENCH_TRAIN_STEPS", 8))

    # cheap device touch: once the claim is granted the watchdog must never
    # hard-exit (killing a chip-holding process wedges the pool)
    jax.devices()
    float(jnp.sum(jnp.ones((8, 8))))
    _mark_device_ok()

    clip_cfg = CLIP_CONFIGS["ViT-L-14"]
    tcfg = TrainConfig(
        loss="l2", inner_loss="l2", attack="pgd", eps=4.0 / 255.0,
        iterations_adv=10, stepsize_adv=1.0 / 255.0, opt="adamw",
        compute_dtype="bfloat16", remat="dots", grad_accum=accum,
    )
    params = init_clip_params(jax.random.PRNGKey(0), clip_cfg)
    # a real copy: params is donated to the step, params_orig must not
    # alias its buffers
    params_orig = jax.tree.map(jnp.array, params)
    optimizer = make_optimizer(tcfg)
    opt_state = optimizer.init(params)
    step_fn = jax.jit(
        make_train_step(tcfg, clip_cfg), donate_argnums=(0, 2)
    )

    npr = np.random.RandomState(0)
    x = jnp.asarray(npr.rand(batch, 3, 224, 224).astype(np.float32))

    def run(params, opt_state, n):
        for s in range(n):
            params, opt_state, metrics = step_fn(
                params, params_orig, opt_state, x, None,
                jax.random.PRNGKey(s), s,
            )
        float(metrics["loss"])  # scalar readback = remote sync
        return params, opt_state

    params, opt_state = run(params, opt_state, 1)  # compile + warmup
    t0 = time.perf_counter()
    params, opt_state = run(params, opt_state, n_steps)
    dt = time.perf_counter() - t0

    n_chips = jax.local_device_count()
    value = batch * n_steps / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "fare_train_imgs_per_sec_per_chip_vitl14",
                "value": round(value, 2),
                "unit": "imgs/s/chip",
                "vs_baseline": round(value / 6.7, 3),
            }
        )
    )


def main():
    from robustvlm_tpu.attacks.apgd import apgd_attack
    from robustvlm_tpu.models.clip import CLIP_CONFIGS, init_clip_params
    from robustvlm_tpu.models.clip.model import encode_image
    from robustvlm_tpu.ops.image import normalize_clip
    from robustvlm_tpu.ops.losses import ce_loss

    # cheap device touch: once the claim is granted the watchdog must never
    # hard-exit (killing a chip-holding process wedges the pool)
    jax.devices()
    float(jnp.sum(jnp.ones((8, 8))))
    _mark_device_ok()

    cfg = CLIP_CONFIGS["ViT-L-14"]
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        init_clip_params(jax.random.PRNGKey(0), cfg),
    )
    temb = jax.random.normal(jax.random.PRNGKey(1), (cfg.embed_dim, 1000))
    temb = temb / jnp.linalg.norm(temb, axis=0, keepdims=True)

    npr = np.random.RandomState(0)
    x = jnp.asarray(npr.rand(BATCH, 3, 224, 224).astype(np.float32))
    y = jnp.asarray(npr.randint(0, 1000, BATCH))
    eps = 2.0 / 255.0

    # BENCH_FOLD_NORM=1: absorb normalize_clip into the patch-embed matmul
    # (models/clip/model.py fold_normalization — exact math, parity-tested);
    # removes one (B,3,224,224) elementwise pass per model evaluation and
    # its recompute under remat
    fold_norm = bool(os.environ.get("BENCH_FOLD_NORM"))
    if fold_norm:
        from robustvlm_tpu.models.clip.model import fold_normalization

        params = dict(params)
        params["visual"] = fold_normalization(params["visual"], cfg.patch_size)

    # bound-model protocol: params/classifier ride as runtime operands of
    # the compiled attack loop (attacks/apgd.py), keeping programs small
    # and cache keys stable across batches/checkpoints
    def model_fn_pure(p, t, xa):
        e = encode_image(
            p, xa if fold_norm else normalize_clip(xa), cfg, normalize=True,
            compute_dtype=jnp.bfloat16, remat="dots",
        )
        return e @ (100.0 * t)

    def model_fn(xa):
        return model_fn_pure(params, temb, xa)

    model_fn.pure = model_fn_pure
    model_fn.bound_args = (params, temb)

    criterion = lambda o, t: ce_loss(o, t, reduction="none")

    skip_last = os.environ.get("BENCH_SKIP_LAST_GRAD")

    def attack():
        return apgd_attack(
            model_fn, x, y, criterion=criterion, eps=eps,
            n_iter=N_ITER, norm="linf",
            skip_last_grad=None if skip_last is None else skip_last == "1",
        )

    # compile + warmup; sync via scalar readback (block_until_ready does
    # not reliably synchronize through remote-execution PJRT backends)
    res = attack()
    float(jnp.sum(res.x_best))

    # best-of-3 timed runs: dispatch through the remote tunnel adds a few
    # ms of run-to-run jitter; the best run reflects the device time
    dt = min(_timed_run(attack) for _ in range(3))
    # the attack evaluates the model (fwd+bwd) n_iter+1 times per example
    steps_per_sec = BATCH * (N_ITER + 1) / dt

    n_chips = jax.local_device_count()
    value = steps_per_sec / n_chips
    # Roofline verdict (round-2 audit, measured on this v5e — full trail in
    # the module docstring): pure bf16 matmul at the exact qkv shape
    # calibrates this chip to 140.4 TF/s (not the 197 headline); the
    # in-model rate is 135 TF/s (96% of practical); composing the measured
    # matmul skeleton + attention fwd + FLOP-fair attention bwd gives a
    # ~24 ms/step ceiling at b8 => ~333 steps/s/chip. The >=5x-A100 north
    # star is therefore out of reach on v5e AT THIS FLOP COUNT (333/80 =
    # 4.2x); on the north-star v5p (459 TF/s bf16 peak vs 197), holding the
    # measured fraction-of-peak (135/197 = 0.685) projects 0.685*459 = 314
    # TF/s in-model => x2.33 => ~7xx steps/s/chip ~ 9x A100.
    ceiling = 333.0
    v5p_scale = (0.685 * 459.0) / 135.0
    print(
        json.dumps(
            {
                "metric": "apgd_attack_steps_per_sec_per_chip_vitl14",
                "value": round(value, 2),
                "unit": "example-steps/s/chip",
                "vs_baseline": round(value / A100_ANCHOR_STEPS_PER_SEC, 3),
                "roofline": {
                    "measured_matmul_tf_s": 140.4,
                    "in_model_tf_s": 135.0,
                    "composable_ceiling_steps_per_sec_chip": ceiling,
                    "pct_of_ceiling": round(100.0 * value / ceiling, 1),
                    "ceiling_vs_a100": round(
                        ceiling / A100_ANCHOR_STEPS_PER_SEC, 2
                    ),
                    "v5p_projection_steps_per_sec_chip": round(
                        value * v5p_scale, 1
                    ),
                    "v5p_projection_vs_a100": round(
                        value * v5p_scale / A100_ANCHOR_STEPS_PER_SEC, 2
                    ),
                },
            }
        )
    )


def main_llava():
    """Auxiliary driver metric: real-size LLaVA-7B attack-steps/s at batch 1
    (the reference's only published speed datum is for exactly this workload
    — see scripts/bench_llava7b.py). Runs in-process, batch/iters pinned so
    this session's BENCH_BATCH/BENCH_ITERS only steer the attack stage."""
    import sys

    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    import bench_llava7b

    jax.devices()
    float(jnp.sum(jnp.ones((8, 8))))
    _mark_device_ok()
    bench_llava7b.main(
        batch=int(os.environ.get("BENCH_LLAVA_BATCH", 1)),
        n_iter=int(os.environ.get("BENCH_LLAVA_ITERS", 100)),
        host_loop=True,
    )


def main_decode(bits: int, batches, kv_bits: int = 0):
    """Serving decode metric, driver-captured (VERDICT r4 #2): LLaVA-7B
    greedy tokens/s with weight-only quantized LM (scripts/bench_decode.py
    carries the roofline + measurement trail). Runs in-process on the
    already-claimed chip; each bits-width is its own stage so the 7B tree
    is re-initialized and progressively quantized fresh (and released
    afterwards by _stage)."""
    import sys

    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    import bench_decode

    jax.devices()
    float(jnp.sum(jnp.ones((8, 8))))
    _mark_device_ok()
    bench_decode.main(
        batches=batches,
        max_new=int(os.environ.get("BENCH_DECODE_NEW", 128)),
        bits=bits,
        kv_bits=kv_bits,
    )


def _release_device_memory():
    """Free everything a finished stage left on the chip. A returned stage's
    arrays stay alive through the attack engine's module-level compiled-core
    cache and jax's internal jit caches (measured: the LLaVA stage's 13.16
    GiB params remained resident and OOMed the next stage's first
    allocation); clearing both + a gc pass drops jax.live_arrays() to zero
    (tests/test_bench_watchdog.py::test_stage_releases_device_memory)."""
    import gc

    from robustvlm_tpu.attacks import apgd

    apgd._CORE_CACHE.clear()
    jax.clear_caches()
    gc.collect()


def _stage(name, fn):
    """Run one bench stage; any failure becomes an honest JSON line for that
    metric and the remaining stages still run (the headline attack metric
    prints LAST, which is the line the driver parses). Device memory is
    released between stages — the 7B stage fills nearly all of HBM."""
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — a stage must never sink the run
        print(
            json.dumps(
                {"metric": name, "value": None, "unit": None,
                 "error": f"stage failed: {type(e).__name__}: {e!s:.500}"}
            ),
            flush=True,
        )
    finally:
        _release_device_memory()


if __name__ == "__main__":
    # 3000 s bounds the FULL warm story (7B attack + train + three decode
    # quantize/compile cycles + headline); past device grant the watchdog
    # only prints a superseded-later error line, never kills the run
    wd_s = float(os.environ.get("BENCH_WATCHDOG_S", 3000))
    wd = _watchdog(wd_s) if wd_s > 0 else None
    if os.environ.get("BENCH_TRAIN"):
        main_train()
    elif os.environ.get("BENCH_ATTACK_ONLY"):
        main()
    else:
        # Full story, one invocation (VERDICT r3 #1): auxiliary metrics
        # first, headline attack metric LAST (last-line JSON is what the
        # driver records). BENCH_LLAVA=0 skips the 13 GiB stage.
        if os.environ.get("BENCH_LLAVA", "1") != "0":
            _stage("apgd_attack_steps_per_sec_llava7b_b1", main_llava)
        _stage("fare_train_imgs_per_sec_per_chip_vitl14", main_train)
        # serving decode stages (opt-out BENCH_DECODE=0): int8 and int4 at
        # the serving sweep's ends (b1 latency point + b4 aggregate peak),
        # plus the aggregate champion config int8 weights + int8 KV at b8.
        # Measured r5: int8 92.3/225.7 tok/s, int4(group) 88.4/271.4 — int8
        # wins b1 (the q4 nibble decode is VPU-bound), int4 wins b2-b4, and
        # int8+int8KV b8 is the per-chip aggregate crown (347.2 tok/s;
        # KV-quant only pays from b>=8 — it LOSES at b4, 192.6 vs 225.7).
        if os.environ.get("BENCH_DECODE", "1") != "0":
            _stage(
                "llava7b_greedy_decode_tokens_per_sec",
                lambda: main_decode(8, [1, 4]),
            )
            _stage(
                "llava7b_greedy_decode_tokens_per_sec",
                lambda: main_decode(4, [1, 4]),
            )
            _stage(
                "llava7b_greedy_decode_tokens_per_sec",
                lambda: main_decode(8, [8], kv_bits=8),
            )
        main()
    if wd is not None:
        wd.cancel()
