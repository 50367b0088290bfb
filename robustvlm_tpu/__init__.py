"""robustvlm_tpu — TPU-native adversarial robustness framework for vision-language models.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of chs20/RobustVLM
(ICML 2024, "Robust CLIP"): adversarial fine-tuning of CLIP vision encoders
(TeCoA / FARE), white-box attack engines (PGD / APGD / AutoAttack / Square),
zero-shot robustness evaluation, and VLM (LLaVA / OpenFlamingo) attack harnesses —
all designed TPU-first:

- attack inner loops are `jax.lax.scan` bodies over `jax.value_and_grad`,
  with the elementwise update fused into Pallas kernels,
- models are pure functions over parameter pytrees, sharded with
  `jax.sharding.Mesh` + NamedSharding (DP batch axis, TP/FSDP for large LMs),
- everything under `jit` is shape-static; AutoAttack's shrinking active set is
  recast as masked dense computation.

The threat-model contract of the reference is preserved: images flow through the
system unnormalized in [0,1]; CLIP mean/std normalization is the first op inside
every model wrapper, and attacks project/clamp in raw pixel space.
(cf. reference train/adversarial_training_clip.py:106-116, 254)
"""

__version__ = "0.1.0"
