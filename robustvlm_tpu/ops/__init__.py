from robustvlm_tpu.ops.projections import (
    l0_norm,
    l1_ball_projection,
    l1_norm,
    l2_norm,
    linf_norm,
    lp_normalize,
    normalize_grad,
    project_perturbation,
)
from robustvlm_tpu.ops.losses import (
    ce_loss,
    ce_loss_targeted,
    dlr_loss,
    dlr_loss_targeted,
    l2_embedding_loss,
    make_loss_fn,
)

__all__ = [
    "l0_norm",
    "l1_ball_projection",
    "l1_norm",
    "l2_norm",
    "linf_norm",
    "lp_normalize",
    "normalize_grad",
    "project_perturbation",
    "ce_loss",
    "ce_loss_targeted",
    "dlr_loss",
    "dlr_loss_targeted",
    "l2_embedding_loss",
    "make_loss_fn",
]
