"""Optimizer factory (reference optimizer.py:1-34), built on optax.

Adam when wd == 0, else AdamW with the weight-decay split: parameters with
ndim < 2 (biases, norm gains, per-dim scales) get no weight decay.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import optax


def _wd_mask(params: Any) -> Any:
    """True for params that should be decayed (ndim >= 2)."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def get_optimizer(
    lr: float = 1e-4,
    wd: float = 1e-2,
    betas: Tuple[float, float] = (0.9, 0.99),
    eps: float = 1e-8,
    group_wd_params: bool = True,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Build the optax chain. `max_grad_norm` folds global-norm clipping into
    the update (the reference clips via accelerator.clip_grad_norm_,
    cvivit_trainer.py:245-246)."""
    if wd == 0:
        opt = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    elif group_wd_params:
        opt = optax.adamw(
            lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=wd, mask=_wd_mask
        )
    else:
        opt = optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=wd)

    if max_grad_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(max_grad_norm), opt)
    return opt
