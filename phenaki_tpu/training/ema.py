"""Exponential moving average of a parameter pytree.

Replaces the reference's `ema-pytorch` dependency (cvivit_trainer.py:21,91-93)
with pure pytree ops that run inside the jitted train step — no host-side
model copy, no main-process gating needed (SPMD keeps every host identical).
Supports `update_after_step` / `update_every` like the reference.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: Any  # the averaged pytree
    step: jax.Array  # update counter


def ema_init(params: Any) -> EMAState:
    return EMAState(params=params, step=jnp.zeros((), jnp.int32))


def ema_update(
    state: EMAState,
    new_params: Any,
    decay: float = 0.995,
    update_after_step: int = 0,
    update_every: int = 1,
    apply: Any = None,
) -> EMAState:
    """One (conditional) EMA step; jit-safe.

    `apply` (traced bool, optional) gates the whole update: when False the
    state (params AND step counter) passes through unchanged. Trainers use it
    under gradient accumulation so the EMA only advances on real optimizer
    steps (optax.MultiSteps boundaries), not every micro-batch — otherwise the
    EMA blends identical params repeatedly and the effective time constant
    shrinks by the accumulation factor.
    """
    if apply is None:
        apply = jnp.asarray(True)
    apply = jnp.asarray(apply, bool)
    step = state.step + apply.astype(jnp.int32)
    do_update = apply & (step > update_after_step) & ((step % update_every) == 0)
    # before update_after_step the EMA copies the raw params (warmup)
    warm = apply & (step <= update_after_step)

    def blend(e, p):
        upd = jnp.where(warm, p, e * decay + p * (1.0 - decay))
        return jnp.where(do_update | warm, upd, e)

    new_ema = jax.tree_util.tree_map(blend, state.params, new_params)
    return EMAState(params=new_ema, step=step)
