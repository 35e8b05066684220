"""Jitted module initialization.

Eager `module.init(...)` dispatches every parameter initializer as its own op.
On a real chip that is merely wasteful; through a tunneled/remote TPU backend
each dispatch is an RPC round trip and a large model's init takes minutes
(measured: 89 s for the flagship MaskGit vs <1 s jitted). Wrapping init in a
single `jax.jit` compiles the whole initialization into one program with one
round trip.
"""

from __future__ import annotations

from typing import Any

import jax


def jit_init(module, rng: jax.Array, *args: Any, **kwargs: Any):
    """`module.init(rng, *args, **kwargs)` as ONE compiled program.

    Everything except the rng is closed over as trace-time constants, so any
    argument structure (None context, static shapes, method=...) is allowed.
    """

    def _init(r):
        return module.init(r, *args, **kwargs)

    return jax.jit(_init)(rng)
