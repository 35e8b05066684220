"""GEGLU feedforward block (reference attention.py:40-53).

TPU notes: the two Dense layers are the MXU hot path; the GEGLU gate is an
elementwise op XLA fuses into the surrounding matmuls. inner dim follows the
reference recipe `int(mult * 2/3 * dim)` so a GEGLU FF has the same parameter
count as a plain 4x GELU FF.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from phenaki_tpu.ops.torch_init import torch_kernel_init

from phenaki_tpu.ops.norms import StandardLayerNorm


def geglu(x: jax.Array) -> jax.Array:
    """Split last dim in two; gelu-gate the second half onto the first.

    Matches reference GEGLU (attention.py:40-43): `x, gate = chunk(2);
    gelu(gate) * x`.
    """
    x, gate = jnp.split(x, 2, axis=-1)
    return jax.nn.gelu(gate, approximate=False) * x


class FeedForward(nn.Module):
    """LN -> Dense(2*inner, no bias) -> GEGLU -> dropout -> Dense(dim, no bias)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        inner_dim = int(self.mult * (2 / 3) * self.dim)
        x = StandardLayerNorm(self.dim, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(inner_dim * 2, use_bias=False, kernel_init=torch_kernel_init, dtype=self.dtype, name="proj_in")(x)
        x = geglu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, use_bias=False, kernel_init=torch_kernel_init, dtype=self.dtype, name="proj_out")(x)
        return x
