"""GEGLU feedforward block (reference attention.py:40-53).

TPU notes: the two Dense layers are the MXU hot path; the GEGLU gate is an
elementwise op XLA fuses into the surrounding matmuls. inner dim follows the
reference recipe `int(mult * 2/3 * dim)` so a GEGLU FF has the same parameter
count as a plain 4x GELU FF.

Tensor parallelism (manual/shard_map mode): with `tp_axis` set the module is
the LOCAL shard of a Megatron column->row split — proj_in holds a 1/tp column
slice (its a/g GEGLU halves kept paired per rank by
parallel/tp_inference.pack_tp_params), proj_out the matching row slice, and
the output is completed with one psum over the axis. `inner_dim` overrides
the reference formula for the local (possibly padded — the reference inner
dim 1365 is odd) width.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from phenaki_tpu.ops.torch_init import torch_kernel_init

from phenaki_tpu.ops.norms import StandardLayerNorm


@jax.custom_vjp
def geglu(x: jax.Array) -> jax.Array:
    """Split last dim in two; gelu-gate the second half onto the first.

    Matches reference GEGLU (attention.py:40-43): `x, gate = chunk(2);
    gelu(gate) * x`.

    Memory-lean custom VJP: plain autodiff stashes several inner-width
    (b, n, ~8/3*dim) intermediates (the split halves, gelu(g), the erf
    residual) per layer — under `nn.scan` each becomes a stacked HBM stash
    (measured in the train-step trace). Here the backward saves ONLY the
    projection output and recomputes the gate math in fp32.
    """
    a, gate = jnp.split(x, 2, axis=-1)
    return jax.nn.gelu(gate, approximate=False) * a


def _geglu_fwd(x):
    return geglu(x), (x,)


_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _geglu_bwd(res, dy):
    (x,) = res
    a, gate = jnp.split(x, 2, axis=-1)
    g32 = gate.astype(jnp.float32)
    dy32 = dy.astype(jnp.float32)
    cdf = 0.5 * (1.0 + jax.lax.erf(g32 * _INV_SQRT2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * g32 * g32)
    # gelu(g) = g * cdf(g); d gelu/dg = cdf + g * pdf
    da = dy32 * (g32 * cdf)
    dg = dy32 * a.astype(jnp.float32) * (cdf + g32 * pdf)
    return (jnp.concatenate([da, dg], axis=-1).astype(x.dtype),)


geglu.defvjp(_geglu_fwd, _geglu_bwd)


def ff_inner_dim(dim: int, mult: int = 4) -> int:
    """Reference inner-width recipe (attention.py:47)."""
    return int(mult * (2 / 3) * dim)


class FeedForward(nn.Module):
    """LN -> Dense(2*inner, no bias) -> GEGLU -> dropout -> Dense(dim, no bias)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0
    # LOCAL inner width override (tensor-parallel shards); None = reference
    # formula int(mult * 2/3 * dim)
    inner_dim: Optional[int] = None
    # manual tensor parallelism: psum the row-parallel proj_out output over
    # this mesh axis (only valid under shard_map; params must be the local
    # column/row slices — see parallel/tp_inference.py)
    tp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        inner = self.inner_dim if self.inner_dim is not None else ff_inner_dim(
            self.dim, self.mult
        )
        x = StandardLayerNorm(self.dim, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(inner * 2, use_bias=False, kernel_init=torch_kernel_init, dtype=self.dtype, name="proj_in")(x)
        x = geglu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, use_bias=False, kernel_init=torch_kernel_init, dtype=self.dtype, name="proj_out")(x)
        if self.tp_axis is not None:
            x = jax.lax.psum(x, self.tp_axis)
        return x
