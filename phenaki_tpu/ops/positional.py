"""Positional machinery: ALiBi, SwinV2 continuous position bias, PEG.

These give the reference its length/resolution extrapolation behavior
(reference attention.py:186-275 and attention.py:57-85). All are built to be
shape-static under jit: bias tables are computed at trace time for the
(static) token-grid shape and constant-folded by XLA.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


def alibi_slopes(heads: int) -> np.ndarray:
    """Per-head ALiBi slopes (reference attention.py:201-212)."""

    def slopes_power_of_2(n: int):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(heads).is_integer():
        return np.asarray(slopes_power_of_2(heads), dtype=np.float32)

    closest = 2 ** math.floor(math.log2(heads))
    base = slopes_power_of_2(closest)
    extra = slopes_power_of_2(2 * closest)[0::2][: heads - closest]
    return np.asarray(base + extra, dtype=np.float32)


def alibi_bias(heads: int, i: int, j: int) -> jax.Array:
    """(heads, i, j) ALiBi bias; queries sit at the last `i` of `j` positions.

    Matches reference AlibiPositionalBias.get_bias (attention.py:195-199):
    bias[h, a, b] = -slope_h * |b - (j - i + a)|.
    """
    slopes = jnp.asarray(alibi_slopes(heads)).reshape(heads, 1, 1)
    i_pos = jnp.arange(j - i, j, dtype=jnp.float32).reshape(1, i, 1)
    j_pos = jnp.arange(j, dtype=jnp.float32).reshape(1, 1, j)
    return -jnp.abs(j_pos - i_pos) * slopes


class AlibiPositionalBias(nn.Module):
    """Parameterless module wrapper for alibi_bias (reference attention.py:186-227)."""

    heads: int

    def __call__(self, i: int, j: int) -> jax.Array:
        return alibi_bias(self.heads, i, j)


def _relative_position_grid(dimensions: Sequence[int], log_dist: bool) -> jax.Array:
    """(N, N, num_dims) signed relative coordinates of an N-D grid, N = prod(dims).

    Built from device-side iota + broadcasts (NOT a host numpy literal): for
    the flagship (9, 8, 16) grid the materialized table is 16 MB, and baking
    it into the HLO as a constant bloats every program upload to the
    remote-compile service. The iota formulation costs a few VPU ops at run
    time and keeps the program tiny. Shape is static, so XLA still folds all
    the indexing arithmetic (avoids the per-forward recompute the reference
    does, attention.py:257-268).
    """
    positions = [jnp.arange(d, dtype=jnp.float32) for d in dimensions]
    grid = jnp.stack(jnp.meshgrid(*positions, indexing="ij"))  # (c, *dims)
    grid = grid.reshape(grid.shape[0], -1).T  # (N, c)
    rel = grid[:, None, :] - grid[None, :, :]  # (N, N, c)
    if log_dist:
        rel = jnp.sign(rel) * jnp.log(jnp.abs(rel) + 1.0)
    return rel


class ContinuousPositionBias(nn.Module):
    """SwinV2 continuous relative position bias (reference attention.py:229-275).

    A small MLP over signed-log relative coordinates of an N-D token grid,
    producing a per-head additive attention bias of shape (heads, N, N).
    `num_dims=2` for C-ViViT spatial attention, `num_dims=3` for MaskGit over
    the (t, h, w) grid.
    """

    dim: int
    heads: int
    num_dims: int = 2
    layers: int = 2
    log_dist: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, *dimensions: int) -> jax.Array:
        assert len(dimensions) == self.num_dims
        rel_pos = jnp.asarray(_relative_position_grid(dimensions, self.log_dist))

        x = nn.Dense(self.dim, dtype=self.dtype, name="net_in")(rel_pos)
        x = nn.leaky_relu(x, negative_slope=0.1)
        for idx in range(self.layers - 1):
            x = nn.Dense(self.dim, dtype=self.dtype, name=f"net_hidden_{idx}")(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
        x = nn.Dense(self.heads, dtype=self.dtype, name="net_out")(x)
        return jnp.transpose(x, (2, 0, 1))  # (heads, N, N)


class PEG(nn.Module):
    """Positional Encoding Generator: depthwise 3D conv over the token grid.

    Reference attention.py:57-85. Uses `lax.conv_general_dilated` with
    `feature_group_count=dim` (depthwise) in NDHWC layout, which XLA maps to
    TPU convolution hardware directly. Causal mode pads (2, 0) on the frame
    axis, symmetric mode pads (1, 1); spatial axes always pad (1, 1).
    """

    dim: int
    causal: bool = False
    # how a flat (rows, seq, d) input maps onto the (b, t, h, w) grid:
    #   'thw'   — rows = b, seq = t*h*w   (MaskGit over the full token grid)
    #   'bhw_t' — rows = b*h*w, seq = t   (C-ViViT temporal transformer)
    # The reference reshapes (b*h*w, t, d) directly to (b, t, h, w, d)
    # (attention.py:71) which scrambles the grid and leaks future frames
    # through the conv; 'bhw_t' implements the intended causal behavior.
    layout: str = "thw"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, shape: Tuple[int, int, int, int] | None = None
    ) -> jax.Array:
        """x: (b, t, h, w, d), or (b, n, d) with `shape` = (b, t, h, w)."""
        orig_shape = x.shape
        needs_shape = x.ndim == 3
        untranspose = False
        if needs_shape:
            assert shape is not None, "PEG on a flat sequence requires the video shape"
            b, t, h, w = shape
            if self.layout == "thw":
                x = x.reshape(b, t, h, w, x.shape[-1])
            elif self.layout == "bhw_t":
                x = x.reshape(b, h, w, t, x.shape[-1]).transpose(0, 3, 1, 2, 4)
                untranspose = True
            else:
                raise ValueError(f"unknown PEG layout {self.layout!r}")

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, 1, self.dim),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)

        # depthwise 3x3x3 conv as an explicit 27-tap stencil: pure VPU
        # elementwise multiply-adds that XLA fuses into one pass. A grouped
        # `conv_general_dilated(feature_group_count=dim)` is equivalent but
        # (a) depthwise conv never uses the MXU anyway and (b) its gradient
        # mis-reduces under GSPMD when neighbors are tensor-sharded on the
        # feature dim.
        frame_padding = (2, 0) if self.causal else (1, 1)
        xp = jnp.pad(
            x.astype(self.dtype),
            ((0, 0), frame_padding, (1, 1), (1, 1), (0, 0)),
        )
        k = kernel.astype(self.dtype)
        _, T, H, W, _ = x.shape
        out = jnp.zeros_like(x, dtype=self.dtype)
        for dt in range(3):
            for dh in range(3):
                for dw in range(3):
                    out = out + (
                        xp[:, dt : dt + T, dh : dh + H, dw : dw + W, :]
                        * k[dt, dh, dw, 0]
                    )
        out = out + bias.astype(self.dtype)

        if untranspose:
            out = out.transpose(0, 2, 3, 1, 4)  # (b, h, w, t, d)
        return out.reshape(orig_shape)
