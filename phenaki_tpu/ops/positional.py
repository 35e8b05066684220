"""Positional machinery: ALiBi, SwinV2 continuous position bias, PEG.

These give the reference its length/resolution extrapolation behavior
(reference attention.py:186-275 and attention.py:57-85). All are built to be
shape-static under jit: bias tables are computed at trace time for the
(static) token-grid shape and constant-folded by XLA.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from phenaki_tpu.ops.torch_init import torch_bias_init, torch_kernel_init


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def depthwise3x3x3(
    x: jax.Array,  # (b, T, H, W, d) compute dtype
    kernel: jax.Array,  # (3, 3, 3, 1, d) fp32 param
    bias: jax.Array,  # (d,) fp32 param
    causal: bool,
) -> jax.Array:
    """Depthwise 3x3x3 stencil with a memory-lean VJP.

    Forward math identical to the inline 27-tap loop (PEG below). Plain
    autodiff of that loop stashes several padded 5-D intermediates per layer
    under `nn.scan` (measured in the train-step trace); this VJP saves only
    the input and recomputes the stencil transposes in the backward:
    dx = correlation of dy with the flipped kernel (padding lo/hi swapped),
    dk/db = fp32 tap reductions.
    """
    return _dw3_math(x, kernel, bias, causal)


def _dw3_math(x, kernel, bias, causal):
    dtype = x.dtype
    frame_padding = (2, 0) if causal else (1, 1)
    xp = jnp.pad(x, ((0, 0), frame_padding, (1, 1), (1, 1), (0, 0)))
    k = kernel.astype(dtype)
    _, T, H, W, _ = x.shape
    out = jnp.zeros_like(x)
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                out = out + (
                    xp[:, dt : dt + T, dh : dh + H, dw : dw + W, :]
                    * k[dt, dh, dw, 0]
                )
    return out + bias.astype(dtype)


def _dw3_fwd(x, kernel, bias, causal):
    return _dw3_math(x, kernel, bias, causal), (x, kernel, bias)


def _dw3_bwd(causal, res, dy):
    x, kernel, bias = res
    dtype = x.dtype
    lo, hi = (2, 0) if causal else (1, 1)
    _, T, H, W, _ = x.shape

    # dx[tau] = sum_dt dy[tau + lo - dt] * k[dt]  (correlation with the
    # flipped kernel; frame padding swaps to (2-lo, lo) = (hi, lo))
    dyp = jnp.pad(dy, ((0, 0), (2 - lo, lo), (1, 1), (1, 1), (0, 0)))
    k = kernel.astype(dtype)
    dx = jnp.zeros_like(x)
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                dx = dx + (
                    dyp[:, dt : dt + T, dh : dh + H, dw : dw + W, :]
                    * k[2 - dt, 2 - dh, 2 - dw, 0]
                )

    xp = jnp.pad(x, ((0, 0), (lo, hi), (1, 1), (1, 1), (0, 0))).astype(
        jnp.float32
    )
    dy32 = dy.astype(jnp.float32)
    taps = []
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                taps.append(
                    jnp.sum(
                        xp[:, dt : dt + T, dh : dh + H, dw : dw + W, :] * dy32,
                        axis=(0, 1, 2, 3),
                    )
                )
    dk = jnp.stack(taps).reshape(3, 3, 3, 1, x.shape[-1])
    db = jnp.sum(dy32, axis=(0, 1, 2, 3))
    return dx, dk.astype(kernel.dtype), db.astype(bias.dtype)


depthwise3x3x3.defvjp(_dw3_fwd, _dw3_bwd)


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


class ContinuousPositionBias(nn.Module):
    """SwinV2 continuous relative position bias (reference attention.py:229-275).

    A small MLP over signed-log relative coordinates of an N-D token grid,
    producing a per-head additive attention bias of shape (heads, N, N).
    `num_dims=2` for C-ViViT spatial attention, `num_dims=3` for MaskGit over
    the (t, h, w) grid. Everything is built from device-side iota (no host
    numpy literal) so the HLO stays tiny through the remote-compile service,
    and all static indexing arithmetic folds at compile time (avoids the
    per-forward recompute the reference does, attention.py:257-268).
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
        # The bias depends only on the DISPLACEMENT between two grid points,
        # which takes prod(2*Di - 1) unique values — 7,905 for the flagship
        # (9, 16, 8) grid vs N^2 = 1.33M position pairs. Run the MLP over the
        # unique-displacement table only: 167x less MLP work per forward AND
        # per backward (the MLP is trained, so training recomputes this
        # every step; measured 3.4 ms dense -> ~0.6 ms of a 9 ms flagship
        # forward). Same math per row as the dense form, to float
        # associativity.
        disp_axes = [
            jnp.arange(-(d - 1), d, dtype=jnp.float32) for d in dimensions
        ]
        disp = jnp.stack(jnp.meshgrid(*disp_axes, indexing="ij"))  # (c, *S)
        disp = disp.reshape(disp.shape[0], -1).T  # (M, c)
        if self.log_dist:
            disp = jnp.sign(disp) * jnp.log(jnp.abs(disp) + 1.0)

        x = nn.Dense(self.dim, kernel_init=torch_kernel_init, bias_init=torch_bias_init(self.num_dims), dtype=self.dtype, name="net_in")(disp)
        x = nn.leaky_relu(x, negative_slope=0.1)
        for idx in range(self.layers - 1):
            x = nn.Dense(self.dim, kernel_init=torch_kernel_init, bias_init=torch_bias_init(self.dim), dtype=self.dtype, name=f"net_hidden_{idx}")(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
        x = nn.Dense(self.heads, kernel_init=torch_kernel_init, bias_init=torch_bias_init(self.dim), dtype=self.dtype, name="net_out")(x)  # (M, h)

        # Expand the (S1, ..., Sc, heads) displacement table to the (N, N)
        # pair matrix with one ONE-HOT CONTRACTION per dim (selection
        # tensors sel_d[i, j, s] = [i - j + D - 1 == s], from iota), the
        # LAST einsum emitting the (heads, i1..ic, j1..jc) target order
        # directly. Measured on-chip alternatives for the flagship shape:
        # row gather 5.7 ms (TPU gathers of 8-float rows are
        # element-granular), tensordot+final transpose 5.3 ms, dense-MLP
        # formulation 3.4 ms, this 3.0 ms — and unlike the dense form the
        # backward only differentiates the 7,905-row MLP. precision
        # 'highest' keeps the selections exact (default bf16 matmul rounds
        # the table values); each output element is a sum with exactly one
        # nonzero product, so this equals a gather bit-for-bit.
        c = len(dimensions)
        sizes = [2 * d - 1 for d in dimensions]
        y = x.reshape(*sizes, self.heads)

        # letters: i-pair a_k, j-pair b_k, displacement s_k, heads 'Z'
        abc = "abcdefghijklmnopqr"
        a = [abc[3 * k] for k in range(c)]
        b = [abc[3 * k + 1] for k in range(c)]
        s = [abc[3 * k + 2] for k in range(c)]

        def sel(d):
            i = jnp.arange(d, dtype=jnp.int32)
            return (
                (i[:, None, None] - i[None, :, None] + d - 1)
                == jnp.arange(2 * d - 1, dtype=jnp.int32)[None, None, :]
            ).astype(y.dtype)  # (d, d, 2d-1)

        # expand last dim first; intermediates keep (unexpanded s-dims in
        # dim order, expanded pairs in dim order, heads) — the layout the
        # measured-fastest plan uses
        cur = "".join(s) + "Z"
        for k in range(c - 1, 0, -1):
            new = "".join(s[:k]) + "".join(
                a[k2] + b[k2] for k2 in range(k, c)
            ) + "Z"
            y = jnp.einsum(
                f"{a[k]}{b[k]}{s[k]},{cur}->{new}",
                sel(dimensions[k]),
                y,
                precision="highest",
            )
            cur = new
        target = "Z" + "".join(a) + "".join(b)
        y = jnp.einsum(
            f"{a[0]}{b[0]}{s[0]},{cur}->{target}",
            sel(dimensions[0]),
            y,
            precision="highest",
        )
        n = 1
        for d in dimensions:
            n *= d
        return y.reshape(self.heads, n, n)


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

        # torch Conv3d(groups=dim) defaults: fan_in = 27 taps (torch_init.py)
        kernel = self.param(
            "kernel",
            torch_kernel_init,
            (3, 3, 3, 1, self.dim),
            jnp.float32,
        )
        bias = self.param("bias", torch_bias_init(27), (self.dim,), jnp.float32)

        # depthwise 3x3x3 conv as an explicit 27-tap stencil: pure VPU
        # elementwise multiply-adds that XLA fuses into one pass. A grouped
        # `conv_general_dilated(feature_group_count=dim)` is equivalent but
        # (a) depthwise conv never uses the MXU anyway and (b) its gradient
        # mis-reduces under GSPMD when neighbors are tensor-sharded on the
        # feature dim. Routed through the memory-lean custom VJP above.
        out = depthwise3x3x3(x.astype(self.dtype), kernel, bias, self.causal)

        if untranspose:
            out = out.transpose(0, 2, 3, 1, 4)  # (b, h, w, t, d)
        return out.reshape(orig_shape)
