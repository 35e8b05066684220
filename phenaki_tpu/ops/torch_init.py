"""Torch-default parameter initializers.

The reference is a torch model: every nn.Linear / nn.Conv initializes with
kaiming_uniform(a=sqrt(5)) — i.e. U(-1/sqrt(fan_in), +1/sqrt(fan_in)) — for
the weight AND the bias, and nn.Embedding with N(0, 1). Flax defaults
(lecun_normal kernels with 3x the variance, zero biases, fan-in-scaled
embeddings) train measurably differently at matched step budgets: on the
quality-parity benchmark (examples/quality_parity.py) flax-default init
cost 0.66 dB of reconstruction PSNR after 600 steps vs the same model
started from torch-init weights (15.03 vs 15.69 dB; kernel variance alone
accounts for ~0.2 dB, the uniform bias init for ~0.45 dB). Matching the
reference's init makes "same quality after N steps" hold by construction,
so these are the package-wide defaults.

Usage (param paths unchanged — initializers are passed at call sites):

    nn.Dense(d, use_bias=False, kernel_init=torch_kernel_init)
    nn.Dense(d, kernel_init=torch_kernel_init, bias_init=torch_bias_init(fan_in))
    nn.Conv(c, (3, 3), kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(in_ch * 9))
    nn.Embed(n, d, embedding_init=torch_embedding_init)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# kaiming_uniform(a=sqrt(5)) == U(+-sqrt(3 * (1/3) / fan_in)) == U(+-1/sqrt(fan_in)).
# variance_scaling computes fan_in from the kernel shape for both Dense
# (in, out) and Conv (spatial..., in/groups, out) layouts, matching torch.
torch_kernel_init = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)

# torch nn.Embedding: N(0, 1)
torch_embedding_init = jax.nn.initializers.normal(stddev=1.0)


def torch_bias_init(fan_in: int):
    """U(+-1/sqrt(fan_in)) — torch's Linear/Conv bias default. The bias
    shape alone doesn't carry fan_in, so call sites pass it explicitly
    (Dense: input features; Conv: in_channels/groups * prod(kernel))."""
    bound = float(fan_in) ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
