"""JAX-native T5 encoder stack (reference t5.py:20-103 wraps HF
`T5EncoderModel`; here the encoder itself is implemented in flax so text
embeddings are produced on-device inside jit).

Architecture (T5 / T5-v1.1 encoder):

  token embed -> N x [RMSNorm -> self-attn (bucketed relative position bias,
  shared from block 0, NO 1/sqrt(d) scaling) -> residual; RMSNorm ->
  feed-forward (gated-gelu for v1.1, relu for legacy t5) -> residual]
  -> final RMSNorm; padded positions zeroed on output.

Weights load from a locally cached HuggingFace checkpoint via
`load_hf_t5_params` (torch state-dict -> flax pytree conversion; transposition
covered by tests against a randomly initialized HF model, so no network is
needed to validate parity). The output contract matches the reference: padded
positions are zeroed and downstream recovers the mask as `any(embed != 0, -1)`
(reference phenaki_pytorch.py:461,601).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class T5EncoderConfig:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    num_heads: int = 12
    d_ff: int = 2048
    num_layers: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    gated_act: bool = True  # v1.1 gated-gelu; False -> legacy relu

    @classmethod
    def from_hf(cls, hf_config) -> "T5EncoderConfig":
        """Build from a transformers T5Config (local_files_only)."""
        proj = getattr(hf_config, "feed_forward_proj", "relu")
        gated = getattr(hf_config, "is_gated_act", "gated" in proj)
        return cls(
            vocab_size=hf_config.vocab_size,
            d_model=hf_config.d_model,
            d_kv=hf_config.d_kv,
            num_heads=hf_config.num_heads,
            d_ff=hf_config.d_ff,
            num_layers=hf_config.num_layers,
            relative_attention_num_buckets=hf_config.relative_attention_num_buckets,
            relative_attention_max_distance=getattr(
                hf_config, "relative_attention_max_distance", 128
            ),
            layer_norm_epsilon=hf_config.layer_norm_epsilon,
            gated_act=gated,
        )


def relative_position_bucket(
    relative_position: np.ndarray,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> np.ndarray:
    """Bidirectional T5 relative-position bucketing (numpy; sequence lengths
    are static under jit so buckets are computed at trace time)."""
    rel = np.asarray(relative_position, np.int64)
    num_buckets //= 2
    buckets = (rel > 0).astype(np.int64) * num_buckets
    rel = np.abs(rel)

    max_exact = num_buckets // 2
    is_small = rel < max_exact
    # avoid log(0); the value is unused where is_small
    rel_clip = np.maximum(rel, 1)
    if_large = max_exact + (
        np.log(rel_clip.astype(np.float64) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    if_large = np.minimum(if_large, num_buckets - 1)
    return buckets + np.where(is_small, rel, if_large)


class T5RMSNorm(nn.Module):
    """T5 LayerNorm: no mean subtraction, no bias; fp32 statistics."""

    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        x32 = x32 * jax.lax.rsqrt(var + self.eps)
        return (weight * x32.astype(self.dtype)).astype(self.dtype)


class T5SelfAttention(nn.Module):
    """Multi-head self-attention, T5 style: no q scaling (folded into init),
    additive position bias, no biases on the projections."""

    cfg: T5EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, position_bias: jax.Array) -> jax.Array:
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda name: nn.Dense(  # noqa: E731
            inner, use_bias=False, dtype=self.dtype, name=name
        )
        b, n, _ = x.shape
        split = lambda t: t.reshape(b, n, cfg.num_heads, cfg.d_kv).transpose(  # noqa: E731
            0, 2, 1, 3
        )
        q = split(dense("q")(x))
        k = split(dense("k")(x))
        v = split(dense("v")(x))

        # (b, h, i, j); T5 applies NO 1/sqrt(d) scaling
        scores = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        )
        scores = scores + position_bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="o")(out)


class T5FeedForward(nn.Module):
    cfg: T5EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        if cfg.gated_act:
            h = jax.nn.gelu(
                nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(x),
                approximate=True,  # HF 'gelu_new'
            )
            h = h * nn.Dense(
                cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_1"
            )(x)
        else:
            h = jax.nn.relu(
                nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi")(x)
            )
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="wo")(h)


class T5EncoderStack(nn.Module):
    """The full encoder. `__call__(input_ids, attention_mask)` returns the
    final hidden states with padded positions zeroed."""

    cfg: T5EncoderConfig
    dtype: jnp.dtype = jnp.float32

    def _position_bias(self, n: int, attention_mask: jax.Array) -> jax.Array:
        """(1, heads, n, n) learned bucketed bias + additive key-padding mask
        (computed once, shared by every block — HF computes it in block 0)."""
        cfg = self.cfg
        ctx = np.arange(n)[:, None]
        mem = np.arange(n)[None, :]
        buckets = relative_position_bucket(
            mem - ctx,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
        )  # (n, n) static
        table = self.param(
            "rel_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
        )
        bias = table[jnp.asarray(buckets)]  # (n, n, heads)
        bias = bias.transpose(2, 0, 1)[None]  # (1, heads, n, n)
        neg = jnp.asarray(np.finfo(np.float32).min, jnp.float32)
        key_mask = attention_mask[:, None, None, :].astype(bool)
        return jnp.where(key_mask, bias.astype(jnp.float32), neg)

    @nn.compact
    def __call__(
        self, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        x = nn.Embed(
            cfg.vocab_size, cfg.d_model, dtype=self.dtype, name="token_embed"
        )(input_ids)
        pos_bias = self._position_bias(input_ids.shape[1], attention_mask)

        for i in range(cfg.num_layers):
            h = T5RMSNorm(
                cfg.d_model, cfg.layer_norm_epsilon, self.dtype,
                name=f"block_{i}_attn_norm",
            )(x)
            x = x + T5SelfAttention(cfg, self.dtype, name=f"block_{i}_attn")(
                h, pos_bias
            )
            h = T5RMSNorm(
                cfg.d_model, cfg.layer_norm_epsilon, self.dtype,
                name=f"block_{i}_ff_norm",
            )(x)
            x = x + T5FeedForward(cfg, self.dtype, name=f"block_{i}_ff")(h)

        x = T5RMSNorm(
            cfg.d_model, cfg.layer_norm_epsilon, self.dtype, name="final_norm"
        )(x)
        # zero padded positions (reference t5.py:93-103 output contract)
        return x * attention_mask[..., None].astype(x.dtype)


# --------------------------------------------------------------------------- #
# HF torch state-dict -> flax params conversion                               #
# --------------------------------------------------------------------------- #


def convert_hf_state_dict(
    state_dict: Dict[str, Any], cfg: T5EncoderConfig
) -> Dict[str, Any]:
    """Map a HuggingFace T5EncoderModel (torch) state dict onto the
    T5EncoderStack param tree. torch Linear stores (out, in); flax Dense
    kernels are (in, out) — every projection transposes."""

    def arr(key):
        t = state_dict[key]
        t = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        return np.asarray(t, np.float32)

    def kernel(key):
        return arr(key).T

    # embeddings may appear as 'shared.weight' or 'encoder.embed_tokens.weight'
    embed_key = (
        "shared.weight" if "shared.weight" in state_dict
        else "encoder.embed_tokens.weight"
    )
    params: Dict[str, Any] = {
        "token_embed": {"embedding": arr(embed_key)},
        "rel_bias": arr(
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
        "final_norm": {"weight": arr("encoder.final_layer_norm.weight")},
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}"
        params[f"block_{i}_attn"] = {
            name: {"kernel": kernel(f"{pre}.layer.0.SelfAttention.{name}.weight")}
            for name in ("q", "k", "v", "o")
        }
        params[f"block_{i}_attn_norm"] = {
            "weight": arr(f"{pre}.layer.0.layer_norm.weight")
        }
        ff = {}
        if cfg.gated_act:
            ff["wi_0"] = {"kernel": kernel(f"{pre}.layer.1.DenseReluDense.wi_0.weight")}
            ff["wi_1"] = {"kernel": kernel(f"{pre}.layer.1.DenseReluDense.wi_1.weight")}
        else:
            ff["wi"] = {"kernel": kernel(f"{pre}.layer.1.DenseReluDense.wi.weight")}
        ff["wo"] = {"kernel": kernel(f"{pre}.layer.1.DenseReluDense.wo.weight")}
        params[f"block_{i}_ff"] = ff
        params[f"block_{i}_ff_norm"] = {
            "weight": arr(f"{pre}.layer.1.layer_norm.weight")
        }
    return {"params": params}


def load_hf_t5(name: str, dtype: jnp.dtype = jnp.float32):
    """Load a local HF T5 checkpoint into (module, variables, cfg).
    `name` may be a hub name resolved against the local transformers cache
    OR a directory of downloaded weight files (incl. via PHENAKI_T5_PATH —
    see text/t5.resolve_t5_source). Zero-egress safe: local_files_only.
    Raises if absent."""
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    from phenaki_tpu.text.t5 import resolve_t5_source

    source = resolve_t5_source(name)
    hf_cfg = HFT5Config.from_pretrained(source, local_files_only=True)
    cfg = T5EncoderConfig.from_hf(hf_cfg)
    hf_model = T5EncoderModel.from_pretrained(source, local_files_only=True)
    variables = convert_hf_state_dict(hf_model.state_dict(), cfg)
    module = T5EncoderStack(cfg, dtype=dtype)
    return module, variables, cfg


class JaxT5Encoder:
    """Text -> (b, L, d) embeddings with the reference contract, encoder
    running on-device inside jit. Needs the HF tokenizer + weights locally
    cached; `get_text_encoder` falls back to the torch / hash paths when
    unavailable."""

    def __init__(self, name: str, max_length: int = 256, dtype=jnp.float32):
        from phenaki_tpu.text.spm_tokenizer import load_t5_tokenizer
        from phenaki_tpu.text.t5 import resolve_t5_source

        source = resolve_t5_source(name)
        # AutoTokenizer when usable; sentencepiece-free spiece.model
        # conversion otherwise (spm_tokenizer.py)
        self.tokenizer = load_t5_tokenizer(source, max_length=max_length)
        self.module, self.variables, self.cfg = load_hf_t5(name, dtype=dtype)
        self._apply = jax.jit(
            lambda ids, mask: self.module.apply(self.variables, ids, mask)
        )
        self.max_length = max_length

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        enc = self.tokenizer(
            list(texts),
            return_tensors="np",
            padding="longest",
            max_length=self.max_length,
            truncation=True,
        )
        out = self._apply(
            jnp.asarray(enc["input_ids"], jnp.int32),
            jnp.asarray(enc["attention_mask"], jnp.int32),
        )
        return np.asarray(jax.device_get(out), np.float32)
