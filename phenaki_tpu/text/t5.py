"""Frozen T5 text encoding (reference t5.py:1-103).

API parity: `t5_encode_text(texts, name) -> (b, L, d)` float array with padded
positions zeroed (downstream recovers the mask as `any(embed != 0, -1)`,
reference phenaki_pytorch.py:461,601), plus `get_encoded_dim(name)` and
`DEFAULT_T5_NAME`. Module-level singleton cache per model name
(reference t5.py:20-44).

Backend selection (text encoding is host-side preprocessing — the embeddings
are fed to the jitted model as plain arrays):

  1. JAX-native T5 encoder (`t5_jax.T5EncoderStack`) when the HF tokenizer +
     weights are cached locally: weights converted once from the torch state
     dict, then encoding runs on-device inside jit (shape/parity tested
     against a randomly initialized HF model in tests/test_t5_jax.py).
  2. HuggingFace `transformers` T5EncoderModel when its weights are available
     locally (this environment has zero network egress, so only a warm cache
     works). Runs on CPU via torch; output is converted to numpy.
  3. Otherwise a deterministic hash-embedding fallback (`HashTextEncoder`):
     whitespace/punctuation tokenization, tokens mapped to stable 64-bit
     hashes, embeddings drawn from a fixed-seed Gaussian keyed by the hash,
     plus sinusoidal position information. Deterministic across processes,
     zero-padded exactly like the T5 path. This keeps the full pipeline
     (training with text conditioning, CFG, sampling) runnable offline; swap
     in real T5 by providing cached HF weights.
"""

from __future__ import annotations

import hashlib
import os
import re
from typing import List, Optional, Sequence

import numpy as np

MAX_LENGTH = 256
DEFAULT_T5_NAME = "google/t5-v1_1-base"


def resolve_t5_source(name: str) -> str:
    """Resolve a model name to what `from_pretrained` should load.

    Real-weights file path support (round-3 review #3): `name` may be a
    local DIRECTORY containing a downloaded checkpoint (config.json +
    model weights + spiece.model), or the env var `PHENAKI_T5_PATH` may
    point at one — it then overrides hub names so existing configs pick up
    the real weights without code changes. Fetch the assets once on any
    connected machine:

        huggingface-cli download google/t5-v1_1-base \
            --local-dir /path/to/t5-v1_1-base
        export PHENAKI_T5_PATH=/path/to/t5-v1_1-base
    """
    if os.path.isdir(name):
        return name
    env = os.environ.get("PHENAKI_T5_PATH")
    if env and os.path.isdir(env):
        return env
    return name

# d_model for common T5 checkpoints — avoids a network fetch of the config
# (reference get_encoded_dim consults T5Config, t5.py:46-60)
T5_EMBED_DIMS = {
    "google/t5-v1_1-small": 512,
    "google/t5-v1_1-base": 768,
    "google/t5-v1_1-large": 1024,
    "google/t5-v1_1-xl": 2048,
    "google/t5-v1_1-xxl": 4096,
    "t5-small": 512,
    "t5-base": 768,
    "t5-large": 1024,
}

_ENCODERS: dict = {}


def get_encoded_dim(name: str = DEFAULT_T5_NAME) -> int:
    source = resolve_t5_source(name)
    if source == name and name in T5_EMBED_DIMS:
        return T5_EMBED_DIMS[name]
    try:  # local directory or transformers cache, no egress
        from transformers import T5Config

        return T5Config.from_pretrained(source, local_files_only=True).d_model
    except Exception:  # noqa: BLE001
        if name in T5_EMBED_DIMS:
            return T5_EMBED_DIMS[name]
        raise ValueError(
            f"unknown t5 name {name!r} and no local config cached"
        ) from None


class HashTextEncoder:
    """Deterministic offline text encoder with the T5 output contract."""

    def __init__(self, dim: int, max_length: int = MAX_LENGTH):
        self.dim = dim
        self.max_length = max_length

    @staticmethod
    def _tokenize(text: str) -> List[str]:
        return re.findall(r"[a-z0-9]+|[^\sa-z0-9]", text.lower())

    def _token_vec(self, token: str) -> np.ndarray:
        seed = int.from_bytes(
            hashlib.blake2b(token.encode(), digest_size=8).digest(), "little"
        )
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.dim).astype(np.float32) / np.sqrt(self.dim)

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        toks = [self._tokenize(t)[: self.max_length] for t in texts]
        max_len = max((len(t) for t in toks), default=1)
        max_len = max(max_len, 1)
        out = np.zeros((len(texts), max_len, self.dim), np.float32)
        pos = np.arange(max_len)[:, None]
        dim_i = np.arange(self.dim)[None, :]
        sinusoid = np.where(
            dim_i % 2 == 0,
            np.sin(pos / 10000 ** (dim_i / self.dim)),
            np.cos(pos / 10000 ** ((dim_i - 1) / self.dim)),
        ).astype(np.float32) * 0.1
        for i, ts in enumerate(toks):
            for j, tok in enumerate(ts):
                out[i, j] = self._token_vec(tok) + sinusoid[j]
            if not ts:  # empty text still yields one non-zero position
                out[i, 0] = self._token_vec("") + sinusoid[0]
        return out


class _HFT5Encoder:
    """transformers-backed T5 encoder (torch CPU), numpy in/out."""

    def __init__(self, name: str):
        import torch
        from transformers import T5EncoderModel

        from phenaki_tpu.text.spm_tokenizer import load_t5_tokenizer

        source = resolve_t5_source(name)
        self.torch = torch
        self.tokenizer = load_t5_tokenizer(source)
        self.model = T5EncoderModel.from_pretrained(source, local_files_only=True)
        self.model.eval()

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        torch = self.torch
        enc = self.tokenizer.batch_encode_plus(
            list(texts),
            return_tensors="pt",
            padding="longest",
            max_length=MAX_LENGTH,
            truncation=True,
        )
        with torch.no_grad():
            out = self.model(
                input_ids=enc.input_ids, attention_mask=enc.attention_mask
            ).last_hidden_state
        out = out.masked_fill(~enc.attention_mask[..., None].bool(), 0.0)
        return out.float().numpy()


def get_text_encoder(name: str = DEFAULT_T5_NAME, fallback_dim: Optional[int] = None):
    """Singleton per (name, fallback_dim); HF if cached locally, hash fallback
    otherwise. `fallback_dim` overrides the hash encoder's output dim (used
    when a model declares an explicit text_embed_dim)."""
    key = (name, fallback_dim)
    if key not in _ENCODERS:
        try:  # JAX-native encoder: on-device, jitted (t5_jax.py)
            from phenaki_tpu.text.t5_jax import JaxT5Encoder

            _ENCODERS[key] = JaxT5Encoder(name)
        except Exception:
            try:  # torch/transformers CPU path
                _ENCODERS[key] = _HFT5Encoder(name)
            except Exception:  # no local weights — deterministic offline fallback
                dim = (
                    fallback_dim if fallback_dim is not None else get_encoded_dim(name)
                )
                _ENCODERS[key] = HashTextEncoder(dim)
    return _ENCODERS[key]


def t5_encode_text(
    texts: Sequence[str] | str,
    name: str = DEFAULT_T5_NAME,
    fallback_dim: Optional[int] = None,
) -> np.ndarray:
    """texts -> (b, L, d) float32, padded positions zeroed (reference t5.py:64-103)."""
    if isinstance(texts, str):
        texts = [texts]
    return get_text_encoder(name, fallback_dim)(texts)
