"""Text-encoder tests (reference t5.py contract)."""

import numpy as np

from phenaki_tpu.text.t5 import (
    DEFAULT_T5_NAME,
    HashTextEncoder,
    get_encoded_dim,
    t5_encode_text,
)


def test_get_encoded_dim_known_names():
    assert get_encoded_dim("google/t5-v1_1-base") == 768
    assert get_encoded_dim("google/t5-v1_1-small") == 512
    assert get_encoded_dim(DEFAULT_T5_NAME) == 768


def test_encode_contract():
    emb = t5_encode_text(["a cat", "a dog jumping over fences"])
    assert emb.ndim == 3
    assert emb.shape[0] == 2
    assert emb.shape[-1] == 768
    # zero-embedding convention: padded rows all-zero, real rows non-zero
    mask = np.any(emb != 0, axis=-1)
    assert mask[0].sum() < mask[1].sum()  # shorter text has fewer tokens
    assert np.all(mask[:, 0])  # first position always real


def test_encode_single_string():
    emb = t5_encode_text("hello world")
    assert emb.shape[0] == 1


def test_hash_encoder_deterministic():
    enc = HashTextEncoder(dim=64)
    a = enc(["the same text"])
    b = enc(["the same text"])
    np.testing.assert_array_equal(a, b)
    c = enc(["different text"])
    assert not np.array_equal(a[:, :1], c[:, :1])
