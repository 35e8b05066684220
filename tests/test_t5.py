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


# ---------------------------------------------------------------------------
# sentencepiece-free tokenizer (spm_tokenizer.py): build a tiny unigram
# spiece.model from scratch (protobuf only) and check Viterbi segmentation +
# the T5 eos/pad conventions without the sentencepiece package installed.
# ---------------------------------------------------------------------------


def _write_tiny_spiece(path):
    from transformers.utils import sentencepiece_model_pb2_new as pb2

    m = pb2.ModelProto()

    def add(piece, score, type_=1):
        sp = m.pieces.add()
        sp.piece = piece
        sp.score = score
        sp.type = type_

    add("<pad>", 0.0, type_=3)  # CONTROL
    add("</s>", 0.0, type_=3)
    add("<unk>", 0.0, type_=2)  # UNKNOWN
    add("▁the", -1.0)  # 3
    add("▁cat", -1.5)  # 4
    add("▁", -3.0)  # 5
    add("c", -4.0)  # 6
    add("a", -4.0)  # 7
    add("t", -4.0)  # 8
    add("at", -2.0)  # 9
    add("he", -2.0)  # 10
    m.trainer_spec.model_type = 1  # UNIGRAM
    m.trainer_spec.unk_id = 2
    with open(path, "wb") as f:
        f.write(m.SerializeToString())


def test_spm_tokenizer_viterbi_and_t5_conventions(tmp_path):
    from phenaki_tpu.text.spm_tokenizer import SpmT5Tokenizer

    _write_tiny_spiece(tmp_path / "spiece.model")
    tok = SpmT5Tokenizer(str(tmp_path), num_extra_ids=4)

    assert tok.pad_token_id == 0 and tok.eos_token_id == 1

    # whole-word pieces beat char decompositions (scores are log-probs):
    # "the cat" -> [▁the, ▁cat] -> ids [3, 4] + </s>
    enc = tok(["the cat"], return_tensors="np")
    np.testing.assert_array_equal(enc["input_ids"], [[3, 4, 1]])
    np.testing.assert_array_equal(enc["attention_mask"], [[1, 1, 1]])

    # Viterbi picks the best segmentation among overlapping pieces:
    # "cathe" -> ▁cat + he (-1.5-2.0) beats ▁ c at he (-3-4-2-2)
    assert tok.tokenize("cathe") == ["▁cat", "he"]
    # "att" -> ▁ + at + t (-3-2-4) beats ▁ + a + t + t (-3-4-4-4)
    assert tok.tokenize("att") == ["▁", "at", "t"]

    # longest-padding + pad id 0 + zero mask on padding
    enc = tok(["the cat", "the"], return_tensors="np")
    assert enc["input_ids"].shape == (2, 3)
    np.testing.assert_array_equal(enc["input_ids"][1], [3, 1, 0])
    np.testing.assert_array_equal(enc["attention_mask"][1], [1, 1, 0])

    # extra_id sentinels appended in reverse order after the spm pieces
    assert tok.convert_tokens_to_ids("<extra_id_0>") == 11 + 3
    assert tok.convert_tokens_to_ids("<extra_id_3>") == 11

    # truncation caps length
    enc = tok(["the cat the cat the cat"], max_length=4)
    assert enc["input_ids"].shape[1] == 4


def test_load_t5_tokenizer_falls_back_without_sentencepiece(tmp_path):
    """A checkpoint dir holding ONLY spiece.model (AutoTokenizer cannot load
    it here: no tokenizer.json and no sentencepiece) resolves through the
    conversion path."""
    from phenaki_tpu.text.spm_tokenizer import SpmT5Tokenizer, load_t5_tokenizer

    _write_tiny_spiece(tmp_path / "spiece.model")
    tok = load_t5_tokenizer(str(tmp_path))
    assert isinstance(tok, SpmT5Tokenizer)
    out = tok(["the cat"], return_tensors="np")
    assert out["input_ids"][0, -1] == 1  # eos appended
