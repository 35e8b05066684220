"""SentencePiece-free T5 tokenizer.

The reference tokenizes with HF `T5Tokenizer` (reference t5.py:31-44), which
requires the `sentencepiece` C++ package. This environment (and many minimal
TPU images) ships `tokenizers` + `protobuf` but not `sentencepiece`, so a
checkpoint directory containing only `spiece.model` could not be tokenized.

This module converts `spiece.model` (a serialized SentencePiece `ModelProto`)
directly into a Rust `tokenizers.Tokenizer`, reproducing transformers'
T5Converter pipeline without instantiating the slow tokenizer:

  * model: Unigram(vocab=[(piece, score)...], unk_id, byte_fallback) with
    `<extra_id_99..0>` appended after the spm pieces (ids 32000..32099 for
    t5-v1_1, matching the slow tokenizer's added-token ids),
  * normalizer: Precompiled(charsmap from the proto) -> Strip(right) ->
    Replace(" {2,}" -> "▁"),
  * pre-tokenizer: Metaspace(replacement="▁", prepend_scheme="always")
    (T5 is a legacy=True sentencepiece model: dummy prefix on every segment),
  * post-processor: append `</s>` (TemplateProcessing), like T5Converter.

The proto is parsed with transformers' vendored descriptor
(`transformers.utils.sentencepiece_model_pb2_new`), so the only runtime
dependencies are `tokenizers` and `protobuf`.

Faithfulness is tested two ways: tests/test_t5.py builds a tiny unigram
ModelProto from scratch and checks Viterbi segmentation + the T5 eos/pad
conventions; tests/test_real_weights.py (gated on assets) checks the full
converted tokenizer against the HF encoder outputs on real prompts.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np

SPIECE_FILE = "spiece.model"


def _read_model_proto(path: str):
    from transformers.utils import sentencepiece_model_pb2_new as pb2

    proto = pb2.ModelProto()
    with open(path, "rb") as f:
        proto.ParseFromString(f.read())
    return proto


def tokenizer_from_spiece(
    spiece_path: str, num_extra_ids: int = 100
):
    """Build a `tokenizers.Tokenizer` from a T5 spiece.model file."""
    from tokenizers import Regex, Tokenizer, decoders, normalizers
    from tokenizers import pre_tokenizers, processors
    from tokenizers.models import Unigram

    proto = _read_model_proto(spiece_path)
    if proto.trainer_spec.model_type != 1:  # 1 == UNIGRAM
        raise ValueError(
            f"{spiece_path}: model_type={proto.trainer_spec.model_type}, "
            "only unigram sentencepiece models are supported"
        )

    vocab: List = [(p.piece, p.score) for p in proto.pieces]
    # T5 appends <extra_id_*> sentinels AFTER the spm pieces, highest index
    # first (slow-tokenizer id order: <extra_id_0> gets the LARGEST id)
    vocab += [(f"<extra_id_{i}>", 0.0) for i in range(num_extra_ids - 1, -1, -1)]

    unk_id = proto.trainer_spec.unk_id
    byte_fallback = bool(getattr(proto.trainer_spec, "byte_fallback", False))
    tok = Tokenizer(Unigram(vocab, unk_id, byte_fallback))

    norm_steps = []
    charsmap = proto.normalizer_spec.precompiled_charsmap
    if charsmap:
        norm_steps.append(normalizers.Precompiled(charsmap))
    norm_steps += [
        normalizers.Strip(left=False, right=True),
        normalizers.Replace(Regex(" {2,}"), "▁"),
    ]
    tok.normalizer = normalizers.Sequence(norm_steps)
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always", split=True
    )
    tok.decoder = decoders.Metaspace(
        replacement="▁", prepend_scheme="always", split=True
    )

    eos = "</s>"
    eos_id = next(
        (i for i, (piece, _) in enumerate(vocab) if piece == eos), None
    )
    if eos_id is not None:
        tok.post_processor = processors.TemplateProcessing(
            single=["$A", eos],
            pair=["$A", eos, "$B", eos],
            special_tokens=[(eos, eos_id)],
        )
    return tok


class SpmT5Tokenizer:
    """HF-shaped tokenizer facade over `tokenizer_from_spiece`.

    Implements the subset of the `PreTrainedTokenizer.__call__` contract the
    encoders use: batch encode with `padding="longest"`, truncation to
    `max_length`, numpy `input_ids`/`attention_mask` output, and pad id 0
    (T5's `<pad>`)."""

    def __init__(self, source_dir: str, num_extra_ids: int = 100):
        path = (
            source_dir
            if os.path.isfile(source_dir)
            else os.path.join(source_dir, SPIECE_FILE)
        )
        if not os.path.isfile(path):
            raise FileNotFoundError(f"no {SPIECE_FILE} under {source_dir!r}")
        self._tok = tokenizer_from_spiece(path, num_extra_ids=num_extra_ids)
        self.pad_token_id = self._tok.token_to_id("<pad>") or 0
        self.eos_token_id = self._tok.token_to_id("</s>")

    def convert_tokens_to_ids(self, token: str) -> int:
        return self._tok.token_to_id(token)

    def tokenize(self, text: str) -> List[str]:
        return self._tok.encode(text, add_special_tokens=False).tokens

    def __call__(
        self,
        texts: Sequence[str],
        return_tensors: str = "np",
        padding: str = "longest",
        max_length: int = 256,
        truncation: bool = True,
    ) -> Dict[str, np.ndarray]:
        encs = self._tok.encode_batch(list(texts))
        ids = [e.ids[:max_length] if truncation else e.ids for e in encs]
        width = max((len(i) for i in ids), default=1)
        if padding == "max_length":
            width = max_length
        input_ids = np.full((len(ids), width), self.pad_token_id, np.int64)
        mask = np.zeros((len(ids), width), np.int64)
        for row, seq in enumerate(ids):
            input_ids[row, : len(seq)] = seq
            mask[row, : len(seq)] = 1
        out = {"input_ids": input_ids, "attention_mask": mask}
        if return_tensors == "pt":
            import torch

            out = {k: torch.from_numpy(v) for k, v in out.items()}
        return out

    # parity helper for _HFT5Encoder's call shape
    def batch_encode_plus(self, texts, return_tensors="pt", **kw):
        class _Enc(dict):
            __getattr__ = dict.__getitem__

        return _Enc(self(texts, return_tensors=return_tensors, **kw))


def load_t5_tokenizer(source: str, max_length: int = 256):
    """AutoTokenizer when usable; otherwise the sentencepiece-free path.

    Returns an object supporting `tokenizer(texts, return_tensors="np", ...)`.
    """
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(source, local_files_only=True)
    except Exception:  # sentencepiece absent / no tokenizer.json — convert
        return SpmT5Tokenizer(source)
