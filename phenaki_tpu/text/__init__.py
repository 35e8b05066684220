from phenaki_tpu.text.t5 import (
    t5_encode_text,
    get_encoded_dim,
    DEFAULT_T5_NAME,
    MAX_LENGTH,
)

__all__ = ["t5_encode_text", "get_encoded_dim", "DEFAULT_T5_NAME", "MAX_LENGTH"]
