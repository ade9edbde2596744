from vidchapters_tpu.data.tokenizer import (
    ByteLevelTokenizer,
    SentencePieceUnigramTokenizer,
    build_tokenizer,
)
from vidchapters_tpu.data.time_tokens import (
    time_to_token,
    token_to_time,
    build_time_text_sequence,
    decode_chapter_sequence,
)

__all__ = [
    "ByteLevelTokenizer",
    "SentencePieceUnigramTokenizer",
    "build_tokenizer",
    "time_to_token",
    "token_to_time",
    "build_time_text_sequence",
    "decode_chapter_sequence",
]
