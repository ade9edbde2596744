from vidchapters_tpu.utils.io import (
    load_json,
    save_json,
    load_jsonl,
    save_jsonl,
    load_pickle,
    save_pickle,
)

__all__ = [
    "load_json",
    "save_json",
    "load_jsonl",
    "save_jsonl",
    "load_pickle",
    "save_pickle",
]
