"""Small IO helpers (reference: util/basic_utils.py:10-60)."""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any, Iterable, List


def load_json(path: str | Path) -> Any:
    with open(path, "r") as f:
        return json.load(f)


def save_json(obj: Any, path: str | Path, indent: int | None = None) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=indent)


def load_jsonl(path: str | Path) -> List[Any]:
    with open(path, "r") as f:
        return [json.loads(line) for line in f if line.strip()]


def save_jsonl(rows: Iterable[Any], path: str | Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


def load_pickle(path: str | Path) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pickle(obj: Any, path: str | Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(obj, f)
