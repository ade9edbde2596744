"""Run logging setup (PDVC/misc/utils.py:105-170 equivalent).

``create_logger``: console + file logger with ANSI level colors (colorlog's
behavior without the dependency). ``build_save_folder``: timestamped run
directory with config snapshot + code zip (the reference persists info.json /
opt.json + code.zip per run).
"""

from __future__ import annotations

import logging

import sys
import time
from pathlib import Path
from typing import Any, Optional

_COLORS = {"DEBUG": "\033[36m", "INFO": "\033[32m", "WARNING": "\033[33m",
           "ERROR": "\033[31m", "CRITICAL": "\033[41m"}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        msg = super().format(record)
        color = _COLORS.get(record.levelname, "")
        return f"{color}{msg}{_RESET}" if color and sys.stderr.isatty() else msg


def create_logger(name: str = "vidchapters", log_file: Optional[str] = None,
                  level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = "%(asctime)s %(levelname)s %(name)s: %(message)s"
    console = logging.StreamHandler()
    console.setFormatter(_ColorFormatter(fmt))
    logger.addHandler(console)
    if log_file:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter(fmt))
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def make_summary_writer(logdir: str):
    """Optional TensorBoard writer (the reference logs via tensorboardX /
    SummaryWriter, moment_detr train.py:106, PDVC/train.py:37). Returns None
    when no tensorboard backend is importable."""
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(logdir)
    except Exception:
        return None


def build_save_folder(root: str, run_name: str, config: Any = None,
                      snapshot_code_dir: Optional[str] = None) -> Path:
    """Create ``root/run_name-YYYYmmdd-HHMMSS`` with config.json (+code.zip)."""
    stamp = time.strftime("%Y%m%d-%H%M%S")
    folder = Path(root) / f"{run_name}-{stamp}"
    folder.mkdir(parents=True, exist_ok=True)
    if config is not None:
        from vidchapters_tpu.config import save_config

        save_config(config, str(folder / "config.json"))
    if snapshot_code_dir:
        from vidchapters_tpu.utils.misc import make_zipfile

        make_zipfile(snapshot_code_dir, str(folder / "code.zip"),
                     enclosing_dir="code")
    return folder
