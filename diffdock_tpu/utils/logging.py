"""Logging utilities (reference ``utils/logging_utils.py``).

Named logger with env-var level control (``DIFFDOCK_TPU_LOGLEVEL``), per-PID
child loggers for subprocess safety, optional file handler.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_FMT = "[%(asctime)s] [%(name)s %(levelname)s] %(message)s"


def get_logger(name: str = "diffdock_tpu") -> logging.Logger:
    pid = os.getpid()
    logger = logging.getLogger(f"{name}.{pid}")
    if not logger.handlers:
        level = os.environ.get("DIFFDOCK_TPU_LOGLEVEL", "INFO").upper()
        logger.setLevel(level)
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(h)
        logger.propagate = False
    return logger


def add_file_handler(path: str, name: str = "diffdock_tpu") -> None:
    logger = get_logger(name)
    h = logging.FileHandler(path)
    h.setFormatter(logging.Formatter(_FMT))
    logger.addHandler(h)


class MetricsWriter:
    """Structured run metrics as JSON-lines (the wandb-equivalent artifact;
    the reference logs to wandb when available, ``train.py:99-103``).

    One record per event: ``{"step": int, "phase": str, **scalars}``.
    Appends, flushes per write (crash-safe), and is a no-op when ``path``
    is None so call sites need no guards.
    """

    def __init__(self, path: Optional[str] = None):
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")

    def log(self, step: int, phase: str, **scalars) -> None:
        if self._fh is None:
            return
        import json

        rec = {"step": int(step), "phase": phase}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
