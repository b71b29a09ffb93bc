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
