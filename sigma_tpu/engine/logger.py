"""ANSI-colored logger (reference `/root/reference/engine/logger.py:82-99`):
root-style logger with colored level names, optional file handler, level
from the ENGINE_LOGGING_LEVEL env var."""

from __future__ import annotations

import logging
import os
import sys

_COLORS = {"WARNING": 33, "INFO": 36, "DEBUG": 37, "CRITICAL": 35, "ERROR": 31}


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        level = record.levelname
        if sys.stderr.isatty() and level in _COLORS:
            record.levelname = f"\x1b[{_COLORS[level]}m{level}\x1b[0m"
        out = super().format(record)
        record.levelname = level
        return out


_logger = None


def get_logger(log_dir: str | None = None, log_file: str | None = None):
    global _logger
    if _logger is None:
        logger = logging.getLogger("sigma_tpu")
        level = os.environ.get("ENGINE_LOGGING_LEVEL", "INFO").upper()
        logger.setLevel(getattr(logging, level, logging.INFO))
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            _ColorFormatter("%(asctime)s %(levelname)s %(message)s", "%H:%M:%S")
        )
        logger.addHandler(handler)
        logger.propagate = False
        _logger = logger
    if log_file:
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(log_file, mode="a")
        fh.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        )
        _logger.addHandler(fh)
    return _logger
