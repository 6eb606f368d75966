"""Per-module logger factory.

Parity with the reference's ``setup_logging`` helper
(src/utils/setup_logging/setup_loggin.py:14-42 — filename typo theirs): INFO
level, stderr handler, same record format, duplicate-handler guard.
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def setup_logging(name: str, level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.hasHandlers():
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
    return logger
