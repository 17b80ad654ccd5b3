"""Singleton logger with file:line formatting (reference: utils.py:4-17)."""

from __future__ import annotations

import logging
import sys

_LOGGER = None


def get_logger(name: str = "stabnet_tpu") -> logging.Logger:
    global _LOGGER
    if _LOGGER is not None:
        return _LOGGER
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s %(levelname)s %(filename)s:%(lineno)d] %(message)s"
            )
        )
        logger.addHandler(handler)
    logger.propagate = False
    _LOGGER = logger
    return logger
