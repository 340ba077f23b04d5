"""Logging setup (parity: utils/logging.py:1-17 — coloredlogs optional)."""
from __future__ import annotations

import logging


def get_logger(name: str = "image_matching_tpu", level: int = logging.INFO):
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter(
                "[%(asctime)s %(levelname)s %(name)s] %(message)s", "%H:%M:%S"
            )
        )
        logger.addHandler(handler)
        logger.setLevel(level)
        try:
            import coloredlogs

            coloredlogs.install(level=level, logger=logger)
        except ImportError:
            pass
    return logger
