"""Logging control (reference ``kikuchipy.logging:set_log_level``,
``/root/reference/src/kikuchipy/logging.py:21``)."""

from __future__ import annotations

import logging

__all__ = ["set_log_level"]


def set_log_level(level: int | str) -> None:
    """Set the log level of all ``kikuchipy_tpu`` loggers.

    Parameters
    ----------
    level
        Any :mod:`logging` level, e.g. "DEBUG", "INFO", "WARNING".
    """
    logging.basicConfig()
    logging.getLogger("kikuchipy_tpu").setLevel(level)
