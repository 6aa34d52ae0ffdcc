"""Leveled logger with env configuration.

TPU-native analog of HugeCTR's Logger (reference: HugeCTR/core23/logger.hpp):
levels configured via ``HCTR_TPU_LOG_LEVEL``, optional file sink via
``HCTR_TPU_LOG_TO_FILE``, process-0 filtering for multi-host runs.
"""
from __future__ import annotations

import logging
import os
import sys
import time

_LEVELS = {
    "ERROR": logging.ERROR,
    "WARNING": logging.WARNING,
    "INFO": logging.INFO,
    "DEBUG": logging.DEBUG,
    "TRACE": logging.DEBUG,
}

_logger: logging.Logger | None = None


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def get_logger() -> logging.Logger:
    global _logger
    if _logger is not None:
        return _logger
    logger = logging.getLogger("hugectr_tpu")
    level_name = os.environ.get("HCTR_TPU_LOG_LEVEL", "INFO").upper()
    logger.setLevel(_LEVELS.get(level_name, logging.INFO))
    fmt = logging.Formatter(
        "[HCTR-TPU][%(asctime)s][%(levelname)s] %(message)s", datefmt="%H:%M:%S"
    )
    if os.environ.get("HCTR_TPU_LOG_TO_FILE"):
        handler: logging.Handler = logging.FileHandler(
            os.environ["HCTR_TPU_LOG_TO_FILE"]
        )
    else:
        handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(fmt)
    logger.addHandler(handler)
    logger.propagate = False
    _logger = logger
    return logger


def log_rank0(level: int, msg: str, *args) -> None:
    """Log only from process 0 (multi-host filtering like HugeCTR rank-0 logs)."""
    if _process_index() == 0:
        get_logger().log(level, msg, *args)


def info(msg: str, *args) -> None:
    log_rank0(logging.INFO, msg, *args)


def warning(msg: str, *args) -> None:
    log_rank0(logging.WARNING, msg, *args)


def debug(msg: str, *args) -> None:
    log_rank0(logging.DEBUG, msg, *args)


class Timer:
    """Simple wall-clock timer (reference: include/utils.hpp Timer)."""

    def __init__(self):
        self._start = None
        self._elapsed = 0.0

    def start(self):
        self._start = time.perf_counter()
        return self

    def stop(self):
        if self._start is not None:
            self._elapsed += time.perf_counter() - self._start
            self._start = None
        return self

    def reset(self):
        self._start = None
        self._elapsed = 0.0

    def elapsed_seconds(self) -> float:
        extra = 0.0
        if self._start is not None:
            extra = time.perf_counter() - self._start
        return self._elapsed + extra
