"""Logging + assertion helpers.

Reference parity: ``BB_LOG_INFO/WARNING/ERROR`` (util.h:21-23, util.inl:11-25,
util.cpp:5-13) and ``BB_ASSERT`` (util.h:11-20). The reference compiles logging
out of release builds; here verbosity is runtime-controlled via the standard
``logging`` module (env ``BIBIM_LOG`` sets the level).
"""

from __future__ import annotations

import logging
import os

_logger = logging.getLogger("bibim_tpu")
if not _logger.handlers:
    _handler = logging.StreamHandler()
    _handler.setFormatter(logging.Formatter("[%(levelname)s] %(message)s"))
    _logger.addHandler(_handler)
    _logger.setLevel(os.environ.get("BIBIM_LOG", "INFO").upper())


def log_info(fmt: str, *args, **kwargs) -> None:
    _logger.info(fmt.format(*args, **kwargs) if (args or kwargs) else fmt)


def log_warning(fmt: str, *args, **kwargs) -> None:
    _logger.warning(fmt.format(*args, **kwargs) if (args or kwargs) else fmt)


def log_error(fmt: str, *args, **kwargs) -> None:
    _logger.error(fmt.format(*args, **kwargs) if (args or kwargs) else fmt)


def bb_assert(condition, message: str = "assertion failed") -> None:
    """Host-side invariant check (BB_ASSERT, util.h:11-20).

    Only for host/trace-time values; device-side checks use masking instead.
    """
    if not condition:
        raise AssertionError(message)
