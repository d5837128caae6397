"""Structured logging with the reference's two-level verbosity surface.

The reference uses two globals, verbose / very_verbose, set by -v / -V
(qc_shor.c:228-229, 1202-1209).  Here they map onto standard logging
levels: -v -> INFO, -V -> DEBUG, default WARNING.
"""

from __future__ import annotations

import logging
import sys

_ROOT = "quantumcomputer_tpu"
_configured = False


def configure(verbose: bool = False, very_verbose: bool = False) -> None:
    """Set the package log level from the CLI verbosity flags."""
    global _configured
    level = logging.WARNING
    if very_verbose:
        level = logging.DEBUG
    elif verbose:
        level = logging.INFO
    logger = logging.getLogger(_ROOT)
    logger.setLevel(level)
    if not _configured:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter(" --- %(name)s: %(message)s"))
        logger.addHandler(handler)
        logger.propagate = False
        _configured = True


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(f"{_ROOT}.{name}")
