"""Leveled, optionally-colored logging.

Replaces the reference's ad-hoc ANSI ``std::cout`` macros
(``common/colored_output.h:1-22``, used e.g. at ``sph/sph.cpp:32``,
``sph/iisph/iisph.cpp:31``) with a real log hierarchy: levels, timestamps,
and automatic color suppression when not attached to a TTY.
"""

from __future__ import annotations

import logging
import os
import sys

_RESET = "\x1b[0m"
_COLORS = {
    logging.DEBUG: "\x1b[36m",    # cyan
    logging.INFO: "\x1b[32m",     # green (the reference's OKGREEN)
    logging.WARNING: "\x1b[33m",  # yellow
    logging.ERROR: "\x1b[31m",    # red (the reference's FAIL)
    logging.CRITICAL: "\x1b[1;31m",
}


class _ColorFormatter(logging.Formatter):
    def __init__(self, use_color: bool):
        super().__init__("%(asctime)s %(levelname)s %(name)s: %(message)s",
                         datefmt="%H:%M:%S")
        self._use_color = use_color

    def format(self, record):
        msg = super().format(record)
        if self._use_color:
            color = _COLORS.get(record.levelno, "")
            return f"{color}{msg}{_RESET}"
        return msg


def get_logger(name: str = "nereus_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        use_color = sys.stderr.isatty() and os.environ.get("NO_COLOR") is None
        handler.setFormatter(_ColorFormatter(use_color))
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("NEREUS_LOG_LEVEL", "INFO").upper())
        logger.propagate = False
    return logger
