"""Logging + per-stage wall-clock metrics.

Keeps the reference's observable contract: stage banners and per-stage
timings (``toolkits.py:141-160`` Logger; miniasm's ``[M::func] real=..``
lines; ``viralquasispecies.log`` parameter/count dumps) in structured form.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Iterator, Optional

_FMT = "%(asctime)s - %(levelname)s: %(message)s"


def get_logger(name: str = "hylight_tpu", logfile: Optional[str] = None,
               level: int = logging.INFO,
               rotating: bool = True) -> logging.Logger:
    """Console + optional timed-rotating file logger (the reference's
    Logger class contract, ``toolkits.py:141-160``: midnight rotation,
    file/line format)."""
    log = logging.getLogger(name)
    if not log.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(_FMT))
        log.addHandler(h)
        log.setLevel(level)
        log.propagate = False
    if logfile is not None and not any(
            isinstance(h, logging.FileHandler) and h.baseFilename ==
            logging.FileHandler(logfile, delay=True).baseFilename
            for h in log.handlers):
        if rotating:
            from logging.handlers import TimedRotatingFileHandler
            fh = TimedRotatingFileHandler(logfile, when="midnight",
                                          backupCount=7)
        else:
            fh = logging.FileHandler(logfile)
        fh.setFormatter(logging.Formatter(
            "%(asctime)s - %(pathname)s[line:%(lineno)d] - %(levelname)s: "
            "%(message)s"))
        log.addHandler(fh)
    return log


#: accumulated {stage_name: seconds}; read by pipelines for stats reporting
STAGE_TIMES: Dict[str, float] = {}


@contextlib.contextmanager
def stage(name: str, log: Optional[logging.Logger] = None) -> Iterator[None]:
    """Stage banner + wall-clock accounting ([M::name] style)."""
    log = log or get_logger()
    log.info("[S::%s] start", name)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        STAGE_TIMES[name] = STAGE_TIMES.get(name, 0.0) + dt
        log.info("[S::%s] done in %.3f s", name, dt)
