"""Retry wrapper for transient runtime failures.

Long training runs through a remote-TPU tunnel occasionally hit
transient dispatch/compile RPC failures (e.g. "remote_compile: read
body: response body closed"). These are infrastructure flakes, not
program errors — retrying the failed operation succeeds. Genuine
errors (shape mismatches, OOM with a non-transient signature) re-raise
immediately.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, TypeVar

logger = logging.getLogger(__name__)

T = TypeVar("T")

TRANSIENT_MARKERS = (
    "remote_compile",
    "response body closed",
    "DEADLINE_EXCEEDED",
    "UNAVAILABLE",
    "Connection reset",
    "Broken pipe",
)


def is_transient(err: Exception) -> bool:
    msg = str(err)
    return any(m in msg for m in TRANSIENT_MARKERS)


def retry_transient(fn: Callable[..., T], *args, attempts: int = 4,
                    backoff_s: float = 15.0, **kwargs) -> T:
    """Call ``fn`` retrying up to ``attempts`` times on transient errors
    with linear backoff."""
    for i in range(attempts):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — filtered by is_transient
            if i + 1 >= attempts or not is_transient(e):
                raise
            wait = backoff_s * (i + 1)
            logger.warning("transient failure (%s...); retry %d/%d in %.0fs",
                           str(e)[:120], i + 1, attempts - 1, wait)
            time.sleep(wait)
    raise AssertionError("unreachable")
