"""Transient-failure retry for first big device dispatches.

Measured behavior of this TPU stack (CLAUDE.md r3): the worker can crash
TRANSIENTLY on a first large dispatch ("kernel fault" JaxRuntimeError),
restart within ~1-3 minutes, and then run the same program fine. OOMs, by
contrast, are deterministic (measured twice in r4) and must NOT be
retried. The reference has no failure handling at all (SURVEY.md §5 —
its top-level try/except just logs and exits); this wrapper gives the
trainers and benches a bounded, classified retry.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, TypeVar

logger = logging.getLogger(__name__)

T = TypeVar("T")

# Deterministic failures: retrying wastes minutes and re-produces the same
# result. Substrings matched case-insensitively against the exception text.
_NON_RETRYABLE = (
    "resource_exhausted",
    "out of memory",
    "oom",
    "exceeds the limit",
    "invalid_argument",
)


def is_transient(exc: BaseException) -> bool:
    text = f"{type(exc).__name__}: {exc}".lower()
    if any(marker in text for marker in _NON_RETRYABLE):
        return False
    # XlaRuntimeError / JaxRuntimeError / grpc unavailability are the
    # observed transient classes; anything else (TypeError, ValueError...)
    # is a code bug and must propagate immediately.
    return any(
        marker in text
        for marker in ("runtimeerror", "unavailable", "internal", "aborted",
                       "kernel fault", "deadline")
    )


def retry_transient(
    fn: Callable[..., T],
    *args,
    retries: int = 2,
    wait_s: float = 90.0,
    what: str = "device dispatch",
    **kwargs,
) -> T:
    """Call fn(*args, **kwargs); on a TRANSIENT device failure wait for the
    worker to come back and retry up to `retries` times. Deterministic
    failures (OOM et al.) propagate immediately."""
    attempt = 0
    while True:
        try:
            return fn(*args, **kwargs)
        except Exception as exc:  # noqa: BLE001 — classified below
            if attempt >= retries or not is_transient(exc):
                raise
            attempt += 1
            logger.warning(
                "%s failed transiently (%s: %s); retry %d/%d in %.0fs "
                "(TPU worker restarts take ~1-3 min)",
                what, type(exc).__name__, str(exc)[:200], attempt, retries,
                wait_s,
            )
            time.sleep(wait_s)
