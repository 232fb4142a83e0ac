"""Structured failure reporting and retry-on-preemption (aux subsystem).

Counterpart of the reference's torch.distributed.elastic ``@record``
decorator (src/train/train_stage1.py:30-31) plus the auto-resume the HF
Trainer provides implicitly: entry points wrapped with ``record`` write a
JSON crash report (host, process index, traceback, device state) before
re-raising, and ``run_with_restarts`` relaunches a resumable step loop after
transient failures (the orbax CheckpointManager makes the restart cheap).
"""

from __future__ import annotations

import datetime
import functools
import json
import os
import socket
import sys
import time
import traceback
from typing import Callable, Optional, Type


def _error_report(exc: BaseException) -> dict:
    report = {
        "timestamp": datetime.datetime.now().isoformat(),
        "host": socket.gethostname(),
        "pid": os.getpid(),
        "exception_type": type(exc).__name__,
        "message": str(exc),
        "traceback": traceback.format_exc(),
        "argv": sys.argv,
    }
    try:
        import jax

        report["process_index"] = jax.process_index()
        report["process_count"] = jax.process_count()
        report["backend"] = jax.default_backend()
    except Exception:
        pass
    return report


def record(fn: Callable = None, *, error_dir: str = "./error_reports"):
    """Decorator: on exception, dump a structured JSON report then re-raise
    (elastic ``record`` semantics)."""

    def decorate(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            try:
                return f(*args, **kwargs)
            except BaseException as e:  # noqa: BLE001 — report everything
                if isinstance(e, (KeyboardInterrupt, SystemExit)):
                    raise
                os.makedirs(error_dir, exist_ok=True)
                path = os.path.join(
                    error_dir,
                    f"error_{os.getpid()}_{int(time.time())}.json")
                with open(path, "w") as fp:
                    json.dump(_error_report(e), fp, indent=2)
                print(f"[u2-tpu] crash report written to {path}",
                      file=sys.stderr)
                raise

        return wrapper

    if fn is not None:
        return decorate(fn)
    return decorate


TRANSIENT_ERRORS = (
    "DATA_LOSS", "UNAVAILABLE", "DEADLINE_EXCEEDED", "RESOURCE_EXHAUSTED",
    "preempt", "socket closed", "connection reset",
)


def is_transient(exc: BaseException) -> bool:
    text = f"{type(exc).__name__}: {exc}".lower()
    return any(tok.lower() in text for tok in TRANSIENT_ERRORS)


def run_with_restarts(fn: Callable, max_restarts: int = 3,
                      backoff_s: float = 30.0,
                      error_dir: str = "./error_reports"):
    """Run ``fn()`` (a resumable loop, e.g. train.loop.run_training with
    orbax auto-resume) and restart it after transient infrastructure
    failures — preemption handling the reference lacks (SURVEY.md §5)."""
    attempts = 0
    while True:
        try:
            return record(fn, error_dir=error_dir)()
        except BaseException as e:  # noqa: BLE001
            if isinstance(e, (KeyboardInterrupt, SystemExit)):
                raise
            attempts += 1
            if attempts > max_restarts or not is_transient(e):
                raise
            print(f"[u2-tpu] transient failure ({e}); restart "
                  f"{attempts}/{max_restarts} in {backoff_s:.0f}s",
                  file=sys.stderr)
            time.sleep(backoff_s)
