"""Fault-tolerant reads (S6 analog).

The reference's REST reader wraps every fetch in a bounded retry loop
with backoff and treats only transport-level errors as retriable
(``src/data_input/api.py:18-154``).  Here the storage analog: transient
``OSError``/Arrow IO errors on file reads retry with exponential
backoff; application errors (bad schema, corrupt data semantics)
propagate immediately.  Layered defense on a real cluster:

- in-process retry (this module) absorbs blips without losing the task;
- Ray task retries (``max_retries``) replay the whole read task if the
  worker itself dies;
- the epoch-fenced sink makes any replay idempotent — a re-run epoch
  overwrites its own staging dir and commits once.
"""

from __future__ import annotations

import time
from typing import Callable, TypeVar

T = TypeVar("T")

# pyarrow's ArrowIOError subclasses OSError, so this covers filesystem
# blips, NFS timeouts, and Arrow-level IO failures alike
TRANSIENT_ERRORS: tuple[type[BaseException], ...] = (OSError,)

# ...but some OSError subclasses signal permanent configuration errors
# (missing file, bad permissions, wrong path kind) that the reference's
# retry loop would surface immediately, not after backoff
NON_TRANSIENT_ERRORS: tuple[type[BaseException], ...] = (
    FileNotFoundError,
    PermissionError,
    NotADirectoryError,
    IsADirectoryError,
)


def with_retries(
    fn: Callable[[], T],
    retries: int = 3,
    backoff_s: float = 0.05,
    transient: tuple[type[BaseException], ...] = TRANSIENT_ERRORS,
) -> T:
    """Call ``fn``, retrying up to ``retries`` times on transient errors
    with exponential backoff.  Raises the last error when exhausted;
    permanent-config OSError subclasses propagate immediately."""
    for attempt in range(retries + 1):
        try:
            return fn()
        except NON_TRANSIENT_ERRORS:
            raise
        except transient:
            if attempt == retries:
                raise
            time.sleep(backoff_s * (2 ** attempt))
    raise AssertionError("unreachable")
