"""Stats/timing decorators (reference: /root/reference/src/utils/decorators.py
`add_stats`, `when_fails_do`, `multiple_tries`)."""
from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict


@dataclass
class Stats:
    execution_time: float = 0.0
    calls: int = 0
    other: Dict[str, Any] = field(default_factory=dict)


def add_stats(stats_attr: str = "stats"):
    """Stamp execution time into a `Stats` found on the returned object (or
    returned tuple member) — the reference's add_stats convention
    (decorators.py:38)."""

    def deco(fn: Callable):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            dt = time.perf_counter() - t0
            candidates = out if isinstance(out, tuple) else (out,)
            for c in candidates:
                target = c if isinstance(c, Stats) else getattr(c, stats_attr, None)
                if isinstance(target, Stats):
                    target.execution_time = dt
                    target.calls += 1
                    break
                if hasattr(c, "duration"):
                    c.duration = dt
                    break
            return out

        return wrapper

    return deco


def when_fails_do(fallback: Callable):
    """Call `fallback` with the same args when fn raises (decorators.py:18)."""

    def deco(fn: Callable):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except Exception:  # noqa: BLE001
                return fallback(*args, **kwargs)

        return wrapper

    return deco


def multiple_tries(n: int = 3):
    """Retry fn up to n times, re-raising the last error (decorators.py)."""

    def deco(fn: Callable):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            last = None
            for _ in range(n):
                try:
                    return fn(*args, **kwargs)
                except Exception as exc:  # noqa: BLE001
                    last = exc
            raise last  # type: ignore[misc]

        return wrapper

    return deco
