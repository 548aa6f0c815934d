"""P4 — metric-creation rate limiting.

Reference: a token bucket caps new-metric creation at
``MAX_CREATES_PER_MINUTE``; over-limit creations are dropped and counted
(rurouni/utils.py:55-104, rurouni/cache.py:62-65,119-121, default 1000/min
in conf/rurouni.conf.example:15).

Semantics reproduced: a bucket of ``capacity`` tokens refilled continuously
at ``fill_rate`` tokens/second; ``consume(n)`` succeeds iff n tokens are
available right now. The clock is injectable for deterministic tests.

In the Spark engine this guards the *catalog insert* inside the ingest
``foreachBatch`` — Spark itself has no per-key admission; the driver-side
bucket is exact because catalog creation is a driver-coordinated step.
"""

from __future__ import annotations

import time
from collections.abc import Callable


class TokenBucket:
    """Continuous-refill token bucket (semantics of rurouni/utils.py:55-104).

    >>> clock = FakeClock()
    >>> b = TokenBucket(capacity=10, fill_rate=1, clock=clock)
    >>> b.consume(5), b.consume(5), b.consume(1)
    (True, True, False)
    >>> clock.advance(2); b.consume(1), b.consume(1), b.consume(1)
    (True, True, False)
    """

    def __init__(
        self,
        capacity: int,
        fill_rate: float,
        clock: Callable[[], float] = time.time,
    ):
        self.capacity = float(capacity)
        self.fill_rate = float(fill_rate)
        self._tokens = float(capacity)
        self._clock = clock
        self._last = clock()

    @property
    def tokens(self) -> float:
        now = self._clock()
        if self._tokens < self.capacity:
            self._tokens = min(
                self.capacity, self._tokens + self.fill_rate * (now - self._last)
            )
        self._last = now
        return self._tokens

    def consume(self, n: int = 1) -> bool:
        if n <= self.tokens:
            self._tokens -= n
            return True
        return False

    def drain(self, want: int) -> int:
        """Consume up to ``want`` tokens; returns how many were granted.
        (Batch-friendly extension: one micro-batch may carry many creates —
        the reference admits per-metric, we admit the first ``granted`` of a
        deterministically-ordered batch.)"""
        grant = int(min(want, self.tokens))
        if grant > 0:
            self._tokens -= grant
        return grant


def creates_per_minute_bucket(
    max_per_minute: int, clock: Callable[[], float] = time.time
) -> TokenBucket:
    """The reference's configuration shape: N creates/minute
    (rurouni/conf.py MAX_CREATES_PER_MINUTE)."""
    return TokenBucket(
        capacity=max_per_minute, fill_rate=max_per_minute / 60.0, clock=clock
    )


class FakeClock:
    """Deterministic clock for tests/doctests."""

    def __init__(self, start: float = 0.0):
        self.now = start

    def advance(self, dt: float) -> None:
        self.now += dt

    def __call__(self) -> float:
        return self.now
