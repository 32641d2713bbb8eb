"""Driver-side cron loop for batch parity mode (R12 counterpart).

The reference runs its pipeline under a long-lived scheduler
(``Deno.cron``, git_etl.ts:351-355): register the job, fire at every
cron tick, keep going until killed. The streaming route maps that cron
to a processingTime trigger (pipeline/ingest.py:cron_interval_seconds);
this module is the BATCH route — a scheduler loop for deployments that
run the pipeline as repeated batch jobs rather than one resident
streaming query (the common posture for heavy backfills on shared
clusters, where holding executors between ticks wastes the pool).

Clock and sleep are injectable so tests run in virtual time; failures
follow the reference's fire-and-log semantics (one failed tick must not
kill the daemon — the next tick still fires), with a consecutive-
failure circuit breaker on top because a schedule that fails forever
should page, not spin.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from dataclasses import dataclass, field

log = logging.getLogger(__name__)


@dataclass
class TickResult:
    tick: int
    scheduled_at: float
    ok: bool
    error: str | None = None
    elapsed_s: float = 0.0


@dataclass
class CronLoop:
    """Fixed-interval scheduler: fire ``job`` every ``interval_s`` from
    an epoch-aligned grid (tick k fires at start + k*interval — a slow
    tick does NOT shift subsequent ticks, matching cron semantics; if a
    tick overruns its whole slot the missed firings are SKIPPED, not
    replayed in a burst, which is what ``*/N`` cron does too)."""

    job: Callable[[], None]
    interval_s: float
    max_consecutive_failures: int = 3
    clock: Callable[[], float] = time.monotonic
    sleep: Callable[[float], None] = time.sleep
    results: list[TickResult] = field(default_factory=list)

    def run(self, max_ticks: int | None = None) -> list[TickResult]:
        start = self.clock()
        tick = 0
        failures = 0
        while max_ticks is None or tick < max_ticks:
            due = start + tick * self.interval_s
            now = self.clock()
            if now < due:
                self.sleep(due - now)
            t0 = self.clock()
            try:
                self.job()
                failures = 0
                self.results.append(
                    TickResult(tick, due, True, elapsed_s=self.clock() - t0)
                )
            except Exception as exc:  # one bad tick must not kill the daemon
                failures += 1
                log.warning("tick %d failed: %s", tick, exc)
                self.results.append(
                    TickResult(tick, due, False, str(exc), self.clock() - t0)
                )
                if failures >= self.max_consecutive_failures:
                    raise RuntimeError(
                        f"{failures} consecutive tick failures — circuit open"
                    ) from exc
            # next grid slot strictly after the time the job finished:
            # overrunning a whole slot skips it rather than bursting
            finished = self.clock()
            tick += 1
            while start + tick * self.interval_s <= finished - self.interval_s:
                tick += 1
        return self.results
