"""F12/F13 adaptive throughput feedback — epoch budgets derived from
measured trailing items/second, exactly mirroring the reference's
lambda-sizing arithmetic:

- items per worker batch:   master/scheduler/runner.ts:302-329 (getNumItems)
- concurrent worker count:  master/src/models/crawltask.model.ts:449-478
                            (maxWorkersConcurrentlyRunning)
- hard clamp + composition: master/scheduler/daemon.ts:356-377

The reference appends one avg_items_per_second measurement per finished
worker to ``task.avg_items_per_second_worker`` and feeds average(array) into
both formulas. Here the measurements are the metrics table's per-(epoch,
host) ``avg_items_per_second`` rows — same granularity (one worker batch),
and the average is computed as a Spark aggregate so only (count, mean) reach
the driver, never the array.

Divergence, documented: when maxWorkersConcurrentlyRunning exceeds
HARD_LIMIT_MAX_WORKERS the reference daemon launches NOTHING that heartbeat
(daemon.ts:373-376) and retries later once running workers drain; an epoch
model has no draining to wait for, so we clamp to the limit instead of
stalling forever. Everything else is the identical arithmetic.
"""

from __future__ import annotations

import math

from crawling_infrastructure_spark.config import HARD_LIMIT_MAX_WORKERS, MIN_AVG_IPS

# scheduler.conf.json: num_items_http=30, max_crawling_time_lambda=240
NUM_ITEMS_HTTP = 30
MAX_CRAWLING_TIME_LAMBDA = 240
# runner.ts:310 / crawltask.model.ts:454 — assumed http worker throughput
ASSUMED_HTTP_IPS = 0.5
# runner.ts:304 — minimum measurements before trusting the average
MIN_MEASUREMENTS = 7


def adaptive_num_items(
    n_measurements: int, avg_rps: float | None, max_items_per_worker: int | None = None
) -> int:
    """getNumItems (runner.ts:302-329), http worker type: conservative
    default below 7 measurements, else floor(240s of crawl time / seconds
    per item), clamped by the task's max_items_per_worker."""
    num_items = NUM_ITEMS_HTTP
    if n_measurements >= MIN_MEASUREMENTS:
        rps = avg_rps if avg_rps is not None else 0.0
        if rps <= 0:
            rps = ASSUMED_HTTP_IPS
        num_items = math.floor(MAX_CRAWLING_TIME_LAMBDA / (1.0 / rps))
    if max_items_per_worker:
        num_items = min(num_items, max_items_per_worker)
    return num_items


def max_workers_concurrently_running(
    n_measurements: int, avg_rps: float | None, max_items_per_second: float
) -> int:
    """maxWorkersConcurrentlyRunning (crawltask.model.ts:449-478): workers =
    floor(target rate / measured per-worker rate), floored at 1, with the
    MIN_AVG_IPS=0.01 guard against failing-worker feedback explosions."""
    if n_measurements <= 0 or avg_rps is None:
        avg = ASSUMED_HTTP_IPS
    else:
        avg = avg_rps
    if avg < MIN_AVG_IPS:
        avg = MIN_AVG_IPS
    n = max_items_per_second / avg
    return 1 if n <= 1 else math.floor(n)


def adaptive_epoch_budget(
    n_measurements: int,
    avg_rps: float | None,
    max_items_per_second: float,
    max_items_per_worker: int | None = None,
) -> int:
    """One heartbeat's dequeue volume = workers x items-per-worker
    (daemon.ts:356-377 composed with runner.ts getNumItems), workers clamped
    at HARD_LIMIT_MAX_WORKERS (see module docstring for the divergence)."""
    workers = min(
        max_workers_concurrently_running(n_measurements, avg_rps, max_items_per_second),
        HARD_LIMIT_MAX_WORKERS,
    )
    return workers * adaptive_num_items(n_measurements, avg_rps, max_items_per_worker)
