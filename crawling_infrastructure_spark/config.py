"""Task configuration — the Spark equivalent of the reference's crawl-task
document (/root/reference/master/src/models/crawltask.model.ts:189-258).

Fields keep the reference's names, defaults, and clamps
(master/src/constants/crawlTaskApi.constants.ts:2-6) so a reference user can
carry their task JSON over unchanged. Scheduling fields that only make sense
for lambda fan-out (regions, function_code eval, worker caps) are replaced by
the epoch/politeness parameters documented per-field.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# master/src/constants/crawlTaskApi.constants.ts:2-6
MAX_SPEED_CRAWLING = 200.0
MIN_SPEED_CRAWLING = 0.001
HARD_LIMIT_MAX_WORKERS = 500
MIN_AVG_IPS = 0.01

# crawltask.model.ts:35-47
PRIORITY_ABSOLUTE = "absolute"
PRIORITY_RELATIVE = "relative"


@dataclass
class TaskConfig:
    task_id: str = "task0"
    # politeness budget, items/s across the whole task —
    # crawltask.model.ts:380-388, clamped like the reference API does
    max_items_per_second: float = 1.0
    # retry_failed_items — crawltask.model.ts:395-403 (default 3)
    retry_failed_items: int = 3
    # max items a single "worker batch" (here: one host-group in one epoch)
    # may claim — scheduler.conf.json:6 (num_items_http=30)
    max_items_per_worker: int = 30
    # priority 1-10 — crawltask.model.ts:371-378
    priority: int = 1
    priority_policy: str = PRIORITY_ABSOLUTE
    # wall-clock seconds one epoch represents; dequeue budget per epoch =
    # max_items_per_second * epoch_seconds (token bucket). The reference's
    # daemon_heartbeat is 10s (scheduler.conf.json:2).
    epoch_seconds: float = 10.0
    # per-host cap within an epoch (politeness: never hammer one host even
    # when the global budget allows it). The reference had no per-host
    # politeness at all — this is the north_rule addition.
    max_items_per_host_per_epoch: int = 30
    # longliving tasks never terminate on queue-drained — crawltask.model.ts:193-196
    longliving: bool = False
    # F12/F13 adaptive feedback: derive each epoch's dequeue budget from the
    # metrics table's trailing avg_items_per_second instead of the static
    # token bucket (plans/adaptive.py; runner.ts:302-329 semantics)
    adaptive_budget: bool = False
    # whether to honor robots.txt rules (north_rule addition; reference has none)
    respect_robots: bool = True
    # URL-seen dedup (reference permits duplicates — SURVEY.md S4/J3;
    # north_rule requires dedup, so default True)
    dedup: bool = True
    # Bloom filter sizing for the seen-set scale path
    seen_buckets: int = 32
    bloom_fpp: float = 0.001
    # frontier table bucket(N, host_hash) partition count. Epoch write-back
    # rewrites only dirty buckets (catalog.BucketedTable.merge_buckets), so
    # cost per epoch ~ frontier_size * touched_buckets / frontier_buckets;
    # at a 10^10-row frontier this would be O(10^3-10^4) buckets so one
    # bucket (~10^6-10^7 rows) fits an executor task comfortably
    frontier_buckets: int = 64
    # bloom prefilter before the exact anti-join: pays off when the frontier
    # is much larger than executor-broadcastable (the 10^10 design point);
    # at sandbox scale the exact anti-join alone is cheaper — both paths are
    # exact, this only moves work (see operators/seen.py)
    bloom_prefilter: bool = True
    extra: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        # clamp exactly like master/src/services/lib.ts speed validation
        self.max_items_per_second = min(
            MAX_SPEED_CRAWLING, max(MIN_SPEED_CRAWLING, self.max_items_per_second)
        )
        self.priority = min(10, max(1, self.priority))

    @property
    def epoch_budget(self) -> int:
        """Global dequeue budget per epoch = rate x epoch length, >= 1."""
        return max(1, int(self.max_items_per_second * self.epoch_seconds))
