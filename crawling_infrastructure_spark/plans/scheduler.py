"""Multi-task scheduling — the daemon's cross-task budget allocation
(master/scheduler/daemon.ts:203-241, 308-391) re-expressed driver-side.

Two policies, exactly the reference's enum (crawltask.model.ts:35-47):

- ``absolute``: only tasks tied for MAX priority receive budget this cycle
  (daemon.ts:220-226).
- ``relative``: every runnable task gets budget proportional to its
  priority. (The reference sorts ascending despite its 'higher first'
  comment — daemon.ts:227-241 — but since it then processes ALL tasks
  sequentially the order has no observable effect on budgets; what is
  observable is per-task max_items_per_second, which we scale by priority
  share.)

A 'cycle' = one epoch for each scheduled task. Tasks whose frontier is
drained (and not longliving) leave the pool, mirroring taskFinished
flipping tasks to completed (daemon.ts:107-114).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from crawling_infrastructure_spark.config import PRIORITY_ABSOLUTE, PRIORITY_RELATIVE
from crawling_infrastructure_spark.plans.epoch import CrawlJob, EpochStats


@dataclass
class ScheduledTask:
    job: CrawlJob
    finished: bool = False
    paused: bool = False
    epoch: int = 0
    history: list[EpochStats] = field(default_factory=list)


class MultiTaskScheduler:
    def __init__(self, jobs: list[CrawlJob], policy: str = PRIORITY_ABSOLUTE):
        assert policy in (PRIORITY_ABSOLUTE, PRIORITY_RELATIVE)
        self.policy = policy
        self.tasks = [ScheduledTask(job=j) for j in jobs]

    def _task(self, task_id: str) -> ScheduledTask:
        for t in self.tasks:
            if t.job.cfg.task_id == task_id:
                return t
        raise KeyError(task_id)

    # U6 pause/resume — CrawlStatus started <-> paused
    # (crawltask.service.ts:178-206; daemon.ts:350-353 skips non-started)
    def pause(self, task_id: str | None = None) -> None:
        """Pause one task, or every started task (pauseTasks semantics)."""
        for t in self.tasks if task_id is None else [self._task(task_id)]:
            if not t.finished:
                t.paused = True

    def resume(self, task_id: str | None = None) -> None:
        """paused -> started (resumeTasks semantics)."""
        for t in self.tasks if task_id is None else [self._task(task_id)]:
            t.paused = False

    def _runnable(self) -> list[ScheduledTask]:
        return [t for t in self.tasks if not t.finished and not t.paused]

    def _scheduled_this_cycle(self) -> list[tuple[ScheduledTask, float]]:
        """(task, budget_share) pairs for one cycle under the policy."""
        runnable = self._runnable()
        if not runnable:
            return []
        if self.policy == PRIORITY_ABSOLUTE:
            top = max(t.job.cfg.priority for t in runnable)
            return [(t, 1.0) for t in runnable if t.job.cfg.priority == top]
        total = sum(t.job.cfg.priority for t in runnable)
        return [(t, t.job.cfg.priority / total) for t in runnable]

    def run_cycle(self) -> list[tuple[str, EpochStats]]:
        out = []
        for t, share in self._scheduled_this_cycle():
            cfg = t.job.cfg
            original_rate = cfg.max_items_per_second
            # scale the politeness budget by the policy share for this cycle
            cfg.max_items_per_second = max(0.001, original_rate * share)
            try:
                t.epoch += 1
                s = t.job.run_epoch(t.epoch)
            finally:
                cfg.max_items_per_second = original_rate
            t.history.append(s)
            t.finished = s.finished
            out.append((cfg.task_id, s))
        return out

    def run(self, max_cycles: int = 20) -> dict[str, list[EpochStats]]:
        for _ in range(max_cycles):
            if not self._runnable():
                break
            self.run_cycle()
        return {t.job.cfg.task_id: t.history for t in self.tasks}
