"""Pure-Python reimplementation of the crawl loop — the ordering / URL-seen
equivalence oracle required by the north_rule (SURVEY.md §5 oracle 6,
FIXTURES.md §6).

It models the reference's observable semantics (queue state machine from
crawler/src/crawl_queue.ts + handler.ts + master/src/models/queue.model.ts)
under the *deterministic ordering contract* both engines share:

    dequeue rank = (priority DESC, epoch_added ASC, url_hash ASC) per host,
    per-host cap, then (host_rank ASC, priority DESC, epoch_added, url_hash)
    globally, truncated to the token-bucket budget.

No Spark, no pandas — a few dicts. If the Spark engine and this loop
disagree on claim order, final statuses, retries, or the seen set, the Spark
engine is wrong.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from crawling_infrastructure_spark.config import TaskConfig
from crawling_infrastructure_spark.functions.html import clean_html, extract_links
from crawling_infrastructure_spark.functions.url import canonicalize_url, host_of
from crawling_infrastructure_spark.functions.xxhash import spark_xxhash64_str
from crawling_infrastructure_spark.schema import Status
from crawling_infrastructure_spark.synth import (
    OUTCOME_BLOCKED,
    OUTCOME_HTTP500,
    OUTCOME_OK,
    OUTCOME_TIMEOUT,
)


@dataclass
class Row:
    url: str
    host: str
    url_hash: int
    status: int = Status.INITIAL
    retries: int = 0
    priority: int = 1
    epoch_added: int = 0


@dataclass
class OracleCrawl:
    corpus: dict[str, str]  # canonical url -> html (str)
    cfg: TaskConfig
    outcome_fn: object  # (url, epoch) -> outcome
    robots_allowed: object = None  # optional (host, url) -> bool

    frontier: dict[str, Row] = field(default_factory=dict)
    claim_log: list[tuple[int, str]] = field(default_factory=list)  # (epoch, url) in claim order
    pages: dict[str, str] = field(default_factory=dict)  # url -> extracted text

    def _admit(self, items: list[str], epoch: int) -> int:
        added = 0
        for raw in items:
            c = canonicalize_url(raw)
            if c is None or c in self.frontier:
                continue
            host = host_of(c)
            if self.robots_allowed and not self.robots_allowed(host, c):
                continue
            self.frontier[c] = Row(
                url=c,
                host=host,
                url_hash=spark_xxhash64_str(c),
                priority=self.cfg.priority,
                epoch_added=epoch,
            )
            added += 1
        return added

    def seed(self, items: list[str]) -> int:
        return self._admit(items, epoch=0)

    def claim(self, epoch: int) -> list[Row]:
        cands = [r for r in self.frontier.values() if r.status == Status.INITIAL]
        by_host: dict[str, list[Row]] = {}
        for r in cands:
            by_host.setdefault(r.host, []).append(r)
        ranked: list[tuple[int, Row]] = []
        for host, rows in by_host.items():
            rows.sort(key=lambda r: (-r.priority, r.epoch_added, r.url_hash))
            for rank, r in enumerate(rows[: self.cfg.max_items_per_host_per_epoch], start=1):
                ranked.append((rank, r))
        ranked.sort(key=lambda t: (t[0], -t[1].priority, t[1].epoch_added, t[1].url_hash))
        return [r for _, r in ranked[: self.cfg.epoch_budget]]

    def run_epoch(self, epoch: int) -> dict:
        claimed = self.claim(epoch)
        if not claimed:
            return {"claimed": 0, "finished": not self.cfg.longliving}
        outlinks: list[str] = []
        completed = failed = blocked = 0
        for r in claimed:
            self.claim_log.append((epoch, r.url))
            r.status = Status.RUNNING
            html = self.corpus.get(r.url)
            outcome = self.outcome_fn(r.url, epoch) if self.outcome_fn else OUTCOME_OK
            if html is None:
                r.status, r.retries = Status.FAILED, r.retries + 1
                failed += 1
            elif outcome == OUTCOME_BLOCKED:
                r.status = Status.FAILED  # retries NOT consumed — handler.ts:171-176
                blocked += 1
            elif outcome in (OUTCOME_TIMEOUT, OUTCOME_HTTP500):
                r.status, r.retries = Status.FAILED, r.retries + 1
                failed += 1
            else:
                r.status, r.retries = Status.COMPLETED, r.retries + 1
                self.pages[r.url] = clean_html(html)
                outlinks.extend(extract_links(html))
                completed += 1
        # U2: failed below the retry cap -> initial
        for r in claimed:
            if r.status == Status.FAILED and r.retries < self.cfg.retry_failed_items:
                r.status = Status.INITIAL
        new_urls = self._admit(outlinks, epoch) if self.cfg.dedup else None
        # A2 taskFinished
        done = sum(1 for r in self.frontier.values() if r.status == Status.COMPLETED)
        dead = sum(
            1
            for r in self.frontier.values()
            if r.status == Status.FAILED and r.retries >= self.cfg.retry_failed_items
        )
        return {
            "claimed": len(claimed),
            "completed": completed,
            "failed": failed,
            "blocked": blocked,
            "new_urls": new_urls,
            "finished": not self.cfg.longliving and done + dead >= len(self.frontier),
        }

    def run(self, seeds: list[str], max_epochs: int = 50) -> list[dict]:
        self.seed(seeds)
        hist = []
        for epoch in range(1, max_epochs + 1):
            s = self.run_epoch(epoch)
            hist.append(s)
            if s["finished"]:
                break
        return hist

    @property
    def seen_set(self) -> set[str]:
        return set(self.frontier.keys())
