#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two parts:
1. analytics queries from the registry at $SPARK_GRAFT_SF_DIR (default
   /root/testdata/sf0.1), each forced end-to-end with a noop sink;
2. the crawl engine: seed->claim->fetch->extract->dedup->append epochs over
   a deterministic synthetic corpus, reporting pages crawled/sec and
   frontier-dedup throughput (URLs/sec) — the BASELINE.json headline metric.

Env knobs:
  SPARK_GRAFT_SF_DIR      testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS        local[N] (default 32)
  SPARK_GRAFT_BENCH_MODE  all | queries | crawl   (default all)
  SPARK_GRAFT_CRAWL_PAGES corpus size for the crawl bench (default 200000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _loadavg1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:  # non-Linux
        return -1.0


def _host_sys_share(dt: float = 4.0) -> float:
    """Host-wide system-jiffies share over an idle dt-second sample. This
    host's kernel-time storms (BENCH/BASELINE.md adjudication note 2)
    never move loadavg, but show here while we idle: ~0.02 clean, far
    higher mid-storm. Used by the quiet-window gate alongside loadavg."""
    try:
        s0, t0 = _stat_snapshot()
        time.sleep(dt)
        s1, t1 = _stat_snapshot()
        return (s1 - s0) / max(t1 - t0, 1)
    except OSError:  # non-Linux
        return 0.0


def _stat_snapshot() -> tuple[int, int]:
    """(system+irq+softirq jiffies, total jiffies) from /proc/stat line 1."""
    vals = [int(x) for x in open("/proc/stat").readline().split()[1:]]
    return vals[2] + vals[5] + vals[6], sum(vals)


class PhaseSysShare:
    """Host system-jiffy share over a measured phase — the mid-run storm
    detector. The start-of-run quiet gate cannot see a storm that begins
    AFTER the bench starts (observed: load 0.96 at gate, 25.8 mid-crawl,
    3x crawl wall). Clean heavy-crawl share on this host is ~0.10-0.20
    (our own shuffle/write I/O); kernel storms push it to 0.4+ with ~89%
    system time in the affected processes."""

    def __init__(self) -> None:
        try:
            self.s0, self.t0 = _stat_snapshot()
        except OSError:
            self.s0 = self.t0 = -1

    def finish(self) -> float:
        if self.t0 < 0:
            return 0.0
        try:
            s1, t1 = _stat_snapshot()
        except OSError:
            return 0.0
        return round((s1 - self.s0) / max(t1 - self.t0, 1), 3)


class PhaseInterference:
    """Both interference pathologies over one measured phase:
    - kernel storms: host system-jiffy share (PhaseSysShare) — they bill
      SYSTEM time to OUR processes, so neighbor CPU stays ~0
    - tenant contention: neighbor CPU cores = (host cgroup CPU - our
      process-tree CPU) / wall — clean sys-share but stolen cores
      (observed: own-sys 0.17 with throughput down 40% under load-10
      neighbors)
    """

    def __init__(self) -> None:
        self.t0 = time.time()
        self.sys = PhaseSysShare()
        self.host0 = CpuTracker._host_ns()
        self.proc0 = CpuTracker._proc_tree_stats()[0]

    def finish(self) -> dict:
        wall = max(time.time() - self.t0, 1e-9)
        out = {"host_sys_share": self.sys.finish()}
        proc_sec = CpuTracker._proc_tree_stats()[0] - self.proc0
        # own effective parallelism: the only visible signal for the THIRD
        # pathology — invisible core starvation (observed: 6 effective
        # cores of 32, 166 p/s vs 630 clean, with sys-share AND
        # neighbor-cores both reading clean; whatever steals the cores is
        # below this sandbox's cgroup visibility)
        out["own_cores"] = round(proc_sec / wall, 1)
        host1 = CpuTracker._host_ns()
        if self.host0 >= 0 and host1 >= 0:
            host_sec = (host1 - self.host0) / 1e9
            out["neighbor_cores"] = round(
                max(host_sec - proc_sec, 0.0) / wall, 2
            )
        return out


class LoadSampler:
    """Samples /proc/loadavg in the background so every published number
    carries its host-load context — this sandbox shares CPUs with other
    tenants and identical code swings ±2.5x with their bursts; without the
    trace a slow BENCH_rN line is unadjudicable post-hoc (VERDICT r2 #3)."""

    def __init__(self, interval: float = 5.0):
        self.before = _loadavg1()
        self.samples: list[float] = []
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, args=(interval,), daemon=True)
        self._t.start()

    def _run(self, interval: float) -> None:
        while not self._stop.wait(interval):
            self.samples.append(_loadavg1())

    def finish(self) -> dict:
        self._stop.set()
        self._t.join(timeout=1.0)
        s = self.samples or [_loadavg1()]
        return {
            "load_before": self.before,
            "load_mean_during": round(sum(s) / len(s), 1),
            "load_max_during": round(max(s), 1),
            "load_samples": len(s),
        }

class CpuTracker:
    """CPU-time + peak-RSS accounting for the whole process tree (python
    driver + py4j JVM + pyspark worker daemons), the adjudication instrument
    for wall-clock anomalies on this shared host (VERDICT r3 #2): engine work
    is CPU-time-invariant under contention — neighbors inflate wall, not our
    CPU — so a wall inversion with flat cpu_proc_sec is contention, while a
    ballooning cpu_proc_sec is a real engine regression (GC, thrash).

    Three independent signals per window:
      cpu_proc_sec  sum of utime+stime+cutime+cstime over our process tree
                    (walked via /proc ppid links; cutime/cstime fold in
                    already-reaped python workers) — MUST be read while the
                    JVM is alive, i.e. before spark.stop()
      cpu_host_sec  delta of the root cpuacct (this sandbox's cpuacct cgroup
                    is host-wide), so cpu_host_sec - cpu_proc_sec ~= CPU the
                    neighbors burned during the window
      rss_peak_gb   max VmHWM over the tree (the JVM dominates)
    """

    def __init__(self):
        self.t0 = time.time()
        self.host0 = self._host_ns()
        self.proc0, _, self.kind0 = self._proc_tree_stats()

    @staticmethod
    def _host_ns() -> int:
        try:
            with open("/sys/fs/cgroup/cpuacct/cpuacct.usage") as f:
                return int(f.read())
        except OSError:
            return -1

    @staticmethod
    def _proc_tree_stats() -> tuple[float, float, dict[str, float]]:
        """(cpu_sec, peak_rss_gb, cpu_by_kind) over self + all descendants.
        cpu_by_kind splits own-CPU (not reaped-children CPU, which cannot be
        attributed) by process name — 'java' (JVM: shuffle, GC, codegen,
        parquet) vs 'python' (driver + pyspark workers: the fetch/extract
        UDF path) — so a CPU-inflation diagnosis can say WHERE."""
        me = os.getpid()
        tck = os.sysconf("SC_CLK_TCK")
        children: dict[int, list[int]] = {}
        stats: dict[int, float] = {}
        own: dict[int, tuple[str, float]] = {}
        for entry in os.listdir("/proc"):
            if not entry.isdigit():
                continue
            pid = int(entry)
            try:
                with open(f"/proc/{pid}/stat") as f:
                    raw = f.read()
            except OSError:
                continue
            # comm may contain spaces/parens: split after the LAST ')'
            comm = raw.split("(", 1)[1].rsplit(")", 1)[0]
            rest = raw.rsplit(")", 1)[1].split()
            ppid = int(rest[1])  # field 4 overall
            utime, stime, cutime, cstime = (int(x) for x in rest[11:15])
            children.setdefault(ppid, []).append(pid)
            stats[pid] = (utime + stime + cutime + cstime) / tck
            own[pid] = (comm, (utime + stime) / tck, stime / tck)
        cpu, rss_kb, stack = 0.0, 0, [me]
        by_kind: dict[str, float] = {}
        while stack:
            pid = stack.pop()
            cpu += stats.get(pid, 0.0)
            if pid in own:
                comm, t, sys_t = own[pid]
                kind = "java" if "java" in comm else (
                    "python" if "python" in comm else "other"
                )
                by_kind[kind] = by_kind.get(kind, 0.0) + t
                by_kind["sys"] = by_kind.get("sys", 0.0) + sys_t
            stack.extend(children.get(pid, []))
            try:
                with open(f"/proc/{pid}/status") as f:
                    for line in f:
                        if line.startswith("VmHWM:"):
                            rss_kb = max(rss_kb, int(line.split()[1]))
                            break
            except OSError:
                pass
        return cpu, rss_kb / (1024 * 1024), by_kind

    def finish(self) -> dict:
        cpu, rss_gb, by_kind = self._proc_tree_stats()
        host1 = self._host_ns()
        out = {
            "cpu_proc_sec": round(cpu - self.proc0, 1),
            "rss_peak_gb": round(rss_gb, 2),
            "cpu_by_kind": {
                k: round(v - self.kind0.get(k, 0.0), 1) for k, v in by_kind.items()
            },
        }
        if self.host0 >= 0 and host1 >= 0:
            host = (host1 - self.host0) / 1e9
            out["cpu_host_sec"] = round(host, 1)
            out["cpu_neighbor_sec"] = round(max(0.0, host - cpu), 1)
        return out


HEADLINE_QUERIES = [
    "ranked_dequeue",
    "worker_meta_stats",
    "domain_count",
    "pricing_summary",
    "top_revenue_orders",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # exact-substring dedup (rolling 8-token window hash join)
    "dedup_substring",
    "embedding_neardup",
    # trained-k-means-cell semantic dedup (SemDedup)
    "semdedup",
    "ann_cosine_topk",
    # the trained-quantizer scale path (broadcast codebook + nprobe)
    "ann_cosine_topk_ivf",
    "lang_id",
    "quality_score",
    "token_counts",
    "fingerprint",
    # Gopher repetition filters + PII scrub (all-JVM text passes)
    "repetition_stats",
    "pii_scrub",
    "media_features",
    "windowed_event_counts",
    "sessionize",
    # the composite corpus funnel (lang/quality gates -> exact dedup ->
    # MinHash + connected-components keep-one); dedup_clusters is a strict
    # subset of this pipeline, so only the flagship is benched
    "training_corpus",
    # the mixture step: per-language token-budget prefix sampling
    "corpus_budget_sample",
    # link-analysis crawl prioritization (3 PageRank iterations, one plan)
    "host_pagerank",
    # benchmark decontamination (broadcast eval-window anti-probe)
    "decontaminate",
    # concat-and-chunk sequence packing (two-level bucketized cumsum)
    "pack_sequences",
    # CCNet-style capped-vocab bigram-LM perplexity scoring
    "lm_score",
]


def bench_queries(spark, sf_dir: str) -> tuple[dict[str, float], dict]:
    """Per-query walls, each taken under the cleanest window available.

    A tenant CPU burst landing on ONE query inflates it 5-10x (observed:
    embedding_neardup 4 s clean -> 42 s under a load-20 burst) without any
    kernel-storm signature, so every attempt runs under the SAME
    three-detector PhaseInterference the crawl phase uses, every attempt
    record is published (query_attempts), and the published wall per query
    is best-of-clean (best overall only when no attempt was clean, flagged
    per query in query_dirty). Adjudication parity with crawl_attempts was
    VERDICT r4 "what's wrong" #2: without the records, a host burst and an
    engine regression are indistinguishable post-hoc.
    """
    from crawling_infrastructure_spark.operators.corpus import release_checkpoints
    from crawling_infrastructure_spark.plans.queries import QUERIES

    retries = int(os.environ.get("SPARK_GRAFT_BENCH_QUERY_RETRIES", "1"))
    # best-of-N (default 2): host starvation can sit just UNDER every
    # detector threshold (observed: own_cores 7.7/32 reading "clean" while
    # walls run 1.6x) — a second unconditional attempt bounds that error
    # by min(), which no absolute threshold can
    best_of = max(int(os.environ.get("SPARK_GRAFT_BENCH_QUERY_BEST_OF", "2")), 1)
    loud = float(os.environ.get("SPARK_GRAFT_BENCH_QUERY_MAX_LOAD", "8"))
    max_neighbor = float(
        os.environ.get("SPARK_GRAFT_BENCH_MAX_NEIGHBOR_CORES", "2.0")
    )
    times: dict[str, float] = {}
    attempts: dict[str, list[dict]] = {}
    dirty: list[str] = []
    for name in HEADLINE_QUERIES:
        recs: list[dict] = []
        for attempt in range(best_of + max(retries, 0)):
            ph = PhaseInterference()
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            rec = {"attempt": attempt, "wall": round(wall, 3)}
            rec.update(ph.finish())
            # a retried training_corpus otherwise piles localCheckpoint RDD
            # blocks for the session lifetime (ADVICE r4)
            release_checkpoints()
            # neighbor-cores is the precise tenant detector; 1-min loadavg
            # lags a burst by minutes (observed: 4x query walls at
            # loadavg < 8); host_sys_share catches kernel storms, which
            # bill SYSTEM time to our own processes and leave the other
            # two signals reading clean (BENCH/BASELINE.md note 2)
            rec["clean"] = (
                rec.get("neighbor_cores", 0.0) <= max_neighbor
                and rec.get("host_sys_share", 0.0) <= 0.24
                and _loadavg1() < loud
            )
            recs.append(rec)
            if sum(r["clean"] for r in recs) >= best_of:
                break
        clean = [r for r in recs if r["clean"]]
        best = min(clean or recs, key=lambda r: r["wall"])
        times[name] = best["wall"]
        attempts[name] = recs
        if not clean:
            dirty.append(name)
    meta = {"query_attempts": attempts}
    if dirty:
        meta["query_dirty"] = dirty
    return times, meta


def bench_crawl(spark, n_pages: int, n_hosts: int) -> dict:
    from crawling_infrastructure_spark.config import TaskConfig
    from crawling_infrastructure_spark.plans.epoch import CrawlJob
    from crawling_infrastructure_spark.sources.seeds import seeds_from_list
    from crawling_infrastructure_spark.synth import gen_pages, seed_urls, fetch_outcome

    corpus = gen_pages(spark, n_pages, n_hosts).cache()
    corpus.count()  # materialize outside the timed window

    root = tempfile.mkdtemp(prefix="bench_cat_")
    # firehose politeness config: rate cap at the reference's 200 items/s
    # ceiling with long epochs -> budget n_pages/3 per epoch; per-host cap
    # sized so the Zipf head doesn't starve the budget
    budget = max(n_pages // 3, 1000)
    cfg = TaskConfig(
        task_id="bench",
        max_items_per_second=200.0,
        epoch_seconds=budget / 200.0,
        max_items_per_host_per_epoch=max(budget // max(n_hosts // 4, 1), 50),
        retry_failed_items=1,
        bloom_prefilter=False,  # exact anti-join path; bloom is the 10^10 path
    )
    job = CrawlJob(spark, root, corpus, cfg, outcome_fn=fetch_outcome, claim_snapshot=False)
    # seed with every corpus url (claim-all backfill shape) so the fetch
    # stage carries real volume instead of waiting on BFS discovery
    seeds = corpus.select("url").withColumnRenamed("url", "item")
    t0 = time.time()
    job.init_task(seeds)
    init_s = time.time() - t0

    pages = urls = 0
    t0 = time.time()
    epochs = 0
    for e in range(1, 9):
        s = job.run_epoch(e)
        epochs += 1
        pages += s.completed
        urls += s.claimed + s.new_urls
        if s.finished or s.claimed == 0:
            break
    wall = time.time() - t0
    shutil.rmtree(root, ignore_errors=True)
    corpus.unpersist()  # a storm-retry re-enters here; don't pile caches
    return {
        "n_pages": n_pages,
        "n_hosts": n_hosts,
        "epochs": epochs,
        "init_sec": round(init_s, 1),
        "crawl_sec": round(wall, 1),
        "pages_crawled": pages,
        "urls_processed": urls,
        "pages_per_sec": round(pages / wall, 1),
        "dedup_urls_per_sec": round(urls / wall, 1),
    }


def bench_scaling(spark, n_pages: int, n_hosts: int, weight: int = 60) -> dict:
    """The north-rule scaling measurement: ONE claim-all epoch (the shape of
    a production epoch, where per-epoch data volume dwarfs scheduling
    overhead) over a heavy-page corpus. Fetch/extract (Python regex over
    ~10KB HTML each), canonicalization+hashing of ~1M outlinks, window
    ranking, exact dedup anti-join, and columnar writes all scale with
    cores; the same input is used at every parallelism level."""
    from crawling_infrastructure_spark.config import TaskConfig
    from crawling_infrastructure_spark.plans.epoch import CrawlJob
    from crawling_infrastructure_spark.synth import gen_pages, fetch_outcome

    corpus_path = os.environ.get("SPARK_GRAFT_CORPUS", "")
    if corpus_path:
        corpus = spark.read.parquet(corpus_path)  # pre-generated, identical input
    else:
        corpus = gen_pages(spark, n_pages, n_hosts, weight=weight).cache()
        corpus.count()
    root = tempfile.mkdtemp(prefix="bench_scale_")
    cfg = TaskConfig(
        task_id="scale",
        max_items_per_second=200.0,          # reference politeness ceiling
        epoch_seconds=n_pages / 200.0,       # one epoch's token bucket = corpus
        max_items_per_host_per_epoch=n_pages,
        retry_failed_items=1,
        bloom_prefilter=False,
    )
    job = CrawlJob(spark, root, corpus, cfg, outcome_fn=fetch_outcome, claim_snapshot=False)
    seeds = corpus.select("url").withColumnRenamed("url", "item")
    # steady-state measurement: the north-rule metric is crawl-loop
    # throughput; init_task (seed canonicalization + first frontier write)
    # happens once per task lifetime, not per epoch, and is reported
    # separately
    t_init = time.time()
    job.init_task(seeds)
    init_s = time.time() - t_init
    t0 = time.time()
    s = job.run_epoch(1)
    wall = time.time() - t0
    shutil.rmtree(root, ignore_errors=True)
    return {
        "n_pages": n_pages,
        "weight": weight,
        "init_sec": round(init_s, 1),
        "wall_sec": round(wall, 1),
        "pages_crawled": s.completed,
        "urls_processed": s.claimed + s.new_urls,
        "pages_per_sec": round(s.completed / wall, 1),
        "dedup_urls_per_sec": round((s.claimed + s.new_urls) / wall, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "all")
    crawl_pages = int(os.environ.get("SPARK_GRAFT_CRAWL_PAGES", "50000"))

    # quiet-window gate (VERDICT r3 #5): this host's tenants burst 5-27 load
    # with nothing of ours running; a bench line recorded under a burst is
    # noise. Wait (bounded) for 1-min load below threshold before starting;
    # the wait itself is recorded so a gated-but-still-loud run is visible.
    gate = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "4"))
    gate_timeout = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_TIMEOUT", "600"))
    max_sys = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_SYS", "0.05"))
    waited = 0.0
    while waited < gate_timeout:
        if _loadavg1() >= gate:
            time.sleep(15)
            waited += 15
            continue
        if _host_sys_share() < max_sys:  # samples 4s; counts toward timeout
            break
        waited += 4 + 15
        time.sleep(15)

    from crawling_infrastructure_spark.session import get_spark

    spark = get_spark(app_name="bench", cpus=cpus)
    cpu = CpuTracker()
    load = LoadSampler()
    out: dict = {"sf": sf_dir, "cpus": cpus}
    total = 0.0
    # clean own-sys at full bore measured ~0.16-0.19 (shuffle/write I/O);
    # an interference-hit crawl ran at 0.255 with 40% throughput loss, so
    # the threshold sits just above the clean band — a spurious retry only
    # costs one extra crawl attempt and best-of-N keeps the cleaner one
    storm_sys = float(os.environ.get("SPARK_GRAFT_BENCH_STORM_SYS", "0.24"))
    crawl_retries = int(os.environ.get("SPARK_GRAFT_BENCH_CRAWL_RETRIES", "1"))
    if mode in ("all", "queries"):
        t0 = time.time()
        ph = PhaseSysShare()
        out["queries"], qmeta = bench_queries(spark, sf_dir)
        out.update(qmeta)
        out["queries_host_sys_share"] = ph.finish()
        total += time.time() - t0
    if mode in ("all", "crawl"):
        # Retry-on-storm: the headline crawl number is worthless if a host
        # kernel storm lands mid-run (start gate can't see it). Re-run the
        # crawl phase up to crawl_retries times when the phase's host
        # system-share exceeds storm_sys; publish the cleanest attempt and
        # keep every attempt in crawl_attempts for adjudication.
        max_neighbor = float(
            os.environ.get("SPARK_GRAFT_BENCH_MAX_NEIGHBOR_CORES", "2.0")
        )
        # invisible core starvation: a big crawl at full width should busy
        # well over 22% of the requested cores (clean ~0.4-0.6x; the
        # starved state measured 0.19x); small/driver-bound runs are exempt
        min_own = (
            0.22 * cpus
            if crawl_pages >= 20000
            else float(os.environ.get("SPARK_GRAFT_BENCH_MIN_OWN_CORES", "0"))
        )

        def is_clean(c: dict) -> bool:
            return (
                c["host_sys_share"] <= storm_sys
                and c.get("neighbor_cores", 0.0) <= max_neighbor
                and c.get("own_cores", 1e9) >= min_own
            )

        # best-of-N (default 2 clean attempts): detector thresholds bound
        # gross interference but starvation just above min_own still costs
        # 30-40% wall (observed: own_cores 7.7/32 "clean" at 565 pages/s vs
        # 10.9 at 785 — throughput tracks delivered cores ~1:1); a second
        # clean attempt lets max() shed the stingier window
        crawl_best_of = max(
            int(os.environ.get("SPARK_GRAFT_BENCH_CRAWL_BEST_OF", "2")), 1
        )
        attempts = []
        for attempt in range(crawl_best_of + max(crawl_retries, 0)):
            ph = PhaseInterference()
            c = bench_crawl(spark, crawl_pages, max(crawl_pages // 500, 10))
            c.update(ph.finish())
            c["attempt"] = attempt
            # throughput per DELIVERED core — invariant under host core
            # starvation (measured 72.0-73.3 across rounds while wall
            # throughput swung 785 -> 565), so regressions show up here
            # even when no clean window exists
            if c.get("own_cores"):
                c["pages_per_own_core"] = round(
                    c["pages_per_sec"] / c["own_cores"], 1
                )
            attempts.append(c)
            if sum(1 for a in attempts if is_clean(a)) >= crawl_best_of:
                break
            # bounded re-quiet before the retry (waits NOT added to total)
            for _ in range(10):
                if _loadavg1() < gate and _host_sys_share() < max_sys:
                    break
                time.sleep(15)
        clean = [c for c in attempts if is_clean(c)]
        # best-of-N: interference only ever slows us, so the fastest clean
        # attempt (or fastest overall if none were clean) is the engine number
        crawl = max(clean or attempts, key=lambda c: c["pages_per_sec"])
        crawl["storm_during"] = crawl not in clean
        out["crawl"] = crawl
        if len(attempts) > 1:
            out["crawl_attempts"] = attempts
        out["pages_per_sec"] = crawl["pages_per_sec"]
        out["dedup_urls_per_sec"] = crawl["dedup_urls_per_sec"]
        total += crawl["crawl_sec"] + crawl["init_sec"]
    if mode == "scaling":
        sc = bench_scaling(spark, crawl_pages, max(crawl_pages // 500, 10))
        out["scaling"] = sc
        out["pages_per_sec"] = sc["pages_per_sec"]
        out["dedup_urls_per_sec"] = sc["dedup_urls_per_sec"]
        total += sc["wall_sec"]
    out["metric"] = "bench_suite_seconds"
    out["value"] = round(total, 1)
    out["unit"] = "sec"
    out.update(load.finish())
    out.update(cpu.finish())  # must run BEFORE spark.stop(): walks the live JVM
    try:
        # GC wall via JMX: the adjudicator for JVM-CPU blow-ups — a trial
        # whose cpu_proc balloons WITH gc_ms is a collector death spiral
        # (memory pressure), not engine work or neighbors
        beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        out["gc_ms"] = sum(beans.get(i).getCollectionTime() for i in range(beans.size()))
        out["gc_count"] = sum(beans.get(i).getCollectionCount() for i in range(beans.size()))
    except Exception:
        pass
    out["quiet_wait_sec"] = waited
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
