"""Versioned Parquet tables with Iceberg-style snapshot semantics.

The design targets Iceberg (frontier bucketed by ``bucket(N, host_hash)``,
MERGE INTO for status write-back, snapshot tags per epoch, rollback on
resume). The sandbox has no Iceberg runtime jar, so this module provides the
same contract over plain Parquet with an atomic-rename manifest:

    <root>/<table>/
        v_00000001_<uuid>/   data dirs (parquet)
        _manifest.json       {"current": N, "versions": [...]}

- a *version* is a list of data dirs; ``append`` adds a dir without rewriting
  history (O(delta), like an Iceberg append snapshot); ``write_full``
  replaces the dir list (like MERGE/overwrite snapshots)
- commit = write manifest to a temp file + ``os.replace`` (atomic on POSIX);
  the epoch driver is the single writer, so this is race-free by
  construction — exactly the property the reference lacked and papered over
  with heartbeat healing (master/doc/QueueArch.md, workermeta.model.ts:125-203)
- every version can carry a ``tag`` (we tag ``epoch-K``); ``rollback`` makes
  an old version current again → kill-and-resume recovers the exact frontier
  (replaces the reference's U4/U7/U8 queue-healing machinery, SURVEY.md §2.6)

On a real cluster swap this file for ``spark.table("catalog.db.frontier")``
+ Iceberg MERGE INTO; the operator code only touches the Table API below.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class Table:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.name = name
        self._manifest_path = os.path.join(self.dir, "_manifest.json")

    # -- manifest ---------------------------------------------------------
    def _load(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"current": 0, "versions": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _commit(self, manifest: dict) -> None:
        os.makedirs(self.dir, exist_ok=True)
        tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic commit point

    def exists(self) -> bool:
        return bool(self._load()["versions"])

    def current_version(self) -> int:
        return self._load()["current"]

    def snapshots(self) -> list[dict]:
        return self._load()["versions"]

    def _current_dirs(self, manifest: dict | None = None) -> list[str]:
        m = manifest or self._load()
        for v in m["versions"]:
            if v["version"] == m["current"]:
                return v["dirs"]
        return []

    # -- data -------------------------------------------------------------
    def _new_data_dir(self, version: int) -> str:
        return os.path.join(self.dir, f"v_{version:08d}_{uuid.uuid4().hex[:8]}")

    def _write_dir(self, df: DataFrame, path: str) -> None:
        df.write.mode("overwrite").parquet(path)

    def write_full(self, df: DataFrame, tag: str | None = None) -> int:
        """Overwrite snapshot (the Parquet stand-in for Iceberg MERGE INTO /
        overwritePartitions). New version references only the new dir."""
        m = self._load()
        version = m["current"] + 1
        d = self._new_data_dir(version)
        self._write_dir(df, d)
        m["versions"].append({"version": version, "dirs": [d], "tag": tag})
        m["current"] = version
        self._commit(m)
        return version

    def append(self, df: DataFrame, tag: str | None = None) -> int:
        """Append snapshot: O(new data) — no rewrite of existing dirs."""
        m = self._load()
        version = m["current"] + 1
        d = self._new_data_dir(version)
        self._write_dir(df, d)
        dirs = self._current_dirs(m) + [d]
        m["versions"].append({"version": version, "dirs": dirs, "tag": tag})
        m["current"] = version
        self._commit(m)
        return version

    def read(self, spark: SparkSession) -> DataFrame:
        dirs = self._current_dirs()
        if not dirs:
            raise FileNotFoundError(f"table {self.name} has no data")
        return spark.read.parquet(*dirs)

    def read_version(self, spark: SparkSession, version: int) -> DataFrame:
        for v in self._load()["versions"]:
            if v["version"] == version:
                return spark.read.parquet(*v["dirs"])
        raise KeyError(f"{self.name}: no version {version}")

    def version_by_tag(self, tag: str) -> int | None:
        hits = [v["version"] for v in self._load()["versions"] if v.get("tag") == tag]
        return max(hits) if hits else None

    def rollback(self, version: int) -> None:
        """Make an older snapshot current (Iceberg rollback_to_snapshot) —
        the resume path after a killed job."""
        m = self._load()
        if version not in [v["version"] for v in m["versions"]]:
            raise KeyError(f"{self.name}: no version {version}")
        m["current"] = version
        self._commit(m)

    def expire_snapshots(self, keep_last: int = 5) -> None:
        """GC old versions' unreferenced dirs (Iceberg expire_snapshots)."""
        m = self._load()
        if len(m["versions"]) <= keep_last:
            return
        keep = m["versions"][-keep_last:]
        if m["current"] not in [v["version"] for v in keep]:
            keep = [v for v in m["versions"] if v["version"] == m["current"]] + keep
        referenced = {d for v in keep for d in v["dirs"]}
        for v in m["versions"]:
            for d in v["dirs"]:
                if d not in referenced and os.path.exists(d):
                    shutil.rmtree(d, ignore_errors=True)
        m["versions"] = keep
        self._commit(m)


class Catalog:
    """A directory of Tables — the stand-in for an Iceberg catalog/namespace."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def table(self, name: str) -> Table:
        return Table(self.root, name)

    def drop(self, name: str) -> None:
        shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
