"""robots.txt allow/deny cache — a north_rule addition (the reference has no
robots support at all: zero hits for 'robots' in /root/reference).

Semantics: RFC 9309 longest-match-wins over (Allow, Disallow) prefix rules,
default allow. Rules live in a small table (host, directive, path_prefix)
and are *broadcast* as a plain dict to executors — at 10^8 hosts the rules
table would instead stay a DataFrame and the check becomes a broadcast join
on (host, matched prefix); the cache object keeps that swap behind one
function.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("directive", T.StringType(), False),  # allow | disallow
        T.StructField("path_prefix", T.StringType(), False),
    ]
)


class RobotsCache:
    def __init__(self, rules: dict[str, list[tuple[str, str]]]):
        # host -> [(directive, prefix)...], longest prefix first
        self.rules = {
            h: sorted(rs, key=lambda r: len(r[1]), reverse=True) for h, rs in rules.items()
        }

    @classmethod
    def from_df(cls, robots_df: DataFrame) -> "RobotsCache":
        rules: dict[str, list[tuple[str, str]]] = {}
        for r in robots_df.collect():  # rules table is small by design
            rules.setdefault(r["host"], []).append((r["directive"], r["path_prefix"]))
        return cls(rules)

    def allowed(self, host: str, path: str) -> bool:
        rs = self.rules.get(host)
        if not rs:
            return True
        for directive, prefix in rs:  # longest-match wins (RFC 9309)
            if path.startswith(prefix):
                return directive == "allow"
        return True

    def allowed_series(self, hosts: pd.Series, urls: pd.Series) -> pd.Series:
        paths = urls.str.replace(r"^https?://[^/]+", "", regex=True, case=False)
        paths = paths.where(paths != "", "/")
        return pd.Series(
            [self.allowed(h, p) for h, p in zip(hosts, paths)], index=hosts.index
        )


def filter_allowed(df: DataFrame, spark: SparkSession, cache: RobotsCache) -> DataFrame:
    """Drop frontier candidates denied by robots. Runs at *enqueue* time so
    denied URLs never pollute the frontier. The rules dict rides the UDF
    closure (≈ a Spark broadcast variable)."""
    if not cache.rules:
        return df

    @F.pandas_udf("boolean")
    def allowed_udf(host: pd.Series, url: pd.Series) -> pd.Series:
        return cache.allowed_series(host, url)

    return df.filter(allowed_udf(F.col("host"), F.col("url")))
