"""Deterministic fingerprint rotation + gaussian politeness jitter.

F6 ``gaussian`` (lib/misc/stats.ts:29-54): Box-Muller normal sample with
the result folded to its absolute value (stats.ts:50-53 returns ``-retval``
for negative draws). The reference uses the Marsaglia polar form, whose
accept/reject loop is not expressible as a pure column; the trigonometric
Box-Muller form below produces exactly the same N(mean, stddev) law from
two uniforms, and the fold is reproduced.

F9 ``getRandomUserAgent`` / ``getRandomAcceptLanguageHeader`` /
``getRandomScreenSize`` (crawler/src/helpers.ts:28-59): the reference
draws uniformly at random per worker; per SURVEY §2.7 F9 our engine is
deterministic — every draw becomes a hash-pick keyed on a row column, so
replays and tests agree. The locale pool (helpers.ts:43-44), the header
format (helpers.ts:51), and the screen-size pool (crawler/src/config.ts:
32-33, sourced by the reference from gs.statcounter.com) are kept
verbatim; the UA pool stands in for the ``user-agents`` npm package's
desktop category with a fixed set of public desktop UA strings.

Everything here is JVM-side column arithmetic (xxhash64 + element_at over
literal arrays) — zero Python in the hot path, broadcast-free, shuffle-free.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "hash_uniform",
    "gaussian",
    "gaussian_delay_ms",
    "user_agent",
    "user_agent_at",
    "accept_language_header",
    "accept_language_header_at",
    "screen_size",
    "screen_size_at",
]

#: helpers.ts:43-44 — verbatim locale pool for the Accept-Language header.
ACCEPT_LOCALES = [
    "en-DE", "fr-CA", "fr-FR", "de-DE", "en-GB", "pt-BR", "es-MX", "zh-CN",
    "zh-TW", "es-ES", "es-CO", "es-US", "de-CH", "de-AT", "nl-NL", "nl-BE",
    "se-SE",
]

#: crawler/src/config.ts:32-33 — verbatim desktop screen-size pool.
SCREEN_SIZES = [
    (1920, 1080), (1366, 768), (1440, 900), (1536, 864), (1600, 900),
    (1280, 800), (1280, 720), (1280, 1024), (1024, 768), (1680, 1050),
    (2560, 1440), (1920, 1200), (1360, 768), (1600, 1024), (1400, 1050),
    (1280, 1024), (1440, 900), (1400, 900), (1280, 960),
]

#: Stand-in for the `user-agents` package's desktop category
#: (helpers.ts:28-30): fixed public desktop UA strings.
USER_AGENTS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
    " (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36"
    " (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36"
    " (KHTML, like Gecko) Chrome/121.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:122.0)"
    " Gecko/20100101 Firefox/122.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15"
    " (KHTML, like Gecko) Version/17.2 Safari/605.1.15",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
    " (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.0.0",
]


def hash_uniform(key: Column, salt: int = 0) -> Column:
    """Deterministic uniform in the OPEN interval (0, 1) keyed on a column.

    xxhash64 folded into [1, 2^31-1] then scaled — never exactly 0 or 1,
    so log/Box-Muller below are always finite.
    """
    m = (1 << 31) - 1
    return (F.pmod(F.xxhash64(key, F.lit(salt)), F.lit(m)) + 1) / float(m + 1)


def gaussian(u1: Column, u2: Column, mean: float = 0.0, stddev: float = 1.0) -> Column:
    """F6 (stats.ts:29-54): folded normal |N(mean, stddev)| from two uniforms."""
    y1 = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)
    return F.abs(F.lit(mean) + F.lit(stddev) * y1)


def gaussian_delay_ms(key: Column, mean_ms: float, stddev_ms: float) -> Column:
    """random_normal_sleep's draw (worker.ts:292-304) made deterministic:
    a per-key folded-normal delay in milliseconds. The epoch scheduler
    models politeness as a token budget (F7/F13); this column is the
    per-item jitter a wall-clock deployment would layer on top."""
    return gaussian(
        hash_uniform(key, salt=0x6A17), hash_uniform(key, salt=0x51EE), mean_ms, stddev_ms
    )


def _hash_pick(key: Column, n: int, salt: int) -> Column:
    return (F.pmod(F.xxhash64(key, F.lit(salt)), F.lit(n)) + 1).cast("int")


def user_agent_at(idx: Column) -> Column:
    """UA pool lookup at a 1-based index column."""
    pool = F.array(*[F.lit(u) for u in USER_AGENTS])
    return F.element_at(pool, idx.cast("int"))


def user_agent(key: Column) -> Column:
    """F9 getRandomUserAgent (helpers.ts:28-30), hash-keyed."""
    return user_agent_at(_hash_pick(key, len(USER_AGENTS), 0xA6E7))


def accept_language_header_at(idx: Column) -> Column:
    """Accept-Language render at a 1-based locale index: the exact
    `${locale},${lang};q=0.9,en;q=0.8,en-US;q=0.7` format (helpers.ts:51)."""
    pool = F.array(*[F.lit(loc) for loc in ACCEPT_LOCALES])
    locale = F.element_at(pool, idx.cast("int"))
    lang = F.split(locale, "-").getItem(0)
    return F.concat(
        locale, F.lit(","), lang, F.lit(";q=0.9,en;q=0.8,en-US;q=0.7")
    )


def accept_language_header(key: Column) -> Column:
    """F9 getRandomAcceptLanguageHeader (helpers.ts:36-52), hash-keyed."""
    return accept_language_header_at(
        _hash_pick(key, len(ACCEPT_LOCALES), 0x1A2B)
    )


def screen_size_at(idx: Column) -> Column:
    """Screen-size pool lookup at a 1-based index column."""
    pool = F.array(
        *[
            F.struct(F.lit(w).alias("width"), F.lit(h).alias("height"))
            for w, h in SCREEN_SIZES
        ]
    )
    return F.element_at(pool, idx.cast("int"))


def screen_size(key: Column) -> Column:
    """F9 getRandomScreenSize (helpers.ts:54-59), hash-keyed: a
    struct(width, height) from the verbatim statcounter pool."""
    return screen_size_at(_hash_pick(key, len(SCREEN_SIZES), 0x5C4E))
