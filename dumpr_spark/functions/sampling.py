"""Deterministic hash-based sampling for corpus curation.

`df.sample()` / `sampleBy()` are seed-dependent and engine-specific — fine
for stats, useless for a reproducible data pipeline (re-running must select
the SAME rows, and an oracle must be able to recompute the selection).
The curation-grade form: hash a stable key to a uniform bucket in [0, 1000)
and keep rows under a per-stratum rate. Properties that matter at 100 TB:

- **narrow**: pure projection + filter, no shuffle, pushes through scans;
- **stable**: adding/removing other rows never changes a row's fate
  (unlike reservoir sampling), so incremental reruns are consistent;
- **stratified**: the rate is a function of any columns (language, source,
  quality score band), giving per-stratum up/down-weighting in one pass.

md5 (not murmur) so any engine recomputes the same buckets (DuckDB:
``('0x' || substr(md5(key), 1, 14))::BIGINT % 1000``).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(key: Column | str, buckets: int = 1000) -> Column:
    """Stable uniform bucket in [0, buckets): 56-bit md5 prefix of the key's
    string form, mod `buckets`. Engine-portable (md5 is md5 everywhere)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 14), 16, 10).cast("long")
    return (h % buckets).cast("int")


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates_per_mille: Mapping[str, int],
    default_per_mille: int = 0,
) -> DataFrame:
    """Keep each row iff hash_bucket(key) < rate(stratum), rates in ‰.

    One broadcast-free narrow filter; the rate map is plan-time constant
    (it parametrizes the expression, it is not data)."""
    rate = F.lit(default_per_mille)
    for stratum, r in sorted(rates_per_mille.items()):
        if not 0 <= r <= 1000:
            raise ValueError(f"rate for {stratum!r} must be 0..1000‰, got {r}")
        rate = F.when(F.col(stratum_col) == stratum, F.lit(r)).otherwise(rate)
    return df.where(hash_bucket(key_col) < rate)
