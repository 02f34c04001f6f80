"""Deterministic sampling operators for training-data mixing.

A pretraining pipeline rarely uses a corpus as-is: sources are
re-weighted (e.g. books over-sampled, crawl down-sampled).  These
operators realize that as DETERMINISTIC, engine-portable hash
sampling: a document's fate depends only on its id — re-running the
pipeline, resuming after failure, or re-executing a lost partition
selects exactly the same rows (Spark's ``df.sample`` is seed-stable
only per partitioning, which a shuffle or resume silently changes).

Portability: the sampling hash is ``md5(key)`` compared
lexicographically against a hex threshold — Spark and any SQL engine
(the DuckDB oracles) compute the identical md5 hex string, so the
sample is reproducible OUTSIDE Spark too.  At 100 TB everything here
is a map-only filter: no shuffle, parallelism = input splits,
predicate sits directly on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def rate_to_threshold(rate: float, digits: int = 8) -> str:
    """Hex-string threshold t such that P[md5(x) < t] == rate (up to
    16^-digits resolution): uniform hex digits compare uniformly."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate {rate} outside [0, 1]")
    scaled = min(int(rate * (16 ** digits)), 16 ** digits - 1)
    return format(scaled, f"0{digits}x")


def _rate_cond(h, rate: float):
    """Keep-condition for one rate over an md5-hex Column ``h``.
    rate >= 1.0 short-circuits to TRUE (the clamped 'ffffffff'
    threshold would silently drop rows whose md5 starts with ffffffff
    — ~2^-32 of rows, a handful at 100 TB); rate <= 0.0 to FALSE."""
    if rate >= 1.0:
        return F.lit(True)
    if rate <= 0.0:
        return F.lit(False)
    return h < rate_to_threshold(rate)


def rate_sql_cond(h_sql: str, rate: float) -> str:
    """SQL twin of _rate_cond for the DuckDB oracles — MUST stay
    condition-equivalent or the oracle checks a different sample."""
    if rate >= 1.0:
        return "TRUE"
    if rate <= 0.0:
        return "FALSE"
    return f"{h_sql} < '{rate_to_threshold(rate)}'"


def sample_predicate(rate: float, key_col: str = "doc_id"):
    """The deterministic keep-predicate itself (Column) — THE single
    definition of the sampling hash, shared by hash_sample,
    stratified_sample's default path, and verify.roundtrip_check's
    audit sampling (a drifted copy would silently audit a different
    row set than the sample selects)."""
    return _rate_cond(F.md5(F.col(key_col).cast("string")), rate)


def hash_sample(df: DataFrame, rate: float,
                key_col: str = "doc_id") -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by md5(key)."""
    return df.where(sample_predicate(rate, key_col))


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      stratum_col: str = "source",
                      key_col: str = "doc_id",
                      default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling — the training-data MIXING
    operator: ``rates`` maps stratum value -> keep fraction; strata
    not listed keep ``default_rate``.  One map-side CASE WHEN over the
    md5 hash; no shuffle, no state."""
    h = F.md5(F.col(key_col).cast("string"))
    expr = None
    for stratum, rate in rates.items():
        cond = (F.col(stratum_col) == stratum) & _rate_cond(h, rate)
        expr = cond if expr is None else expr | cond
    # NULL strata take the default rate: a bare ~isin() evaluates to
    # NULL for them (three-valued logic) and would silently drop every
    # NULL-stratum row regardless of default_rate
    others = (F.col(stratum_col).isNull() |
              ~F.col(stratum_col).isin(list(rates))) & \
        _rate_cond(h, default_rate)
    expr = others if expr is None else expr | others
    return df.where(expr)
