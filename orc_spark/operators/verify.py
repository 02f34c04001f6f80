"""Round-trip verification: decode(encode(df)) == df, token-for-token.

The per-row invariant from BASELINE.json input_hint: token-array
equality (bit-identical decode).  Realized as a join on doc_id + a
JVM-side array comparison — no Python in the compare path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..stripe import DEFAULT_CODEC as stripe_DEFAULT_CODEC,  TOKEN_SCHEMA
from . import encode as enc_ops


def roundtrip_check(df: DataFrame, specs=TOKEN_SCHEMA,
                    codec: str = stripe_DEFAULT_CODEC, use_fsst: bool = False,
                    key: str = "doc_id",
                    sample_rate: float | None = None) -> DataFrame:
    """Returns a one-row DataFrame (n_rows, n_match, n_token_match).

    The full-outer join on ``key`` is exhaustive — right for tests,
    wrong for 100 TB.  ``sample_rate`` is the production audit shape:
    the FULL table is still encoded (that is the artifact being
    audited), but both comparison sides are filtered by the same
    DETERMINISTIC md5-threshold key predicate (functions/sampling.py),
    so the expensive full-outer shuffle shrinks by the sample factor
    and repeated audits check the identical row set."""
    encoded = enc_ops.encode(df, specs, codec=codec, use_fsst=use_fsst)
    decoded = enc_ops.decode(encoded, specs, codec=codec)
    if sample_rate is not None:
        from ..functions import sampling
        pred = sampling.sample_predicate(sample_rate, key)
        df = df.where(pred)
        decoded = decoded.where(pred)
    names = [s.name for s in specs]
    left = df.select([F.col(n).alias(f"l_{n}") for n in names])
    right = decoded.select([F.col(n).alias(f"r_{n}") for n in names])
    joined = left.join(
        right, left[f"l_{key}"] == right[f"r_{key}"], "full_outer")
    match_all = None
    for n in names:
        eq = (F.col(f"l_{n}") == F.col(f"r_{n}")) | (
            F.col(f"l_{n}").isNull() & F.col(f"r_{n}").isNull())
        match_all = eq if match_all is None else (match_all & eq)
    # token-array equality when the schema HAS a tokens column; for
    # custom specs without one, the all-columns match stands in (the
    # hardcoded l_tokens reference crashed any non-token schema)
    if "tokens" in names:
        tok_eq = (F.col("l_tokens") == F.col("r_tokens")) | \
            (F.col("l_tokens").isNull() & F.col("r_tokens").isNull())
    else:
        tok_eq = match_all
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(match_all, 1).otherwise(0)).alias("n_match"),
        F.sum(F.when(tok_eq, 1).otherwise(0)).alias("n_token_match"),
    )
