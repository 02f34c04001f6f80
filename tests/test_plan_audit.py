"""Plan-quality assertions, programmatic: the BENCH.md `.explain`
claims as executable checks (orc_spark.plans)."""

import pytest

from pyspark.sql import functions as F

from orc_spark import plans
from orc_spark.functions import dedup, text
from orc_spark.operators import encode as enc_ops
from orc_spark.sources import tokens as token_src

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df.cache().count()
    return df


def _run(df):
    df.write.format("noop").mode("overwrite").save()
    return df


def test_pipeline_plans_have_no_scale_killers(spark, docs):
    """No CartesianProduct / nested-loop join anywhere in the dedup +
    text pipeline plans; the r6 minhash plan computes the expensive
    32-permutation signature projection exactly ONCE (both self-join
    sides and the bucket cap share one repartition exchange — the cap
    is a count-over-window on that exchange, the only Window in the
    plan)."""
    # UNCACHED input, matching the bench/driver paths: AQE wraps each
    # reference to a cached relation in its own TableCacheQueryStage,
    # which defeats the canonical-subtree stage reuse this test pins
    # (CacheManager substitutes the cache by plan match, so a fresh
    # read of the same path is not enough — drop the cache entry)
    spark.catalog.clearCache()
    fresh = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(fresh, min_jaccard=0.4)
    # execute THIS DataFrame's QueryExecution (collect, not a write
    # command) so the AQE-final plan — with runtime ReusedExchange
    # stages — is what the audit below reads
    pairs.collect()
    docs.cache()  # restore the module fixture's cache for later tests
    plans.assert_no(pairs, "CartesianProduct", "BroadcastNestedLoopJoin")
    plan_str = plans.executed_plan(pairs)
    final = plan_str.split("Initial Plan")[0]
    # the signature kernel (vectorized minhash, r6) must run exactly
    # once in the final plan, and the second self-join side must
    # arrive as a ReusedExchange of the first
    n_mh = final.count("MapInArrow")
    assert n_mh == 1, f"minhash kernel duplicated: {n_mh}"
    assert "ReusedExchange" in final
    # the only Window nodes are the bucket-size cap sitting directly on
    # the shared exchange (re-executed per join side over the REUSED
    # shuffle output — a per-partition count, not a second shuffle)
    assert final.count("Window [") <= 2
    q = _run(text.quality_scores(docs))
    plans.assert_no(q, "Exchange", "BatchEvalPython", "ArrowEvalPython")
    counts = plans.operator_counts(q)
    assert counts["Exchange"] == 0


def test_decode_projection_read_schema(spark):
    """The projected decode's Parquet scan reads ONLY the requested
    stream binaries + stripe metadata."""
    import tempfile
    tok = token_src.token_table(spark, SF_DIR)
    path = tempfile.mkdtemp(prefix="planaudit_") + "/enc"
    enc_ops.encode(tok.repartition(2)).write.parquet(path)
    enc = spark.read.parquet(path)
    dec = _run(enc_ops.decode(enc, columns=["n_tok"]))
    schemas = plans.read_schemas(dec)
    assert schemas, "no scan found"
    joined = " ".join(schemas)
    assert "n_tok__DATA" in joined
    assert "tokens__DATA" not in joined
    assert "doc_id__DATA" not in joined


def test_zone_filter_pushdown_visible(spark):
    """prune_stripes on a zone column shows up as PushedFilters."""
    import tempfile
    tok = token_src.token_table(spark, SF_DIR)
    path = tempfile.mkdtemp(prefix="planaudit2_") + "/enc"
    enc_ops.encode(tok.coalesce(1).sortWithinPartitions("n_tok"),
                   stripe_rows=100).write.parquet(path)
    enc = spark.read.parquet(path)
    pruned = _run(enc_ops.prune_stripes(enc, "n_tok", lo=60))
    pf = " ".join(plans.pushed_filters(pruned))
    assert "n_tok__MAX" in pf, pf


def test_decontaminate_plan_shape(spark, docs):
    """r4: the corpus side of decontamination must never shuffle its
    exploded n-grams through a SortMergeJoin — the eval set joins as
    a BROADCAST; no cartesian anywhere."""
    ev = docs.where(F.col("doc_id") % 50 == 0)
    out = _run(text.decontaminate(docs, ev, n=13))
    plans.assert_no(out, "CartesianProduct", "BroadcastNestedLoopJoin",
                    "SortMergeJoin")
    p = plans.executed_plan(out)
    assert "BroadcastHashJoin" in p, p[:2000]


def test_ngram_overlap_plan_shape(spark, docs):
    """r4: exact shared-passage pairs — hash equi-join on gram hashes
    with the hot-gram cap as a broadcast anti-join; no cartesian, no
    sort-merge, no window."""
    out = _run(dedup.ngram_overlap_pairs(docs, n=8, min_shared=2,
                                         max_bucket=64))
    plans.assert_no(out, "CartesianProduct", "BroadcastNestedLoopJoin",
                    "SortMergeJoin", "Window")


def test_repetition_stats_plan_is_map_only(spark, docs):
    out = _run(text.repetition_stats(docs))
    plans.assert_no(out, "Exchange", "BatchEvalPython",
                    "ArrowEvalPython")
