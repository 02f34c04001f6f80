"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the flagship: derive the token table from sf0.001
documents, encode it into the stripe table, decode it back, and report
round-trip equality + compression metrics in one row.

``queries()`` exposes the engine's operators (encode/decode/verify/
stats/profile) plus the training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) as
(spark, sf_dir) -> DataFrame callables; ``oracle_sql()`` carries the
DuckDB-equivalent ANSI SQL for every SQL-expressible one.  Column names
and types are aligned on both sides (aggregates aliased identically).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from orc_spark.functions import dedup, similarity, text
from orc_spark.functions import multimodal
from orc_spark.operators import encode as enc_ops
from orc_spark.operators import verify
from orc_spark.sources import tokens as token_src


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Round-trip the sf0.001 token table through encode->decode and
    report equality + bytes/token in one row."""
    sf_dir = "/root/testdata/sf0.001"
    tok = token_src.token_table(spark, sf_dir)
    rt = verify.roundtrip_check(tok)
    enc = enc_ops.encode(tok.repartition(4))
    foot = enc_ops.footer(enc)
    return rt.crossJoin(foot)


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------


def _q_rt_roundtrip(spark, sf_dir):
    tok = token_src.token_table(spark, sf_dir)
    return verify.roundtrip_check(tok).select(
        "n_rows", "n_match", "n_token_match")


def _q_rt_roundtrip_fsst(spark, sf_dir):
    tok = token_src.token_table(spark, sf_dir)
    return verify.roundtrip_check(tok, use_fsst=True).select(
        "n_rows", "n_match", "n_token_match")


def _q_enc_token_profile(spark, sf_dir):
    tok = token_src.token_table(spark, sf_dir)
    return tok.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.min("n_tok").cast("long").alias("min_ntok"),
        F.max("n_tok").cast("long").alias("max_ntok"),
        F.countDistinct("source").alias("n_sources"),
    )


def _q_enc_column_stats(spark, sf_dir):
    """Footer-style stats rollup computed ONLY from encoded stripe
    metadata (stats JSON), never from re-decoded data — then checked
    against the raw documents by the oracle."""
    tok = token_src.token_table(spark, sf_dir)
    enc = enc_ops.encode(tok.repartition(4))
    st = enc.select(
        F.get_json_object("stats", "$.n_tok.min").cast("long").alias("mn"),
        F.get_json_object("stats", "$.n_tok.max").cast("long").alias("mx"),
        F.get_json_object("stats", "$.n_tok.sum").cast("long").alias("sm"),
        F.get_json_object("stats", "$.n_tok.count").cast("long").alias("ct"),
    )
    return st.agg(
        F.min("mn").alias("min_ntok"),
        F.max("mx").alias("max_ntok"),
        F.sum("sm").alias("sum_ntok"),
        F.sum("ct").alias("n_docs"),
    )


def _q_rt_projection(spark, sf_dir):
    """Decode ONLY the n_tok column from the encoded table (stream
    projection) and aggregate it."""
    tok = token_src.token_table(spark, sf_dir)
    enc = enc_ops.encode(tok.repartition(4))
    dec = enc_ops.decode(enc, columns=["n_tok"])
    return dec.agg(F.sum("n_tok").alias("sum_ntok"),
                   F.count("*").alias("n_docs"))


def _q_rt_pruned_decode(spark, sf_dir):
    """Stats-based stripe pruning + selective decode: only stripes
    whose n_tok range can match survive to decompression."""
    tok = token_src.token_table(spark, sf_dir)
    enc = enc_ops.encode(
        tok.coalesce(2).sortWithinPartitions("n_tok"), stripe_rows=100)
    pruned = enc_ops.prune_stripes(enc, "n_tok", lo=60)
    dec = enc_ops.decode(pruned).where(F.col("n_tok") >= 60)
    return dec.agg(F.count("*").alias("n_docs"),
                   F.sum("n_tok").cast("long").alias("sum_ntok"))


def _q_enc_footer(spark, sf_dir):
    tok = token_src.token_table(spark, sf_dir)
    return enc_ops.footer(enc_ops.encode(tok.repartition(4))).select(
        "n_rows", "n_tokens")


def _q_enc_codec_histogram(spark, sf_dir):
    tok = token_src.token_table(spark, sf_dir)
    enc = enc_ops.encode(tok.repartition(4))
    cols = ["doc_id", "tokens", "n_tok", "source"]
    pairs = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.get_json_object("encodings", f"$.{c}").alias("encoding"))
        for c in cols])
    return (enc.select(F.explode(pairs).alias("p"))
            .select("p.column", "p.encoding")
            .groupBy("column", "encoding")
            .agg(F.count("*").alias("n_stripes")))


def _q_text_token_counts(spark, sf_dir):
    return text.token_counts(_docs(spark, sf_dir))


def _q_text_quality(spark, sf_dir):
    return text.quality_scores(_docs(spark, sf_dir))


def _q_text_langid(spark, sf_dir):
    return text.lang_id(_docs(spark, sf_dir))


def _q_text_fingerprints(spark, sf_dir):
    return text.fingerprints(_docs(spark, sf_dir))


def _q_dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_docs(spark, sf_dir))


def _q_dedup_minhash(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    # seed deterministic near-dups so the operator has work to do
    dups = docs.limit(20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
        "lang", "source", "n_chars")
    return dedup.minhash_lsh_pairs(docs.unionByName(dups),
                                   min_jaccard=0.4).select(
        "doc_a", "doc_b", "jaccard")


def _q_dedup_simhash(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    dups = docs.limit(20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
        "lang", "source", "n_chars")
    return dedup.simhash_near_pairs(docs.unionByName(dups)) \
        .where(F.col("hamming") <= 6)


def _q_sim_cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    query = emb.where(F.col("vec_id") == 0) \
        .select("embedding").first()["embedding"]
    return similarity.cosine_topk(
        emb.where(F.col("vec_id") != 0), list(query), k=10)


def _q_sim_ann_lsh(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    query = emb.where(F.col("vec_id") == 0) \
        .select("embedding").first()["embedding"]
    return similarity.lsh_ann_topk(
        emb.where(F.col("vec_id") != 0), list(query), k=10)


def _q_sim_knn_join(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    probes = emb.where(F.col("vec_id") < 5)
    return similarity.knn_join(emb, probes, k=3)


def _q_orc_file_roundtrip(spark, sf_dir):
    """Distributed ORC sink round-trip: every partition streams its
    rows through our kernels into a real .orc file (executor-side,
    stripe-at-a-time — no driver collect), then Spark's JVM ORC reader
    reads the directory back and aggregates — cross-implementation
    round-trip, checked against the raw documents by the oracle."""
    import tempfile
    from orc_spark.sources import orcwriter
    tok = token_src.token_table(spark, sf_dir)
    out = tempfile.mkdtemp(prefix="orcq_")
    orcwriter.dataframe_to_orc_dir(tok.repartition(4), out, codec="zlib")
    df = spark.read.orc(out)
    return df.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("tokens")).cast("long").alias("total_tokens"),
        F.countDistinct("doc_id").alias("n_ids"))


def _q_stream_encode(spark, sf_dir):
    """Structured Streaming ingestion: stream the token table through
    the stripe-encode foreachBatch pipeline (availableNow trigger),
    then aggregate the decoded output — exactly-once via the streaming
    checkpoint."""
    import os
    import tempfile
    from orc_spark.streaming import encode_stream
    tok = token_src.token_table(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="orcstream_")
    inp = os.path.join(base, "in")
    out = os.path.join(base, "out")
    tok.repartition(3).write.parquet(inp)
    q = encode_stream.encode_stream(spark, inp, out,
                                    max_files_per_trigger=2)
    q.awaitTermination(300)
    enc = spark.read.parquet(os.path.join(out, "stripes"))
    dec = enc_ops.decode(enc)
    return dec.agg(F.count("*").alias("n_docs"),
                   F.sum("n_tok").cast("long").alias("sum_ntok"),
                   F.countDistinct("doc_id").alias("n_ids"))


def _q_mm_features(spark, sf_dir):
    media = multimodal.synthesize_media(spark, _docs(spark, sf_dir))
    feats = multimodal.extract_features(media)
    return feats.select(
        "media_id", F.size("features").cast("long").alias("dim"),
        F.round(F.aggregate(F.transform("features",
                                        lambda x: x.cast("double")),
                            F.lit(0.0), lambda a, x: a + x), 3)
        .alias("feat_sum"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rt_roundtrip": _q_rt_roundtrip,
        "rt_roundtrip_fsst": _q_rt_roundtrip_fsst,
        "rt_projection": _q_rt_projection,
        "rt_pruned_decode": _q_rt_pruned_decode,
        "enc_token_profile": _q_enc_token_profile,
        "enc_column_stats": _q_enc_column_stats,
        "enc_footer": _q_enc_footer,
        "enc_codec_histogram": _q_enc_codec_histogram,
        "text_token_counts": _q_text_token_counts,
        "text_quality": _q_text_quality,
        "text_langid": _q_text_langid,
        "text_fingerprints": _q_text_fingerprints,
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "orc_file_roundtrip": _q_orc_file_roundtrip,
        "stream_encode": _q_stream_encode,
        "sim_cosine_topk": _q_sim_cosine_topk,
        "sim_ann_lsh": _q_sim_ann_lsh,
        "sim_knn_join": _q_sim_knn_join,
        "mm_features": _q_mm_features,
    }


_WS_TOKENS = "length(regexp_split_to_array(trim(text), '\\s+'))"
_STOP_LIST = "['the','a','of','and','to','in','is','it']"


def oracle_sql() -> dict[str, str]:
    n_tok = _WS_TOKENS
    quality = f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST({n_tok} AS BIGINT) AS n_words,
               round(length(regexp_replace(text, '\\s+', '', 'g'))
                     / {n_tok}, 4) AS mean_word_len,
               round(len(list_filter(regexp_split_to_array(trim(text),
                     '\\s+'), w -> list_contains({_STOP_LIST}, w)))
                     / {n_tok}, 4) AS stopword_ratio,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                    AS BIGINT) AS n_digits,
               CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                    AS BIGINT) AS n_punct
        FROM documents"""
    marker_score = {
        lang: (f"len(list_filter(regexp_split_to_array(trim(text), '\\s+'),"
               f" w -> list_contains({markers!r}, w)))")
        for lang, markers in text.LANG_MARKERS.items()
    }
    greatest = "greatest(" + ", ".join(marker_score.values()) + ")"
    pred_cases = " ".join(
        f"WHEN s_{lang} = best THEN '{lang}'"
        for lang in sorted(text.LANG_MARKERS))
    langid = f"""
        WITH scored AS (
          SELECT doc_id, lang, {greatest} AS best,
                 {', '.join(f'{expr} AS s_{lang}'
                            for lang, expr in marker_score.items())}
          FROM documents)
        SELECT doc_id, lang,
               CASE WHEN best > 0 THEN (CASE {pred_cases} END)
                    ELSE 'und' END AS pred_lang
        FROM scored"""
    return {
        "rt_roundtrip": (
            "SELECT count(*) AS n_rows, count(*) AS n_match, "
            "count(*) AS n_token_match FROM documents"),
        "rt_roundtrip_fsst": (
            "SELECT count(*) AS n_rows, count(*) AS n_match, "
            "count(*) AS n_token_match FROM documents"),
        "rt_projection": (
            f"SELECT CAST(sum({n_tok}) AS BIGINT) AS sum_ntok, "
            f"count(*) AS n_docs FROM documents"),
        "rt_pruned_decode": (
            f"SELECT count(*) AS n_docs, "
            f"CAST(sum({n_tok}) AS BIGINT) AS sum_ntok FROM documents "
            f"WHERE {n_tok} >= 60"),
        "enc_token_profile": (
            f"SELECT count(*) AS n_docs, "
            f"CAST(sum({n_tok}) AS BIGINT) AS total_tokens, "
            f"CAST(min({n_tok}) AS BIGINT) AS min_ntok, "
            f"CAST(max({n_tok}) AS BIGINT) AS max_ntok, "
            f"count(DISTINCT source) AS n_sources FROM documents"),
        "enc_column_stats": (
            f"SELECT CAST(min({n_tok}) AS BIGINT) AS min_ntok, "
            f"CAST(max({n_tok}) AS BIGINT) AS max_ntok, "
            f"CAST(sum({n_tok}) AS BIGINT) AS sum_ntok, "
            f"count(*) AS n_docs FROM documents"),
        "text_token_counts": (
            f"SELECT doc_id, CAST({n_tok} AS BIGINT) AS n_ws_tokens, "
            f"CAST(length(text) AS BIGINT) AS n_chars FROM documents"),
        "text_quality": quality,
        "text_langid": langid,
        "text_fingerprints": (
            "SELECT doc_id, md5(text) AS fp, "
            "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) "
            "AS fp_norm FROM documents"),
        "orc_file_roundtrip": (
            f"SELECT count(*) AS n_docs, "
            f"CAST(sum({n_tok}) AS BIGINT) AS total_tokens, "
            f"count(DISTINCT doc_id) AS n_ids FROM documents"),
        "stream_encode": (
            f"SELECT count(*) AS n_docs, "
            f"CAST(sum({n_tok}) AS BIGINT) AS sum_ntok, "
            f"count(DISTINCT doc_id) AS n_ids FROM documents"),
        "dedup_exact": (
            "SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
            " AS fp, count(*) AS dup_count, min(doc_id) AS keep_doc_id "
            "FROM documents GROUP BY 1"),
        "sim_cosine_topk": ("""
            SELECT e.vec_id,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                        WHERE vec_id = 0)), 6) AS cosine
            FROM embeddings e WHERE e.vec_id <> 0
            ORDER BY cosine DESC, vec_id ASC LIMIT 10"""),
        # enc_footer / enc_codec_histogram / dedup_minhash / dedup_simhash /
        # sim_ann_lsh / sim_knn_join / mm_features are engine-/hash-specific
        # (xxhash64, LSH planes, stripe layout) => rows-only checks.
    }
