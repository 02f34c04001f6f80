"""Text-analysis operators for training-data pipelines.

Every operator here has an exactly-matching ANSI-SQL formulation used
as the DuckDB oracle in ``__spark_entry__.oracle_sql``.  Most paths
are JVM-side built-ins (split/regexp/md5/size); the two hottest
(quality_scores, lang_id — the bench's text_analysis pair) run their
per-document counting as an Arrow/numpy mapInArrow kernel (r6, guide
§4.2): pyarrow.compute split + set-membership + byte-class counting
over whole batches, with the scoring/rounding expressions staying
JVM-side so output values are bit-identical to the pure-JVM
formulations kept below as ``_quality_scores_jvm`` / ``_lang_id_jvm``
(parity pinned by tests across all SFs plus control-char/unicode
fuzz).  Semantics replicated exactly: Spark trim() strips 0x20 ONLY;
split keeps leading/trailing empty strings; Java \\s is exactly
[ \\t\\n\\x0B\\f\\r]; ASCII byte counts equal char counts in UTF-8.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F, types as T

# Java regex \s, exactly: [ \t\n\x0B\f\r] (ASCII-only by default)
_WS_CHARS = " \t\n\x0b\x0c\r"
_WS_PATTERN = "[ \t\n\x0b\x0c\r]+"

# tiny per-language stopword marker lists for the n-gram/stopword
# language-ID heuristic (deterministic, SQL-replicable)
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "los"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "les"],
    "zh": ["de", "shi", "zai"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


# GPT2-style pretokenizer, simplified to the Java/RE2-portable subset
# (no lookahead): a leading space glues to the following word, letter
# runs / digit runs / punctuation runs split apart — the "BPE-ish"
# token estimate a data pipeline budgets sequence lengths with
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count, BPE-ish pretoken count, and char count
    per document."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long")
        .alias("n_ws_tokens"),
        F.regexp_count("text", F.lit(BPE_ISH_PATTERN)).cast("long")
        .alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


def _quality_scores_jvm(docs: DataFrame) -> DataFrame:
    """Pure-JVM reference formulation of quality_scores (pre-r6 hot
    path) — kept for the kernel parity tests; value-identical to the
    production kernel below."""
    d = docs.select(
        "doc_id", "text", F.split(F.trim("text"), r"\s+").alias("_words"))
    words = F.col("_words")
    n_words = F.size(words)
    stop_hits = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    n_chars = F.length("text")
    return d.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        # length-after-removing-\s == n_chars - count of \s chars
        F.round((n_chars - F.regexp_count("text", F.lit(r"\s"))) /
                n_words, 4).alias("mean_word_len"),
        F.round(stop_hits / n_words, 4).alias("stopword_ratio"),
        F.regexp_count("text", F.lit("[0-9]")).cast("long")
        .alias("n_digits"),
        F.regexp_count("text", F.lit("[.!?,;:]")).cast("long")
        .alias("n_punct"),
    )


def _byte_class_counts(arr, classes):
    """Per-row counts of ASCII byte classes over a string Arrow array
    (exact for char counts too: in UTF-8, ASCII bytes never occur
    inside multibyte sequences).  One 256-entry table gather + one
    cumsum per class — no regex, no per-row Python."""
    import pyarrow as pa
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    bufs = a.buffers()
    n = len(a)
    if pa.types.is_large_string(a.type) or pa.types.is_large_binary(a.type):
        offsets = np.frombuffer(bufs[1], np.int64, count=n + 1,
                                offset=a.offset * 8)
    else:
        offsets = np.frombuffer(bufs[1], np.int32, count=n + 1,
                                offset=a.offset * 4).astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8, count=int(offsets[-1]))
    outs = []
    for cls in classes:
        tab = np.zeros(256, np.int64)
        for c in cls.encode():
            tab[c] = 1
        cums = np.zeros(len(data) + 1, np.int64)
        np.cumsum(tab[data], out=cums[1:])
        outs.append(cums[offsets[1:]] - cums[offsets[:-1]])
    return outs


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality features: length, mean word length, stopword
    ratio, digit/punct density.

    r6 perf (guide §4.2): the per-document counting runs as ONE
    Arrow/numpy kernel per batch (mapInArrow — C-level regex split,
    set membership and byte-class counting), replacing interpreted
    higher-order functions and JVM regex passes; the ratio/round
    expressions stay JVM-side, so every output value is bit-identical
    to ``_quality_scores_jvm`` (pinned by tests across all SFs plus
    control-char/unicode fuzz rows)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out_schema = T.StructType([
        docs.schema["doc_id"],
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("n_nonws", T.IntegerType()),
        T.StructField("stop_hits", T.IntegerType()),
        T.StructField("n_digits", T.IntegerType()),
        T.StructField("n_punct", T.IntegerType()),
    ])
    stopset = pa.array(STOPWORDS)
    count_fields = ["n_chars", "n_words", "n_nonws", "stop_hits",
                    "n_digits", "n_punct"]

    def kernel(batches):
        from orc_spark._alloc import tune_worker
        tune_worker()
        for batch in batches:
            ids = batch.column(0)
            a = batch.column(1)
            n = len(a)
            if n == 0:
                continue
            nulls = np.asarray(a.is_null()) if a.null_count else None
            av = a.fill_null("") if a.null_count else a
            n_chars = pc.utf8_length(av) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            # Spark split(trim(text), \s+): trim strips 0x20 only and
            # split KEEPS leading/trailing empty strings — Arrow's
            # split_pattern_regex + utf8_trim(' ') match both exactly
            sp = pc.split_pattern_regex(pc.utf8_trim(av, " "),
                                        _WS_PATTERN)
            nw = pc.list_value_length(sp) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flat = pc.list_flatten(sp)
            hv = pc.is_in(flat, value_set=stopset) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            offs = np.zeros(n + 1, np.int64)
            np.cumsum(nw, out=offs[1:])
            sh = np.add.reduceat(np.append(hv, 0), offs[:-1]) * (nw > 0)
            nd, npn, nws = _byte_class_counts(
                av, ["0123456789", ".!?,;:", _WS_CHARS])
            cols = (n_chars, nw, n_chars - nws, sh, nd, npn)
            yield pa.RecordBatch.from_arrays(
                [ids] + [pa.array(x.astype(np.int32), mask=nulls)
                         for x in cols],
                schema=pa.schema(
                    [pa.field("doc_id", ids.type)] +
                    [pa.field(f, pa.int32()) for f in count_fields]))

    from ._spread import spread_scan
    k = spread_scan(docs.select("doc_id", "text")) \
        .mapInArrow(kernel, out_schema)
    return k.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_words").cast("long").alias("n_words"),
        F.round(F.col("n_nonws") / F.col("n_words"), 4)
        .alias("mean_word_len"),
        F.round(F.col("stop_hits") / F.col("n_words"), 4)
        .alias("stopword_ratio"),
        F.col("n_digits").cast("long").alias("n_digits"),
        F.col("n_punct").cast("long").alias("n_punct"))


def _lang_scored_to_pred(scored: DataFrame) -> DataFrame:
    """Shared argmax projection over the s_<lang> score columns."""
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_MARKERS])
    pred = None
    for lang in sorted(LANG_MARKERS):
        cond = F.col(f"s_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return scored.select(
        "doc_id", "lang",
        F.when(best > 0, pred).otherwise(F.lit("und")).alias("pred_lang"))


def _lang_id_jvm(docs: DataFrame) -> DataFrame:
    """Pure-JVM reference formulation of lang_id (pre-r6 hot path) —
    kept for the kernel parity tests; value-identical to the
    production kernel below."""
    d = docs.select(
        "doc_id", "lang", F.split(F.trim("text"), r"\s+").alias("_words"))
    words = F.col("_words")
    scores = [
        F.size(F.filter(words, lambda w: w.isin(markers))).alias(f"s_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    return _lang_scored_to_pred(d.select("doc_id", "lang", *scores))


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language ID: the language whose markers hit the
    most words wins; ties broken by language code order (deterministic).

    r6 perf (guide §4.2): the per-language marker counting runs as ONE
    Arrow kernel per batch (C-level split + is_in per language) via
    mapInArrow; the argmax/tie-break projection stays JVM-side, so
    outputs are bit-identical to ``_lang_id_jvm`` (parity pinned, see
    quality_scores)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    langs = list(LANG_MARKERS)
    out_schema = T.StructType(
        [docs.schema["doc_id"], docs.schema["lang"]] +
        [T.StructField(f"s_{lang}", T.IntegerType()) for lang in langs])
    marker_sets = {lang: pa.array(ms) for lang, ms in LANG_MARKERS.items()}

    def kernel(batches):
        from orc_spark._alloc import tune_worker
        tune_worker()
        for batch in batches:
            ids = batch.column(0)
            lang_col = batch.column(1)
            a = batch.column(2)
            n = len(a)
            if n == 0:
                continue
            nulls = np.asarray(a.is_null()) if a.null_count else None
            av = a.fill_null("") if a.null_count else a
            sp = pc.split_pattern_regex(pc.utf8_trim(av, " "),
                                        _WS_PATTERN)
            nw = pc.list_value_length(sp) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flat = pc.list_flatten(sp)
            offs = np.zeros(n + 1, np.int64)
            np.cumsum(nw, out=offs[1:])
            arrays = [ids, lang_col]
            for lang in langs:
                hv = pc.is_in(flat, value_set=marker_sets[lang]) \
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                s = np.add.reduceat(np.append(hv, 0), offs[:-1]) * (nw > 0)
                arrays.append(pa.array(s.astype(np.int32), mask=nulls))
            yield pa.RecordBatch.from_arrays(
                arrays, schema=pa.schema(
                    [pa.field("doc_id", ids.type),
                     pa.field("lang", lang_col.type)] +
                    [pa.field(f"s_{lang}", pa.int32())
                     for lang in langs]))

    from ._spread import spread_scan
    scored = spread_scan(docs.select("doc_id", "lang", "text")) \
        .mapInArrow(kernel, out_schema)
    return _lang_scored_to_pred(scored)


def fingerprints(docs: DataFrame) -> DataFrame:
    """Content fingerprints: md5 of the raw text plus a normalized
    fingerprint (lowercase, collapsed whitespace) for near-exact dedup."""
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("fp"),
        F.md5(norm).alias("fp_norm"),
    )


def vocab_histogram(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus vocabulary stats: top-k words by frequency (whitespace
    tokenization, the same word stream the minhash/simhash operators
    consume).  One explode + map-side-combined groupBy; the top-k is a
    TakeOrdered, never a full sort."""
    w = docs.select(F.explode(
        F.split(F.trim("text"), r"\s+")).alias("word"))
    return (w.groupBy("word").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("word")).limit(k))


# PII patterns chosen to mean the same thing in Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, \b word
# boundaries — no lookarounds/backrefs (RE2 lacks them)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scrub(docs: DataFrame,
              patterns: dict[str, str] | None = None) -> DataFrame:
    """Redact PII (emails, phone numbers, IPv4s by default) from the
    text column — each match is replaced by ``<KIND>`` — and count the
    redactions per document.  Pure JVM regexp (whole-stage codegen);
    patterns are Java/RE2-compatible so the DuckDB oracle reproduces
    both the counts and the scrubbed text byte-for-byte.

    Returns (doc_id, n_<kind>... per pattern, scrubbed, scrubbed_len).
    At 100 TB this is a map-only projection — no shuffle, parallelism
    = input splits."""
    pats = patterns or PII_PATTERNS
    cols = [F.col("doc_id")]
    scrubbed = F.col("text")
    for kind, pat in pats.items():
        # count on the RUNNING text (after earlier kinds' replacements)
        # so n_<kind> equals the redactions actually performed — a
        # phone-shaped substring inside an already-redacted email must
        # not be counted as a phone redaction
        cols.append(F.regexp_count(scrubbed, F.lit(pat)).cast("long")
                    .alias(f"n_{kind}"))
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return docs.select(
        *cols, scrubbed.alias("scrubbed"),
        F.length(scrubbed).cast("long").alias("scrubbed_len"))


def _word_ngram_hashes(n: int, col: str = "text"):
    """array<long> of xxhash64'd word n-grams (same hashed-tuple trick
    as dedup._shingle_hashes: distinct word n-tuples <-> distinct
    space-joined n-gram strings, so set operations over these longs
    equal string-n-gram set operations — what the oracles compute)."""
    words = F.split(F.trim(col), r"\s+")
    hw = F.transform(words, lambda w: F.xxhash64(w))

    def _per_doc(a):
        idx = F.sequence(F.lit(0),
                         F.greatest(F.size(a) - n, F.lit(0)))
        return F.transform(
            idx, lambda i: F.xxhash64(*[F.get(a, i + j)
                                        for j in range(n)]))

    return F.when(F.col(col).isNull(),
                  F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(F.flatten(F.transform(F.array(hw), _per_doc))))


def decontaminate(docs: DataFrame, eval_docs: DataFrame,
                  n: int = 13) -> DataFrame:
    """Benchmark DECONTAMINATION (the GPT-3/Dolma recipe): flag every
    training document sharing at least one word ``n``-gram with the
    evaluation set.  Returns (doc_id, n_hits, contaminated); keep the
    clean corpus with ``docs.join(out.where("contaminated"),
    "doc_id", "left_anti")``.

    Scale shape: the eval set is SMALL by construction (benchmarks),
    so its distinct n-gram hashes broadcast; the training side is one
    map-side explode + broadcast semi-style join + groupBy(doc_id) —
    no shuffle of the corpus itself, parallelism = input splits.
    Short eval docs (< n words) contribute their full-text n-gram
    (clipped window, same as the shingle convention) so exact quotes
    of tiny references still hit."""
    ev = eval_docs.select(
        F.explode(_word_ngram_hashes(n)).alias("h")).distinct()
    tr = docs.select(
        "doc_id", F.explode_outer(_word_ngram_hashes(n)).alias("h"))
    hits = (tr.join(F.broadcast(ev), "h")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_hits")))
    return (docs.select("doc_id")
            .join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)) > 0)
                    .alias("contaminated")))


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style within-document repetition signals, all map-side
    whole-stage-codegen: duplicate-line fraction (lines repeating an
    earlier line, weighted by count), duplicate word-2-gram fraction,
    and the most-repeated word's share.  The standard quality gate
    that kills boilerplate/log spam before training."""
    lines = F.filter(F.split(F.col("text"), r"\n"),
                     lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.size(lines)
    n_uniq_lines = F.size(F.array_distinct(lines))
    words = F.split(F.trim("text"), r"\s+")
    n_words = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n_words - 2, F.lit(0))),
        lambda i: F.xxhash64(F.get(words, i), F.get(words, i + 1)))
    n_grams = F.size(grams)
    n_uniq_grams = F.size(F.array_distinct(grams))
    # most-repeated word share: max count over distinct words / total
    top = F.array_max(F.transform(
        F.array_distinct(words),
        lambda w: F.size(F.filter(words, lambda x: x == w))))
    return docs.select(
        "doc_id",
        F.round((n_lines - n_uniq_lines) /
                F.greatest(n_lines, F.lit(1)).cast("double"), 6)
        .alias("dup_line_frac"),
        F.round((n_grams - n_uniq_grams) /
                F.greatest(n_grams, F.lit(1)).cast("double"), 6)
        .alias("dup_2gram_frac"),
        F.round(top / F.greatest(n_words, F.lit(1)).cast("double"), 6)
        .alias("top_word_frac"))
