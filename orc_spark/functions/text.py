"""Text-analysis operators for training-data pipelines.

All hot paths are JVM-side built-ins (split/regexp/md5/size) so Catalyst
can pipeline them inside whole-stage codegen; every operator here has an
exactly-matching ANSI-SQL formulation used as the DuckDB oracle in
``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

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


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality features: length, mean word length, stopword
    ratio, digit/punct density (all SQL-expressible).

    r6 perf (guide §1.2 per-task work): the word array is computed ONCE
    in a child projection — higher-order functions are interpreted (no
    codegen), so a split embedded in every consuming expression used to
    re-run the regex split per expression per row; char-class counts
    (digits/punct/whitespace) run as regexp_count (pattern cached,
    counts matches without building a replacement string) instead of
    length(regexp_replace(...)) — count-identical by construction,
    measured ~3x cheaper per column.  Output values are bit-identical
    to the r5 formulation (same oracle); parity pinned across all SFs
    plus adversarial whitespace/NULL rows (OPTIMIZATION_r06.md)."""
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


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language ID: the language whose markers hit the
    most words wins; ties broken by language code order (deterministic).

    r6 perf: the word array is split ONCE in a child projection instead
    of being re-evaluated inside each language's (interpreted) filter
    expression — values unchanged (parity pinned, see quality_scores).
    """
    d = docs.select(
        "doc_id", "lang", F.split(F.trim("text"), r"\s+").alias("_words"))
    words = F.col("_words")
    scores = [
        F.size(F.filter(words, lambda w: w.isin(markers))).alias(f"s_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = d.select("doc_id", "lang", *scores)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_MARKERS])
    pred = None
    for lang in sorted(LANG_MARKERS):
        cond = F.col(f"s_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return scored.select(
        "doc_id", "lang",
        F.when(best > 0, pred).otherwise(F.lit("und")).alias("pred_lang"))


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
