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
    ratio, digit/punct density (all SQL-expressible)."""
    words = F.split(F.trim("text"), r"\s+")
    n_words = F.size(words)
    stop_hits = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(F.length(F.regexp_replace("text", r"\s+", "")) /
                n_words, 4).alias("mean_word_len"),
        F.round(stop_hits / n_words, 4).alias("stopword_ratio"),
        F.length(F.regexp_replace("text", r"[^0-9]", "")).cast("long")
        .alias("n_digits"),
        F.length(F.regexp_replace("text", r"[^.!?,;:]", "")).cast("long")
        .alias("n_punct"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language ID: the language whose markers hit the
    most words wins; ties broken by language code order (deterministic).
    """
    words = F.split(F.trim("text"), r"\s+")
    scores = [
        F.size(F.filter(words, lambda w: w.isin(markers))).alias(f"s_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = docs.select("doc_id", "lang", *scores)
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
