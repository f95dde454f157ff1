"""Text-analysis operators over the ``documents`` corpus.

Training-data-pipeline primitives, all as JVM-side column expressions
(split / filter / transform / regexp — whole-stage codegen, no Python UDFs):

- token counting (whitespace tokenizer + distinct tokens)
- quality scoring (token stats, stopword ratio, char-class ratios)
- language-ID heuristic (character-class + stopword-profile scores)
- document fingerprinting (bottom-k shingle sketch)
- corpus profiling (per-language aggregates, global token frequencies)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from log_agent_spark.operators.dedup import shingles
from log_agent_spark.operators.ranking import with_global_order
from log_agent_spark.sources.tables import load_table

STOPWORDS = ["the", "a", "of", "and", "to", "in"]
FINGERPRINT_K = 3


def tokens(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda t: t != "")


# ---------------------------------------------------------------------------
# Token counting: per-document token totals and distincts.
# ---------------------------------------------------------------------------
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars_computed"),
    )


ORACLE_TOKEN_STATS = """
SELECT doc_id,
       len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
       len(list_distinct(list_filter(string_split(text, ' '), t -> t <> '')))
         AS n_distinct_tokens,
       length(text) AS n_chars_computed
FROM documents
"""


# ---------------------------------------------------------------------------
# Quality scoring: the length/stopword/char-class heuristics a pretraining
# filter would run (ratios rounded to 4dp for the oracle hash).
# ---------------------------------------------------------------------------
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    alpha_chars = F.length(F.regexp_replace(F.col("text"), r"[^a-zA-Z]", ""))
    return d.select(
        "doc_id",
        # try_divide throughout: token-free / empty docs must yield NULL
        # ratios like DuckDB, not an ANSI DIVIDE_BY_ZERO crash; the
        # passes_quality conjunction then matches SQL three-valued logic
        # (false AND NULL = false) on both engines
        n_tokens.cast("long").alias("n_tokens"),
        F.round(F.try_divide(F.length("text"), n_tokens), 4).alias(
            "avg_token_len"
        ),
        F.round(F.try_divide(n_stop, n_tokens), 4).alias("stopword_ratio"),
        F.round(F.try_divide(alpha_chars, F.length("text")), 4).alias(
            "alpha_ratio"
        ),
        # coalesce FALSE: a NULL-text doc's gates are all NULL and a
        # NULL boolean surfaces as None on Spark but NaN through DuckDB's
        # pandas hop (parity sweep) — and semantically a NULL-text doc
        # does not pass quality
        F.coalesce(
            (n_tokens >= 10)
            & (F.try_divide(n_stop, n_tokens) < 0.5)
            & (F.try_divide(alpha_chars, F.length("text")) > 0.5),
            F.lit(False),
        ).alias("passes_quality"),
    )


_SQL_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"
_SQL_STOPS = "('" + "','".join(STOPWORDS) + "')"

ORACLE_QUALITY_SCORE = f"""
SELECT doc_id,
       n_tokens,
       ROUND(n_chars_len * 1.0 / n_tokens, 4) AS avg_token_len,
       ROUND(n_stop * 1.0 / n_tokens, 4)      AS stopword_ratio,
       ROUND(alpha_chars * 1.0 / n_chars_len, 4) AS alpha_ratio,
       COALESCE(n_tokens >= 10 AND n_stop * 1.0 / n_tokens < 0.5
        AND alpha_chars * 1.0 / n_chars_len > 0.5, FALSE) AS passes_quality
FROM (
  SELECT doc_id,
         len({_SQL_TOKS}) AS n_tokens,
         len(list_filter({_SQL_TOKS}, t -> t IN {_SQL_STOPS})) AS n_stop,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars,
         length(text) AS n_chars_len
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# Language-ID heuristic: stopword-profile voting. Each language has a tiny
# profile set; predicted = argmax hit-count (ties → 'und'). On this synthetic
# corpus the profiles are stand-ins; the operator shape (per-language token
# voting via array intersections) is the real deliverable.
# ---------------------------------------------------------------------------
LANG_PROFILES = {
    "en": ["the", "a", "of", "and", "fast", "slow"],
    "de": ["der", "die", "das", "und", "nicht"],
    "es": ["el", "la", "de", "que", "por"],
    "fr": ["le", "la", "les", "et", "pour"],
}


def _lang_hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def q_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID via stopword-profile hit counts; deterministic tie-break."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    hits = {lang: _lang_hits(toks, ws) for lang, ws in LANG_PROFILES.items()}
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    # deterministic priority order on ties: later wins ordering is fixed by
    # iterating in reverse so 'en' (first profile) has highest precedence.
    for lang in reversed(list(LANG_PROFILES)):
        pred = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    cols = [
        hits[lang].cast("long").alias(f"hits_{lang}") for lang in LANG_PROFILES
    ]
    return d.select("doc_id", "lang", *cols, pred.alias("predicted_lang"))


def _sql_hits(words: list[str]) -> str:
    ws = "('" + "','".join(words) + "')"
    return f"len(list_filter({_SQL_TOKS}, t -> t IN {ws}))"


_HIT_EXPRS = ",\n       ".join(
    f"{_sql_hits(ws)} AS hits_{lang}" for lang, ws in LANG_PROFILES.items()
)
_BEST = "greatest(" + ", ".join(f"hits_{l}" for l in LANG_PROFILES) + ")"
_PRED_CASE = (
    "CASE "
    + " ".join(
        f"WHEN hits_{l} = {_BEST} AND {_BEST} > 0 THEN '{l}'" for l in LANG_PROFILES
    )
    + " ELSE 'und' END"
)

ORACLE_LANGID_HEURISTIC = f"""
SELECT doc_id, lang, {", ".join(f"hits_{l}" for l in LANG_PROFILES)},
       {_PRED_CASE} AS predicted_lang
FROM (
  SELECT doc_id, lang,
       {_HIT_EXPRS}
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# Document fingerprint: bottom-k sketch — the k lexicographically smallest
# shingle hashes, concatenated and re-hashed. A compact near-dup-stable id.
# ---------------------------------------------------------------------------
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = shingles(d).select("doc_id", F.md5("shingle").alias("h"))
    w = W.partitionBy("doc_id").orderBy("h")
    bottom_k = (
        sh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= FINGERPRINT_K)
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("h")).alias("hs"))
        .select(
            "doc_id",
            # NULL-text doc: collect_list skips its NULL shingle hash and
            # concat_ws('') would md5 the EMPTY STRING where DuckDB's
            # string_agg(NULL) yields a NULL fingerprint (parity-sweep
            # round-6 finding) — emit NULL like the oracle
            F.when(
                F.size("hs") > 0, F.md5(F.concat_ws(",", F.col("hs")))
            ).alias("fingerprint"),
        )
    )
    return bottom_k


ORACLE_DOC_FINGERPRINT = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, md5(substring(text, i, 8)) AS h
  FROM (
    SELECT doc_id, text,
           unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
    FROM documents
  )
), ranked AS (
  SELECT doc_id, h, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rn
  FROM sh
)
SELECT doc_id, md5(string_agg(h, ',' ORDER BY h)) AS fingerprint
FROM ranked WHERE rn <= {FINGERPRINT_K}
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Corpus profile: per-language aggregates.
# ---------------------------------------------------------------------------
def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.sum(F.size(tokens(F.col("text")))).alias("total_tokens"),
        F.countDistinct("source").alias("n_sources"),
    )


ORACLE_LANG_PROFILE = f"""
SELECT lang, COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 2) AS avg_chars,
       CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS total_tokens,
       COUNT(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Global token frequency: top-20 tokens (deterministic tie-break on token).
# Scale: explode → two-phase agg; the shuffle carries one row per distinct
# token per partition thanks to partial aggregation.
# ---------------------------------------------------------------------------
def q_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(20)
    )


ORACLE_TOKEN_FREQUENCY = f"""
SELECT token, COUNT(*) AS freq
FROM (SELECT unnest({_SQL_TOKS}) AS token FROM documents)
GROUP BY token
ORDER BY freq DESC, token ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# BPE-ish token counting: a GPT-2-style pretokenizer regex (word runs, digit
# runs, punctuation runs, each absorbing one leading space) — the standard
# cheap proxy for "how many subword tokens will this doc cost". Pure
# regexp_extract_all; stays in codegen, no Python.
# ---------------------------------------------------------------------------
BPE_TOKEN_RE = " ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+"


def q_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bpe = F.expr(f"size(regexp_extract_all(text, '{BPE_TOKEN_RE}', 0))")
    ws = F.size(tokens(F.col("text")))
    return d.select(
        "doc_id",
        bpe.cast("long").alias("n_bpe_tokens"),
        ws.cast("long").alias("n_ws_tokens"),
        F.round(F.try_divide(bpe, ws), 4).alias("bpe_per_word"),
    )


ORACLE_TOKEN_BPE = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_bpe_tokens,
       len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_ws_tokens,
       ROUND(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) * 1.0 /
             len(list_filter(string_split(text, ' '), t -> t <> '')), 4)
         AS bpe_per_word
FROM documents
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms: tf = in-doc count, idf = ln(N / df). Two shuffles
# (term-per-doc counts, then doc frequencies joined back); the df table is
# vocabulary-sized → broadcast. Top-3 terms per doc via ranked window with
# lexicographic tie-break.
# ---------------------------------------------------------------------------
TFIDF_TOP_N = 3


def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # scalar, computed once (cheap count-star over parquet)
    toks = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4).alias(
            "tfidf"
        ),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_N)
        .select("doc_id", "term", "tfidf", F.col("rank").cast("long").alias("rank"))
    )


ORACLE_TFIDF_TOPTERMS = f"""
WITH toks AS (
  SELECT doc_id, tok AS term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
  ) WHERE tok <> ''
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, ROUND(tf * ln(n_docs * 1.0 / df), 4) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf, rank FROM (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= {TFIDF_TOP_N}
"""


# ---------------------------------------------------------------------------
# Repetition metrics (Gopher-style quality filters for LLM training data):
# distinct-word ratio and duplicate-bigram fraction, the signals that catch
# boilerplate/spam documents. ZERO-shuffle: everything is higher-order
# array expressions (split / slice / zip_with / array_distinct) evaluated
# per row inside whole-stage codegen — at 100 TB this is a pure map over
# the corpus scan, no explode, no (doc_id, word) shuffle.
# Both engines compute the ratios with the same integer operands, so the
# doubles match bit-for-bit without rounding.
# ---------------------------------------------------------------------------
def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, F.lit(1), n - 1),
        F.slice(words, F.lit(2), n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    nb = F.size(bigrams)
    return d.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        (F.size(F.array_distinct(words)).cast("double") / n).alias(
            "distinct_word_ratio"
        ),
        F.when(
            nb > 0,
            F.lit(1.0) - F.size(F.array_distinct(bigrams)).cast("double") / nb,
        )
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_fraction"),
    )


ORACLE_REPETITION_METRICS = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), b AS (
  SELECT doc_id, words, len(words) AS n_words,
         list_transform(list_zip(words[1:len(words)-1], words[2:len(words)]),
                        s -> s[1] || ' ' || s[2]) AS bigrams
  FROM w
)
SELECT doc_id, n_words,
       CAST(len(list_distinct(words)) AS DOUBLE) / n_words AS distinct_word_ratio,
       CASE WHEN len(bigrams) > 0
            THEN 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams)
            ELSE 0.0 END AS dup_bigram_fraction
FROM b
"""


# ---------------------------------------------------------------------------
# Document chunking (training-data prep): fixed-size overlapping word
# windows per document — the op that turns a corpus into training samples.
# ZERO-shuffle until the explode (a map-side generator); chunk content is
# reduced to an md5 so the result stays hashable at any corpus size.
# chunk_idx derives from the window start ((start-1)/step), so it is
# reproducible without positional UDFs on either engine.
# ---------------------------------------------------------------------------
CHUNK_WORDS = 32
CHUNK_OVERLAP = 8
_CHUNK_STEP = CHUNK_WORDS - CHUNK_OVERLAP


def q_text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    starts = F.sequence(
        F.lit(1), F.greatest(n - CHUNK_OVERLAP, F.lit(1)), F.lit(_CHUNK_STEP)
    )
    return (
        d.select("doc_id", F.explode(starts).alias("s"), words.alias("w"))
        .select(
            "doc_id",
            ((F.col("s") - 1) / _CHUNK_STEP).cast("long").alias("chunk_idx"),
            F.size(F.slice(F.col("w"), F.col("s"), CHUNK_WORDS)).cast("long").alias("n_chunk_words"),
            # guard: concat_ws over a NULL slice (NULL-text doc) is ''
            # on Spark but NULL feeds through on DuckDB (parity sweep)
            F.when(
                F.slice(F.col("w"), F.col("s"), CHUNK_WORDS).isNotNull(),
                F.md5(
                    F.concat_ws(
                        " ", F.slice(F.col("w"), F.col("s"), CHUNK_WORDS)
                    )
                ),
            ).alias("chunk_hash"),
        )
    )


ORACLE_TEXT_CHUNKING = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), s AS (
  SELECT doc_id, words,
         unnest(generate_series(1, greatest(len(words) - {CHUNK_OVERLAP}, 1),
                                {_CHUNK_STEP})) AS s
  FROM w
)
SELECT doc_id,
       (s - 1) // {_CHUNK_STEP} AS chunk_idx,
       len(words[s : s + {CHUNK_WORDS - 1}]) AS n_chunk_words,
       md5(array_to_string(words[s : s + {CHUNK_WORDS - 1}], ' ')) AS chunk_hash
FROM s
"""


# ---------------------------------------------------------------------------
# Sequence packing (training-data prep): assign documents to context-window
# "packs" by cutting the corpus at token boundaries in a deterministic
# order — the sample-packing step that turns variable-length docs into
# fixed-budget training sequences. Packing runs WITHIN language (the
# window partitions by lang), so the running sum is distributed — a single
# global window would serialize the corpus through one task at 100 TB;
# sharding the pack key is the scale form (any hash bucket works where
# cross-lang packing is wanted).
# ---------------------------------------------------------------------------
PACK_BUDGET_WORDS = 512


def q_text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " ")).cast("long")
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_words").over(w), F.lit(0))
    return (
        d.select("doc_id", "lang", n_words.alias("n_words"))
        .select(
            "doc_id",
            "lang",
            "n_words",
            F.floor(cum_before / PACK_BUDGET_WORDS).alias("pack_id"),
        )
    )


ORACLE_TEXT_PACK_SEQUENCES = f"""
WITH d AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_words FROM documents
)
SELECT doc_id, lang, CAST(n_words AS BIGINT) AS n_words,
       CAST(COALESCE(SUM(n_words) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) // {PACK_BUDGET_WORDS} AS BIGINT) AS pack_id
FROM d
"""


# ---------------------------------------------------------------------------
# PII redaction (training-data compliance): regex-scrub emails / phone
# numbers / IPs, reporting per-doc match counts. The fixture corpus is
# clean, so PII is PLANTED deterministically (same expression both
# engines) on a slice of docs — the redactor can't know that, it scans
# everything. Patterns restricted to the Java∩RE2 common dialect so Spark
# and DuckDB behave identically; DuckDB needs the 'g' flag (it replaces
# first-match-only by default, Spark replaces all).
# Scale: pure codegen'd regexp projections, no shuffle, no Python.
# ---------------------------------------------------------------------------
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\d{3}-\d{3}-\d{4}"
_PII_IP = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


def q_text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                     F.lit("@example.com")),
        )
        .when(F.col("doc_id") % 10 == 1, F.lit(" call 555-123-4567"))
        .when(F.col("doc_id") % 10 == 2, F.lit(" from 192.168.1.42 today"))
        .otherwise(F.lit("")),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(planted, F.lit(_PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(_PII_PHONE),
            F.lit("<PHONE>"),
        ),
        F.lit(_PII_IP),
        F.lit("<IP>"),
    )
    return d.select(
        "doc_id",
        F.regexp_count(planted, F.lit(_PII_EMAIL)).cast("long").alias("n_email"),
        F.regexp_count(planted, F.lit(_PII_PHONE)).cast("long").alias("n_phone"),
        F.regexp_count(planted, F.lit(_PII_IP)).cast("long").alias("n_ip"),
        F.md5(redacted).alias("redacted_hash"),
    )


ORACLE_TEXT_REDACT_PII = f"""
WITH planted AS (
  SELECT doc_id,
         text || CASE
           WHEN doc_id % 10 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
           WHEN doc_id % 10 = 1 THEN ' call 555-123-4567'
           WHEN doc_id % 10 = 2 THEN ' from 192.168.1.42 today'
           ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_email,
       len(regexp_extract_all(t, '{_PII_PHONE}')) AS n_phone,
       len(regexp_extract_all(t, '{_PII_IP}'))    AS n_ip,
       md5(regexp_replace(
             regexp_replace(
               regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
             '{_PII_IP}', '<IP>', 'g')) AS redacted_hash
FROM planted
"""


# ---------------------------------------------------------------------------
# BM25 keyword search (Okapi BM25, k1=1.2 b=0.75): the standard relevance
# ranking for keyword retrieval over a corpus. The query term set is small
# and fixed, so per-doc term frequencies are array expressions over the
# tokenized text — NO (doc_id, term) explode for the scoring pass. The only
# aggregation is one corpus-stats row (N, avgdl, per-term df), cross-joined
# back (a literal broadcast of one row). At 100 TB: one narrow scan for
# stats, one narrow scan for scoring — two passes, zero wide shuffles; the
# top-k is TakeOrderedAndProject (per-partition heap, k-row driver merge).
# Floats: dl/df/N are exact integers in both engines, the double formula is
# evaluated in the same literal order, and the result is rounded to 4dp.
# ---------------------------------------------------------------------------
BM25_QUERY_TERMS = ["spark", "hash", "window"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 50


def _eq_term(term: str):
    return lambda t: t == term


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 keyword relevance: top-k docs for a fixed query term set."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    dl = F.size(toks)
    with_tf = d.select(
        "doc_id",
        dl.alias("dl"),
        *[
            # NB: a one-arg lambda only — F.filter treats a second arg
            # (even defaulted) as the positional-index form.
            F.size(F.filter(toks, _eq_term(term))).alias(f"tf_{i}")
            for i, term in enumerate(BM25_QUERY_TERMS)
        ],
    )
    stats = with_tf.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(BM25_QUERY_TERMS))
        ],
    )

    def term_score(i: int):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
            + 1.0
        )
        denom = tf + BM25_K1 * (
            1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
        )
        return idf * tf * (BM25_K1 + 1.0) / denom

    scored = with_tf.crossJoin(F.broadcast(stats))
    total = None
    for i in range(len(BM25_QUERY_TERMS)):
        total = term_score(i) if total is None else total + term_score(i)
    return (
        scored.select("doc_id", F.round(total, 4).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOP_K)
    )


def _bm25_oracle() -> str:
    tf_cols = ",\n         ".join(
        f"len(list_filter({_SQL_TOKS}, t -> t = '{term}')) AS tf_{i}"
        for i, term in enumerate(BM25_QUERY_TERMS)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(BM25_QUERY_TERMS))
    )
    score = " + ".join(
        f"ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * (tf_{i} * 1.0) * ({BM25_K1} + 1.0)"
        f" / ((tf_{i} * 1.0) + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))"
        for i in range(len(BM25_QUERY_TERMS))
    )
    return f"""
WITH tf AS (
  SELECT doc_id,
         len({_SQL_TOKS}) AS dl,
         {tf_cols}
  FROM documents
), stats AS (
  SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl, {df_cols} FROM tf
)
SELECT doc_id, ROUND({score}, 4) AS bm25
FROM tf CROSS JOIN stats
WHERE ROUND({score}, 4) > 0
ORDER BY bm25 DESC, doc_id ASC
LIMIT {BM25_TOP_K}
"""


ORACLE_BM25_SEARCH = _bm25_oracle()


# ---------------------------------------------------------------------------
# Unigram language-model log-probability — the classic "perplexity under a
# corpus LM" quality score (low avg log-prob ⇒ unusual/garbled text). Pass 1
# builds the unigram model (term → count, one shuffle on term); pass 2 joins
# exploded doc tokens to the model and averages ln(p) per doc. The model is
# vocabulary-sized (≪ corpus; Heaps' law), so the scoring join broadcasts —
# at 100 TB the only wide shuffle left is the final per-doc groupBy. Every
# token is in-vocab by construction (model built from the same corpus), so
# no OOV smoothing term is needed.
# ---------------------------------------------------------------------------
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    # r10 (guide §1.2): the corpus token total rides on the model as an
    # unpartitioned window sum over the vocabulary-sized frame (already
    # broadcast-sized by Heaps' law) instead of a second aggregate of
    # `model` cross-joined back — the totals subtree re-derived the whole
    # corpus explode + term groupBy. Exact integer sum: value-identical.
    model = (
        toks.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .withColumn("total", F.sum("cnt").over(W.partitionBy()))
    )
    scored = toks.join(F.broadcast(model), "term").select(
        "doc_id", F.log(F.col("cnt") / F.col("total")).alias("logp")
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("logp"), 4).alias("avg_logprob"),
    )


ORACLE_UNIGRAM_LOGPROB = f"""
WITH toks AS (
  SELECT doc_id, tok AS term FROM (
    SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
  )
), model AS (
  SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
), total AS (SELECT SUM(cnt) AS total FROM model)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(AVG(ln(cnt * 1.0 / total)), 4) AS avg_logprob
FROM toks JOIN model USING (term) CROSS JOIN total
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Inverted-index construction — the posting lists behind the BM25/keyword
# search above, built as data: per term, document frequency and the first
# POSTING_CAP postings (sorted doc_ids). One (doc_id, term)-distinct
# explode then one shuffle on term; collect_set is bounded per term by the
# slice cap downstream, and at 100 TB the index is written bucketed by
# term (sources/layout.py) so lookups are single-bucket reads. Arrays are
# deterministic: sort_array over a set, capped by position.
# ---------------------------------------------------------------------------
POSTING_CAP = 20


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing shape is flattened to one row per (term, posting
    position): the harness canonicalizes with pandas ``sort_values``, which
    cannot hash the natural ``array<bigint>`` posting-list column
    (CORRECTNESS_r02 ``unhashable type: 'list'``). The list form stays
    available by re-aggregating on term."""
    d = load_table(spark, sf_dir, "documents")
    postings = d.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("term")
    )
    idx = postings.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.slice(
            F.sort_array(F.collect_set("doc_id")), 1, POSTING_CAP
        ).alias("postings"),
    )
    return idx.select("term", "df", F.posexplode("postings").alias("pos", "doc_id"))


ORACLE_INVERTED_INDEX = f"""
WITH postings AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
  )
), ranked AS (
  SELECT term, doc_id,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY term) AS df
  FROM postings
)
SELECT term, CAST(df AS BIGINT) AS df, CAST(rn - 1 AS INT) AS pos, doc_id
FROM ranked WHERE rn <= {POSTING_CAP}
"""


# ---------------------------------------------------------------------------
# Language-ID confusion matrix — the model-evaluation reshape: declared
# label vs heuristic prediction, with per-cell counts and per-true-label
# recall. Pure composition of the oracle-verified classifier above plus
# one tiny (label, prediction) aggregate; the evaluation costs one extra
# shuffle over a |labels|² result, nothing over the corpus.
# ---------------------------------------------------------------------------
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = q_langid_heuristic(spark, sf_dir).select("lang", "predicted_lang")
    counts = scored.groupBy("lang", "predicted_lang").agg(
        F.count("*").alias("n")
    )
    wrow = W.partitionBy("lang")
    return counts.select(
        "lang",
        "predicted_lang",
        "n",
        F.round(F.col("n") / F.sum("n").over(wrow), 4).alias("row_frac"),
    )


ORACLE_LANGID_CONFUSION = f"""
WITH scored AS ({ORACLE_LANGID_HEURISTIC})
, counts AS (
  SELECT lang, predicted_lang, COUNT(*) AS n
  FROM scored GROUP BY lang, predicted_lang
)
SELECT lang, predicted_lang, n,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY lang), 4) AS row_frac
FROM counts
"""


# ---------------------------------------------------------------------------
# Vocabulary growth curve (Heaps' law): distinct tokens seen as the corpus
# grows, computed WITHOUT any cumulative-distinct state — each token
# contributes exactly once, at its FIRST document (min doc_id), so the
# curve is: explode → min per token → count per doc bucket → running sum
# over the (tiny) bucket series. The same first-occurrence trick is how a
# tokenizer-budget or vocab-cap study reads a 100 TB corpus in one pass.
# ---------------------------------------------------------------------------
VOCAB_BUCKET_DOCS = 50


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    first_seen = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    per_bucket = first_seen.groupBy(
        (F.col("first_doc") - F.col("first_doc") % VOCAB_BUCKET_DOCS).alias(
            "bucket_start"
        )
    ).agg(F.count("*").alias("new_tokens"))
    # bucket count grows with the corpus (n_docs / bucket width), so the
    # running total uses the distributed range-partitioned cumsum, not a
    # single-task global window.
    return with_global_order(
        per_bucket,
        [F.asc("bucket_start")],
        rank_col="__r",
        cumsum_of=F.col("new_tokens"),
        cumsum_col="vocab_size",
    ).select("bucket_start", "new_tokens", "vocab_size")


ORACLE_VOCAB_GROWTH = f"""
WITH first_seen AS (
  SELECT token, MIN(doc_id) AS first_doc FROM (
    SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
  ) GROUP BY token
), per_bucket AS (
  SELECT first_doc - first_doc % {VOCAB_BUCKET_DOCS} AS bucket_start,
         COUNT(*) AS new_tokens
  FROM first_seen GROUP BY 1
)
SELECT bucket_start, new_tokens,
       CAST(SUM(new_tokens) OVER (ORDER BY bucket_start
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS vocab_size
FROM per_bucket
"""


# ---------------------------------------------------------------------------
# Zipf-law fit: the log-log slope of token frequency against frequency
# rank — the one-number summary of a corpus's token distribution (natural
# text ≈ -1; synthetic/templated corpora deviate, making this a cheap
# corpus-health check). One token-frequency aggregate, one rank window
# over the (vocabulary-sized) frequency table, one regr_slope/regr_r2
# aggregate — the regression runs over |vocab| rows, never the corpus.
# ---------------------------------------------------------------------------
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    freqs = (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    # Global rank over the vocabulary via range-partitioned parallel sort
    # (operators/ranking.py) — a 10⁷-10⁸-token vocab at corpus scale must
    # not funnel through one Exchange SinglePartition window task.
    ranked = with_global_order(
        freqs, [F.desc("freq"), F.asc("token")], rank_col="rank"
    )
    return ranked.agg(
        F.count("*").alias("vocab_size"),
        F.round(
            F.regr_slope(F.log("freq"), F.log("rank")), 4
        ).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("freq"), F.log("rank")), 4).alias("r2"),
    )


ORACLE_ZIPF_FIT = f"""
WITH freqs AS (
  SELECT token, COUNT(*) AS freq FROM (
    SELECT unnest({_SQL_TOKS}) AS token FROM documents
  ) GROUP BY token
), ranked AS (
  SELECT freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS rank
  FROM freqs
)
SELECT COUNT(*) AS vocab_size,
       ROUND(regr_slope(ln(freq), ln(rank)), 4) AS zipf_slope,
       ROUND(regr_r2(ln(freq), ln(rank)), 4) AS r2
FROM ranked
"""


# ---------------------------------------------------------------------------
# Bigram language-model scoring with interpolated add-one smoothing — the
# sequence-aware upgrade of q_unigram_logprob (garbled-but-common-words
# text scores fine under a unigram LM; a bigram LM catches broken word
# ORDER). Model trained on the first _LM_TRAIN_MAX docs, scores the rest:
# p(w2|w1) = λ·(c12+1)/(c1+V) + (1-λ)·(c2+1)/(N+V), λ=0.75 (dyadic, so
# the mix is float-exact). Bigrams are built map-side by zipping each
# token array against its own tail (zip_with over two slices) — no
# per-doc window/shuffle just to pair neighbors; the two model tables are
# vocabulary-sized and broadcast, so the only wide shuffle is the final
# per-doc aggregate. Same cross-engine float rules as the unigram LM
# (ln + AVG + round-4).
# ---------------------------------------------------------------------------
_LM_TRAIN_MAX = 300
_LM_LAMBDA = 0.75  # dyadic: 0.75 and 0.25 are exact doubles


def _bigrams(d: DataFrame) -> DataFrame:
    l = tokens(F.col("text"))
    n1 = F.greatest(F.size(l) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(l, 1, n1),
        F.slice(l, 2, n1),
        lambda p, c: F.struct(p.alias("prev"), c.alias("term")),
    )
    return d.select("doc_id", F.explode(pairs).alias("b")).select(
        "doc_id", "b.prev", "b.term"
    )


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out docs scored under an interpolated bigram LM of the train slice."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    train = d.filter(F.col("doc_id") < _LM_TRAIN_MAX)
    toks = train.select(F.explode(tokens(F.col("text"))).alias("term"))
    uni = toks.groupBy("term").agg(F.count("*").alias("c_uni"))
    big = (
        _bigrams(train)
        .groupBy("prev", "term")
        .agg(F.count("*").alias("c_big"))
    )
    consts = uni.agg(
        F.sum("c_uni").alias("n_total"), F.count("*").alias("v_size")
    )
    scored = (
        _bigrams(d.filter(F.col("doc_id") >= _LM_TRAIN_MAX))
        .join(F.broadcast(big), ["prev", "term"], "left")
        .join(
            F.broadcast(uni.select(F.col("term").alias("prev"), F.col("c_uni").alias("c_prev"))),
            "prev",
            "left",
        )
        .join(F.broadcast(uni), "term", "left")
        .crossJoin(F.broadcast(consts))
    )
    # association mirrors the SQL twin's left-to-right 0.75*(c+1)/d:
    # lambda*(numerator) is EXACT (dyadic 3/4 times an integer), so each
    # term pays exactly ONE IEEE rounding at the division — computing
    # lambda*(a/b) instead pays two and can differ by 1 ulp (round-6
    # review), which ln + avg can carry across a round(4) boundary
    p_big = (
        F.lit(_LM_LAMBDA) * (F.coalesce(F.col("c_big"), F.lit(0)) + 1)
    ) / (F.coalesce(F.col("c_prev"), F.lit(0)) + F.col("v_size"))
    p_uni = (
        F.lit(1.0 - _LM_LAMBDA) * (F.coalesce(F.col("c_uni"), F.lit(0)) + 1)
    ) / (F.col("n_total") + F.col("v_size"))
    logp = F.log(p_big + p_uni)
    return (
        scored.select("doc_id", logp.alias("logp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("logp"), 4).alias("avg_logprob"),
        )
    )


_SQL_BIGRAMS = f"""
  SELECT doc_id, l[i - 1] AS prev, l[i] AS term
  FROM (
    SELECT doc_id, l, unnest(generate_series(2, len(l))) AS i
    FROM (SELECT doc_id, {_SQL_TOKS} AS l FROM {{src}})
  )
"""

ORACLE_BIGRAM_LOGPROB = f"""
WITH train AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {_LM_TRAIN_MAX}
), uni AS (
  SELECT tok AS term, COUNT(*) AS c_uni
  FROM (SELECT unnest({_SQL_TOKS}) AS tok FROM train)
  GROUP BY tok
), big AS (
  SELECT prev, term, COUNT(*) AS c_big
  FROM ({_SQL_BIGRAMS.format(src="train")})
  GROUP BY prev, term
), consts AS (
  SELECT SUM(c_uni) AS n_total, COUNT(*) AS v_size FROM uni
), held AS (
  SELECT doc_id, text FROM documents WHERE doc_id >= {_LM_TRAIN_MAX}
), scored AS (
  SELECT hb.doc_id,
         ln({_LM_LAMBDA}::DOUBLE
              * (COALESCE(big.c_big, 0) + 1)
              / (COALESCE(p.c_uni, 0) + consts.v_size)
            + {1.0 - _LM_LAMBDA}::DOUBLE
              * (COALESCE(u.c_uni, 0) + 1)
              / (consts.n_total + consts.v_size)) AS logp
  FROM ({_SQL_BIGRAMS.format(src="held")}) hb
  LEFT JOIN big ON hb.prev = big.prev AND hb.term = big.term
  LEFT JOIN uni p ON hb.prev = p.term
  LEFT JOIN uni u ON hb.term = u.term
  CROSS JOIN consts
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(AVG(logp), 4) AS avg_logprob
FROM scored GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# CCNet-style perplexity filter (Wenzek et al. 2020): score every held-out
# doc under the interpolated bigram LM, then split each LANGUAGE at its
# perplexity terciles into head/middle/tail quality buckets — the standard
# LM-based pretraining-corpus gate. Bucketing happens on avg_logprob
# directly (perplexity = exp(-x) is monotone, so terciles of one are
# terciles of the other) — no exp() in the compared output, keeping the
# cross-engine float surface identical to the proven LM queries (ln + AVG
# + round-4). Scale: the per-doc scoring reuses the broadcast bigram
# model (corpus-wide shuffle only at the per-doc aggregate); the tercile
# table is |langs|×2 rows — computed with exact interpolated percentile
# here, the drop-in at 100 TB is percentile_approx over the same
# doc-count-sized score table, and the bucket assignment join stays
# broadcast either way. p = 1/3 keeps rank fractions in {0, 1/3, 2/3},
# so interpolated boundaries sit strictly between round-4-separated
# sample values and the head/middle/tail comparisons cannot flip on
# engine ulp differences.
# ---------------------------------------------------------------------------
_P1 = 1.0 / 3.0
_P2 = 2.0 / 3.0


def _doc_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-held-out-doc (doc_id, lang, avg_logprob) under the bigram LM —
    the scoring core of q_bigram_logprob with lang carried through."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    train = d.filter(F.col("doc_id") < _LM_TRAIN_MAX)
    toks = train.select(F.explode(tokens(F.col("text"))).alias("term"))
    uni = toks.groupBy("term").agg(F.count("*").alias("c_uni"))
    big = _bigrams(train).groupBy("prev", "term").agg(F.count("*").alias("c_big"))
    consts = uni.agg(
        F.sum("c_uni").alias("n_total"), F.count("*").alias("v_size")
    )
    held = d.filter(F.col("doc_id") >= _LM_TRAIN_MAX)
    scored = (
        _bigrams(held)
        .join(F.broadcast(big), ["prev", "term"], "left")
        .join(
            F.broadcast(
                uni.select(F.col("term").alias("prev"), F.col("c_uni").alias("c_prev"))
            ),
            "prev",
            "left",
        )
        .join(F.broadcast(uni), "term", "left")
        .crossJoin(F.broadcast(consts))
    )
    # association mirrors the SQL twin's left-to-right 0.75*(c+1)/d:
    # lambda*(numerator) is EXACT (dyadic 3/4 times an integer), so each
    # term pays exactly ONE IEEE rounding at the division — computing
    # lambda*(a/b) instead pays two and can differ by 1 ulp (round-6
    # review), which ln + avg can carry across a round(4) boundary
    p_big = (
        F.lit(_LM_LAMBDA) * (F.coalesce(F.col("c_big"), F.lit(0)) + 1)
    ) / (F.coalesce(F.col("c_prev"), F.lit(0)) + F.col("v_size"))
    p_uni = (
        F.lit(1.0 - _LM_LAMBDA) * (F.coalesce(F.col("c_uni"), F.lit(0)) + 1)
    ) / (F.col("n_total") + F.col("v_size"))
    logp = F.log(p_big + p_uni)
    per_doc = (
        scored.select("doc_id", logp.alias("logp"))
        .groupBy("doc_id")
        .agg(F.round(F.avg("logp"), 4).alias("score"))
    )
    return per_doc.join(held.select("doc_id", "lang"), "doc_id")


def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang head/middle/tail perplexity buckets of the held-out docs."""
    per_doc = _doc_logprob(spark, sf_dir)
    terc = per_doc.groupBy("lang").agg(
        F.percentile("score", F.lit(_P1)).alias("q1"),
        F.percentile("score", F.lit(_P2)).alias("q2"),
    )
    bucket = (
        F.when(F.col("score") > F.col("q2"), "head")
        .when(F.col("score") > F.col("q1"), "middle")
        .otherwise("tail")
    )
    return (
        per_doc.join(F.broadcast(terc), "lang")
        .select("lang", bucket.alias("bucket"), "score")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            # order-independent average: scores are round-4, so summing
            # them as exact 1e-4-scaled integers removes float-summation
            # order sensitivity; one shared division at the end.
            F.round(
                F.sum(F.round(F.col("score") * 10000, 0).cast("long"))
                / (F.lit(10000.0) * F.count("*")),
                4,
            ).alias("avg_logprob"),
        )
        .orderBy("lang", "bucket")
    )


ORACLE_PERPLEXITY_FILTER = f"""
WITH train AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {_LM_TRAIN_MAX}
), uni AS (
  SELECT tok AS term, COUNT(*) AS c_uni
  FROM (SELECT unnest({_SQL_TOKS}) AS tok FROM train)
  GROUP BY tok
), big AS (
  SELECT prev, term, COUNT(*) AS c_big
  FROM ({_SQL_BIGRAMS.format(src="train")})
  GROUP BY prev, term
), consts AS (
  SELECT SUM(c_uni) AS n_total, COUNT(*) AS v_size FROM uni
), held AS (
  SELECT doc_id, lang, text FROM documents WHERE doc_id >= {_LM_TRAIN_MAX}
), scored AS (
  SELECT hb.doc_id,
         ln({_LM_LAMBDA}::DOUBLE
              * (COALESCE(big.c_big, 0) + 1)
              / (COALESCE(p.c_uni, 0) + consts.v_size)
            + {1.0 - _LM_LAMBDA}::DOUBLE
              * (COALESCE(u.c_uni, 0) + 1)
              / (consts.n_total + consts.v_size)) AS logp
  FROM ({_SQL_BIGRAMS.format(src="held")}) hb
  LEFT JOIN big ON hb.prev = big.prev AND hb.term = big.term
  LEFT JOIN uni p ON hb.prev = p.term
  LEFT JOIN uni u ON hb.term = u.term
  CROSS JOIN consts
), per_doc AS (
  SELECT s.doc_id, h.lang, ROUND(AVG(s.logp), 4) AS score
  FROM scored s JOIN held h ON s.doc_id = h.doc_id
  GROUP BY s.doc_id, h.lang
), terc AS (
  SELECT lang,
         quantile_cont(score, {_P1!r}) AS q1,
         quantile_cont(score, {_P2!r}) AS q2
  FROM per_doc GROUP BY lang
)
SELECT d.lang,
       CASE WHEN d.score > t.q2 THEN 'head'
            WHEN d.score > t.q1 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(SUM(CAST(ROUND(d.score * 10000, 0) AS BIGINT))
             / (10000.0 * COUNT(*)), 4) AS avg_logprob
FROM per_doc d JOIN terc t ON d.lang = t.lang
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# BPE merge step: the distributed core of byte-pair-encoding tokenizer
# training (Sennrich et al. 2016) — count adjacent character pairs across
# the corpus, weighted by word frequency, and emit the top merge
# candidates. The key scale property: after the first groupBy the working
# set is the VOCABULARY (millions of rows), not the corpus (trillions of
# tokens) — word counting partial-aggregates map-side, and every later
# stage operates on (word, freq) rows. Pair extraction is a codegen'd
# transform/substr over the word itself; no Python anywhere.
# ---------------------------------------------------------------------------
_BPE_TOP = 20


def q_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("text")
    words = d.select(F.explode(tokens(F.col("text"))).alias("word"))
    vocab = words.groupBy("word").agg(F.count("*").alias("freq"))
    pairs = vocab.filter(F.length("word") >= 2).select(
        "freq",
        F.explode(
            F.expr("transform(sequence(1, length(word)-1), i -> substr(word, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(_BPE_TOP)
    )


ORACLE_BPE_MERGE_STEP = f"""
WITH words AS (
  SELECT unnest({_SQL_TOKS}) AS word FROM documents
),
vocab AS (
  SELECT word, COUNT(*) AS freq FROM words GROUP BY word
),
pairs AS (
  SELECT substr(word, i, 2) AS pair, freq
  FROM vocab, LATERAL unnest(generate_series(1, length(word) - 1)) AS g(i)
  WHERE length(word) >= 2
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
FROM pairs GROUP BY pair
ORDER BY pair_count DESC, pair LIMIT {_BPE_TOP}
"""


# ---------------------------------------------------------------------------
# fastText-style hashed-bigram linear quality classifier (inference).
# The production pretraining-quality filter shape (CCNet / fastText
# "wiki-vs-crawl" classifiers): featurize each doc as a hashed bag of
# word bigrams, dot with a weight vector, sigmoid, threshold. Everything
# is JVM column expressions — explode-free: the bigram array maps through
# transform() to bucket weights and aggregate()s to the dot product, so
# the plan is a pure codegen map + one agg shuffle on the (tiny) lang key.
# Weights here are a deterministic hash-derived stand-in (the container
# has no trained model); production swaps `_bucket_weight` for a lookup
# into a broadcast weight array — identical plan shape.
# Scale: no shuffle before the final 5-row aggregate; md5 feature hashing
# is engine-portable (same buckets in the DuckDB oracle).
# ---------------------------------------------------------------------------
_QC_BUCKETS = 1 << 16
_QC_GOLD = 2654435761
_QC_MOD = 1 << 31


def _classifier_sigmoid(text_col):
    """The learned-quality score: hashed-bigram dot product -> sigmoid.
    ONE definition shared by the classifier and its calibration query —
    the calibration exists to measure THIS score, so a drift between two
    copies would silently invalidate it (round-6 review)."""
    toks = tokens(text_col)
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit("_"), b),
    )

    # feature hash: md5-prefix bucket (cross-engine), then a centered
    # pseudo-weight in [-1, 1) derived from the bucket id.
    def _w(bg):
        bucket = (
            F.conv(F.substring(F.md5(bg), 1, 8), 16, 10).cast("bigint")
            % _QC_BUCKETS
        )
        return ((bucket * _QC_GOLD) % _QC_MOD) / F.lit(float(_QC_MOD) / 2.0) - 1.0

    score = F.when(
        n >= 2,
        F.aggregate(bigrams, F.lit(0.0), lambda acc, bg: acc + _w(bg))
        / (n - 1),
    ).otherwise(F.lit(0.0))
    return 1.0 / (1.0 + F.exp(-score))


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", _classifier_sigmoid(F.col("text")).alias("p_quality")
    )
    # per-lang mean via 1e-4-quantized integer sums (the perplexity-filter
    # convention): AVG over irrational doubles adds in partition order and
    # can land on a rounding boundary differently per engine; the integer
    # sum is exact and the single final division is deterministic
    pq = F.round(F.col("p_quality") * 10000).cast("long")
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("p_quality") > 0.5).cast("long")).alias("n_pass"),
        F.round(F.sum(pq) / (F.count("*") * 10000.0), 4).alias("avg_p"),
    )


ORACLE_QUALITY_CLASSIFIER = f"""
WITH scored AS (
  SELECT doc_id, lang,
         1.0 / (1.0 + exp(-(CASE WHEN len(toks) >= 2 THEN
           list_sum(list_transform(
             generate_series(1, len(toks) - 1),
             i -> ((('0x' || substr(md5(toks[i] || '_' || toks[i + 1]), 1, 8))::BIGINT
                    % {_QC_BUCKETS}) * {_QC_GOLD} % {_QC_MOD})
                  / ({_QC_MOD} / 2.0) - 1.0
           )) / (len(toks) - 1)
         ELSE 0.0 END))) AS p_quality
  FROM (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents)
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN p_quality > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       ROUND(SUM(CAST(round(p_quality * 10000) AS BIGINT))
             / (COUNT(*) * 10000.0), 4) AS avg_p
FROM scored GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Collocation mining: top adjacent-pair PMI over the corpus — the classic
# phrase-detection signal (word2vec's phrase pass, "fast unigram" →
# "fast_unigram" merges). PMI is computed from integer counts through ONE
# fixed expression tree — ln((c_ab/Np) / ((c_a/Nu)·(c_b/Nu))) — written
# identically in both engines (products of raw counts would overflow int64
# at 100 TB; the ratio form never leaves unit scale), rounded to 4dp
# BEFORE ordering so the top-k boundary cannot flip on a ulp. Top-k is
# orderBy().limit() (TakeOrderedAndProject — parallel partial top-k, no
# single-task global sort); the rank window then runs over only k rows.
# Scale: two agg shuffles (unigrams, pairs) with map-side combine; the
# unigram model broadcasts (Heaps' law).
# ---------------------------------------------------------------------------
_PMI_MIN_COUNT = 10
_PMI_TOP = 50


def q_pmi_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    uni = (
        d.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c_uni"))
    )
    pairs = _bigrams(d).groupBy("prev", "term").agg(F.count("*").alias("c_pair"))
    consts = uni.agg(F.sum("c_uni").alias("n_uni")).crossJoin(
        pairs.agg(F.sum("c_pair").alias("n_pairs"))
    )
    scored = (
        pairs.filter(F.col("c_pair") >= _PMI_MIN_COUNT)
        .join(
            F.broadcast(
                uni.select(F.col("term").alias("prev"), F.col("c_uni").alias("c_a"))
            ),
            "prev",
        )
        .join(F.broadcast(uni.select("term", F.col("c_uni").alias("c_b"))), "term")
        .crossJoin(F.broadcast(consts))
        .select(
            "prev",
            "term",
            "c_pair",
            F.round(
                F.log(
                    (F.col("c_pair") / F.col("n_pairs"))
                    / ((F.col("c_a") / F.col("n_uni")) * (F.col("c_b") / F.col("n_uni")))
                ),
                4,
            ).alias("pmi"),
        )
    )
    topk = scored.orderBy(F.desc("pmi"), F.asc("prev"), F.asc("term")).limit(_PMI_TOP)
    w = W.orderBy(F.desc("pmi"), F.asc("prev"), F.asc("term"))  # k rows only
    return topk.withColumn("rank", F.row_number().over(w).cast("long"))


def _pmi_oracle() -> str:
    return f"""
WITH uni AS (
  SELECT term, COUNT(*) AS c_uni FROM (
    SELECT unnest({_SQL_TOKS}) AS term FROM documents
  ) GROUP BY term
), pairs AS (
  SELECT prev, term, COUNT(*) AS c_pair
  FROM ({_SQL_BIGRAMS.format(src="documents")}) GROUP BY prev, term
), consts AS (
  SELECT (SELECT CAST(SUM(c_uni) AS BIGINT) FROM uni) AS n_uni,
         (SELECT CAST(SUM(c_pair) AS BIGINT) FROM pairs) AS n_pairs
), scored AS (
  SELECT pairs.prev, pairs.term, c_pair,
         ROUND(ln((c_pair * 1.0 / n_pairs)
                  / ((a.c_uni * 1.0 / n_uni) * (b.c_uni * 1.0 / n_uni))), 4) AS pmi
  FROM pairs
  JOIN uni a ON a.term = pairs.prev
  JOIN uni b ON b.term = pairs.term
  CROSS JOIN consts
  WHERE c_pair >= {_PMI_MIN_COUNT}
)
SELECT prev, term, c_pair, pmi, rank FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, prev ASC, term ASC) AS rank
  FROM scored
) WHERE rank <= {_PMI_TOP}
"""


ORACLE_PMI_TOP_PAIRS = _pmi_oracle()


# ---------------------------------------------------------------------------
# Log-template mining (Drain-lite): mask the variable parts (digit runs →
# '<N>'), group by the md5 of the masked text — the reference's domain is
# factory log collection (SURVEY §0), and template extraction is the first
# analytics step over such a corpus (error-class counting, novel-template
# alerting). Per template: support, distinct sources, earliest doc, and a
# display prefix. All-JVM (regexp + md5 + one agg shuffle on the hash
# key); the template string rides the aggregation as min() — all members
# are byte-identical by construction, and only a bounded prefix is output.
# ---------------------------------------------------------------------------
_TPL_PREFIX_LEN = 60


def q_log_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    masked = F.regexp_replace(F.col("text"), "[0-9]+", "<N>")
    return (
        d.select(
            "doc_id",
            "source",
            F.substring(F.md5(masked), 1, 12).alias("template_id"),
            masked.alias("masked"),
        )
        .groupBy("template_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("first_doc_id"),
            F.substring(F.min("masked"), 1, _TPL_PREFIX_LEN).alias("template_prefix"),
        )
    )


ORACLE_LOG_TEMPLATE_MINING = f"""
WITH masked AS (
  SELECT doc_id, source,
         regexp_replace(text, '[0-9]+', '<N>', 'g') AS masked
  FROM documents
)
SELECT substring(md5(masked), 1, 12) AS template_id,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT source) AS n_sources,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc_id,
       substring(MIN(masked), 1, {_TPL_PREFIX_LEN}) AS template_prefix
FROM masked
GROUP BY template_id
"""


# ---------------------------------------------------------------------------
# Tokenizer fertility by detected language — the mixture-planning input a
# multilingual pretraining run needs: languages whose whitespace tokens
# carry more characters consume more subword tokens per document, so the
# per-language token budget must be weighted by fertility, not doc count.
# chars/token is the standard whitespace proxy. Determinism: counts are
# exact integers; the two ratios are single divisions of integer sums
# (ratio-of-sums convention, never avg-of-ratios).
# Scale: one langid projection (pure map) + one k-row aggregate (k = number
# of languages + 'und'); no joins, no windows.
# ---------------------------------------------------------------------------
def q_langid_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    hits = {lang: _lang_hits(toks, ws) for lang, ws in LANG_PROFILES.items()}
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    for lang in reversed(list(LANG_PROFILES)):
        pred = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(pred)
    scored = d.select(
        pred.alias("predicted_lang"),
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    return scored.groupBy("predicted_lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        # try_divide: a predicted_lang group whose docs are all token-free
        # (whitespace-only text → 'und', n_tokens=0) must yield NULL like
        # DuckDB, not crash under the driver's ANSI-on default.
        F.round(F.try_divide(F.sum("n_chars"), F.sum("n_tokens")), 4).alias(
            "chars_per_token"
        ),
        F.round(F.sum("n_tokens") / F.count("*"), 4).alias("tokens_per_doc"),
    )


ORACLE_LANGID_FERTILITY = f"""
WITH scored AS ({ORACLE_LANGID_HEURISTIC})
SELECT predicted_lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(SUM(n_chars) * 1.0 / SUM(n_tokens), 4) AS chars_per_token,
       ROUND(SUM(n_tokens) * 1.0 / COUNT(*), 4) AS tokens_per_doc
FROM scored
JOIN (SELECT doc_id, len({_SQL_TOKS}) AS n_tokens, length(text) AS n_chars
      FROM documents) USING (doc_id)
GROUP BY predicted_lang
"""


# ---------------------------------------------------------------------------
# Quality-classifier calibration: reliability table of the learned score
# (q_quality_classifier's sigmoid) against the heuristic quality gate
# (q_quality_score's passes_quality as the gold proxy). Fixed-width score
# deciles — NOT quantile bins — so no distributed sort is needed and the
# bins are stable across corpus snapshots (the property a drift monitor
# needs). pass_rate is a single division of integer counts.
# Scale: one scoring map (same plan as the green classifier query) + one
# 10-row aggregate; boundary behavior inherits the proven p>0.5 gate class
# (sigmoid of a rational sum never lands exactly on a 0.1 grid line).
# ---------------------------------------------------------------------------
def q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    sig = _classifier_sigmoid(F.col("text"))

    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    alpha_chars = F.length(F.regexp_replace(F.col("text"), r"[^a-zA-Z]", ""))
    gold = (
        (n >= 10)
        & (n_stop / n < 0.5)
        & (alpha_chars / F.length("text") > 0.5)
    )
    binned = d.select(
        F.least(F.floor(sig * 10).cast("int"), F.lit(9)).alias("score_bin"),
        gold.cast("long").alias("gold_pass"),
    )
    return binned.groupBy("score_bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("gold_pass").alias("n_gold_pass"),
        F.round(F.sum("gold_pass") / F.count("*"), 4).alias("gold_pass_rate"),
    )


ORACLE_QUALITY_CALIBRATION = f"""
WITH feats AS (
  SELECT doc_id, {_SQL_TOKS} AS toks,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars,
         length(text) AS n_chars
  FROM documents
), scored AS (
  SELECT doc_id,
         1.0 / (1.0 + exp(-(CASE WHEN len(toks) >= 2 THEN
           list_sum(list_transform(
             generate_series(1, len(toks) - 1),
             i -> ((('0x' || substr(md5(toks[i] || '_' || toks[i + 1]), 1, 8))::BIGINT
                    % {_QC_BUCKETS}) * {_QC_GOLD} % {_QC_MOD})
                  / ({_QC_MOD} / 2.0) - 1.0
           )) / (len(toks) - 1)
         ELSE 0.0 END))) AS p_quality,
         (len(toks) >= 10
          AND len(list_filter(toks, t -> t IN {_SQL_STOPS})) * 1.0 / len(toks) < 0.5
          AND alpha_chars * 1.0 / n_chars > 0.5) AS gold
  FROM feats
)
SELECT CAST(least(floor(p_quality * 10), 9) AS INT) AS score_bin,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN gold THEN 1 ELSE 0 END) AS BIGINT) AS n_gold_pass,
       ROUND(SUM(CASE WHEN gold THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
         AS gold_pass_rate
FROM scored GROUP BY score_bin
"""


# ---------------------------------------------------------------------------
# Character-distribution Shannon entropy per document — the gibberish /
# boilerplate detector quality pipelines run next to the stopword gate:
# natural prose sits in a band (~4-4.5 bits for English); base64 blobs and
# repeated-char padding fall far outside it. Computed from exact integer
# character counts via an explode over character positions (the same
# corpus-x-length row class as the shingle operators: narrow map + one
# partial-agg shuffle on (doc, char), then a per-doc k-row fold). log2
# under round(4): cross-engine ln noise is ~1 ulp, far inside the grid.
# ---------------------------------------------------------------------------
_ENTROPY_FLAG_LOW = 2.5
_ENTROPY_FLAG_HIGH = 5.2


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Empty docs are filtered identically on both engines: Spark's
    # sequence(1, 0) yields [1, 0] (step defaults to -1 when start > stop)
    # while DuckDB's generate_series(1, 0) is empty — without the filter an
    # empty-text doc would emit a phantom entropy row on Spark only.
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length("text") > 0)
    )
    # carry text THROUGH the explode select: re-joining the corpus on
    # doc_id just to recover the column would shuffle + hash-probe one
    # row per CHARACTER (round-6 review) — this stays a narrow map
    # inside whole-stage codegen with zero joins
    chars = d.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
    ).select("doc_id", F.expr("substring(text, i, 1)").alias("ch"))
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    # r10 (guide §1.2/§2.4): the per-doc total used to be a SECOND
    # aggregate of `counts` joined back on doc_id — a forked DataFrame
    # that re-derived the whole scan→explode→(doc,ch) aggregation (one
    # row per CHARACTER) twice, plus a (doc,ch)-stream hash join. A
    # doc-partitioned window sum reads the counts once and needs no
    # join: 3 scans/11 exchanges → 2/4, 2.31→2.08 s median interleaved
    # at sf0.1, values identical (same c and n per row, same terms
    # summed).
    ent = (
        counts.withColumn(
            "n", F.sum("c").over(W.partitionBy("doc_id"))
        )
        .groupBy("doc_id")
        .agg(
            # + 0.0 normalizes IEEE -0.0 → 0.0: a single-distinct-char doc
            # has entropy exactly -(1·log2(1)) = -0.0 on DuckDB, and the
            # driver hash distinguishes -0.0 from 0.0 (repo convention)
            (
                F.round(
                    -F.sum(
                        (F.col("c") / F.col("n"))
                        * F.log2(F.col("c") / F.col("n"))
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias("entropy_bits"),
            F.count("*").alias("n_distinct_chars"),
        )
    )
    return ent.select(
        "doc_id",
        "entropy_bits",
        "n_distinct_chars",
        (
            (F.col("entropy_bits") < _ENTROPY_FLAG_LOW)
            | (F.col("entropy_bits") > _ENTROPY_FLAG_HIGH)
        ).alias("is_suspect"),
    )


ORACLE_CHAR_ENTROPY = f"""
WITH chars AS (
  SELECT doc_id, substring(text, CAST(i AS INT), 1) AS ch
  FROM documents, LATERAL unnest(generate_series(1, length(text))) AS t(i)
  WHERE length(text) > 0
), counts AS (
  SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
), tot AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY doc_id
), ent AS (
  SELECT counts.doc_id,
         ROUND(-SUM((c * 1.0 / n) * log2(c * 1.0 / n)), 4) + 0.0 AS entropy_bits,
         COUNT(*) AS n_distinct_chars
  FROM counts JOIN tot ON counts.doc_id = tot.doc_id
  GROUP BY counts.doc_id
)
SELECT doc_id, entropy_bits, n_distinct_chars,
       (entropy_bits < {_ENTROPY_FLAG_LOW} OR entropy_bits > {_ENTROPY_FLAG_HIGH})
         AS is_suspect
FROM ent
"""


# ---------------------------------------------------------------------------
# Judge agreement: Cohen's kappa between two independent quality judges.
# Every curation pipeline that gates on a cheap heuristic eventually asks
# whether a SECOND signal agrees with it beyond chance — the same
# question inter-annotator (or LLM-judge vs heuristic) audits ask. Kappa
# (Cohen 1960) corrects raw agreement for the agreement two independent
# judges with these marginals would show by luck.
#
# Judge A ("structural"): enough tokens and a majority-alphabetic byte
# profile. Judge B ("lexical"): enough tokens and type-token ratio ≥ 0.4.
# Both gates are integer cross-multiplications (alpha·10 ≥ chars·5,
# distinct·10 ≥ tokens·4) so no float threshold compare exists anywhere;
# the contingency table is pure counts and kappa is one IEEE division of
# two exact integers: n·(n11+n00) − pe over n² − pe with
# pe = a1·b1 + a0·b0 — counts cast to DECIMAL(38,0)/HUGEINT before the
# marginal products (n² overflows BIGINT past ~3e9 docs/source).
# Scale shape: one fused scan of documents → per-source k-row aggregate.
# ---------------------------------------------------------------------------
def q_judge_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    alpha_chars = F.length(
        F.regexp_replace(F.col("text"), r"[^a-zA-Z]", "")
    ).cast("bigint")
    n_chars_len = F.length("text").cast("bigint")
    a = (n_tokens >= 10) & (alpha_chars * 10 >= n_chars_len * 5)
    b = (n_tokens >= 10) & (n_distinct * 10 >= n_tokens * 4)
    flags = d.select("source", a.alias("a"), b.alias("b"))

    def _n(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    counts = flags.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        _n(F.col("a") & F.col("b")).alias("n_both_pass"),
        _n(F.col("a") & ~F.col("b")).alias("n_struct_only"),
        _n(~F.col("a") & F.col("b")).alias("n_lexical_only"),
        _n(~F.col("a") & ~F.col("b")).alias("n_both_fail"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    a1 = dec("n_both_pass") + dec("n_struct_only")
    b1 = dec("n_both_pass") + dec("n_lexical_only")
    a0 = dec("n_lexical_only") + dec("n_both_fail")
    b0 = dec("n_struct_only") + dec("n_both_fail")
    pe = a1 * b1 + a0 * b0
    agree = dec("n_both_pass") + dec("n_both_fail")
    n = dec("n_docs")
    return counts.select(
        "source",
        "n_docs",
        "n_both_pass",
        "n_struct_only",
        "n_lexical_only",
        "n_both_fail",
        F.round(
            agree.cast("double") / F.col("n_docs").cast("double"), 4
        ).alias("observed_agreement"),
        F.when(
            (n * n - pe) == F.lit(0).cast("decimal(38,0)"),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (n * agree - pe).cast("double") / (n * n - pe).cast("double"), 4
            )
        )
        .alias("kappa"),
    )


ORACLE_JUDGE_AGREEMENT = f"""
WITH f AS (
  SELECT source,
         (n_tokens >= 10 AND alpha_chars * 10 >= n_chars_len * 5) AS a,
         (n_tokens >= 10 AND n_distinct * 10 >= n_tokens * 4) AS b
  FROM (
    SELECT source,
           len({_SQL_TOKS}) AS n_tokens,
           len(list_distinct({_SQL_TOKS})) AS n_distinct,
           length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars,
           length(text) AS n_chars_len
    FROM documents
  )
), c AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_both_pass,
         CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_struct_only,
         CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_lexical_only,
         CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_both_fail
  FROM f GROUP BY source
)
SELECT source, n_docs, n_both_pass, n_struct_only, n_lexical_only, n_both_fail,
       ROUND((n_both_pass + n_both_fail) * 1.0 / n_docs, 4) AS observed_agreement,
       CASE WHEN CAST(n_docs AS HUGEINT) * n_docs = pe THEN NULL
            ELSE ROUND(
              CAST(CAST(n_docs AS HUGEINT) * (n_both_pass + n_both_fail) - pe
                   AS DOUBLE)
              / CAST(CAST(n_docs AS HUGEINT) * n_docs - pe AS DOUBLE), 4)
       END AS kappa
FROM (
  SELECT *,
         CAST(n_both_pass + n_struct_only AS HUGEINT)
           * (n_both_pass + n_lexical_only)
         + CAST(n_lexical_only + n_both_fail AS HUGEINT)
           * (n_struct_only + n_both_fail) AS pe
  FROM c
)
"""


# ---------------------------------------------------------------------------
# Vocabulary coverage curve: for candidate vocab sizes V, what share of
# token OCCURRENCES does the top-V-by-frequency vocabulary cover? The
# tokenizer-budget decision (how big a vocab before OOV mass is
# negligible) as one query — the operational companion to the Zipf fit
# above (which says coverage will be heavy-headed; this measures it).
# Scale shape: token counting is the corpus-sized part (map-side
# combinable groupBy); everything after runs on the VOCABULARY (bounded),
# ranked by the range-partitioned parallel sort in operators/ranking.py —
# no single-partition window. Coverage is a ratio of exact integer counts.
# ---------------------------------------------------------------------------
_VOCAB_SIZES = [256, 1024, 4096]


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    freqs = (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    ranked = with_global_order(
        freqs, [F.desc("freq"), F.asc("token")], rank_col="rank"
    )
    sizes = spark.createDataFrame(
        [(v,) for v in _VOCAB_SIZES], "vocab_size bigint"
    )
    return (
        ranked.crossJoin(F.broadcast(sizes))
        .groupBy("vocab_size")
        .agg(
            F.sum(F.when(F.col("rank") <= F.col("vocab_size"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_types"),
            F.coalesce(
                F.sum(F.when(F.col("rank") <= F.col("vocab_size"), F.col("freq"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("covered_occurrences"),
            F.sum("freq").cast("bigint").alias("total_occurrences"),
        )
        .select(
            "vocab_size",
            "n_types",
            "covered_occurrences",
            "total_occurrences",
            F.round(
                F.col("covered_occurrences").cast("double")
                / F.col("total_occurrences").cast("double"),
                6,
            ).alias("coverage"),
        )
    )


ORACLE_VOCAB_COVERAGE = f"""
WITH freqs AS (
  SELECT token, COUNT(*) AS freq FROM (
    SELECT unnest({_SQL_TOKS}) AS token FROM documents
  ) GROUP BY token
), ranked AS (
  SELECT freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS rank
  FROM freqs
), sizes AS (
  SELECT unnest([{", ".join(str(v) for v in _VOCAB_SIZES)}]) AS vocab_size
)
SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
       CAST(SUM(CASE WHEN rank <= vocab_size THEN 1 ELSE 0 END) AS BIGINT)
         AS n_types,
       CAST(COALESCE(SUM(CASE WHEN rank <= vocab_size THEN freq END), 0)
            AS BIGINT) AS covered_occurrences,
       CAST(SUM(freq) AS BIGINT) AS total_occurrences,
       ROUND(COALESCE(SUM(CASE WHEN rank <= vocab_size THEN freq END), 0)
             * 1.0 / SUM(freq), 6) AS coverage
FROM ranked CROSS JOIN sizes
GROUP BY vocab_size
"""


# ---------------------------------------------------------------------------
# Gopher-style repetition GATES (Rae et al. 2021, "Scaling Language
# Models", table A1): a doc fails when its single most frequent n-gram
# covers too large a share of the doc — the "most of this page is one
# repeated phrase" SEO/boilerplate signature that distinct-ratio metrics
# (text_repetition_metrics) miss, because a doc can have a healthy
# distinct ratio overall while one 3-gram covers a third of it. Token-
# count share stands in for Gopher's character share (fixture docs are
# single-space tokenized).
#
# Measured plan choice (sf0.1, local[32]): one explode+groupBy pass PER n
# (three small independent jobs, plain string grams, whole-stage codegen)
# runs 2.3x faster than a single combined pass that tags each gram with a
# struct{n, g} and flattens — the struct wrapping triples per-row array
# work and serializes what the scheduler otherwise overlaps. Both are
# linear in corpus tokens; the per-n loop is the measured winner.
# Float discipline: each gate is a PURE INTEGER comparison —
# top_cnt·n·100 > threshold_pct·n_tokens — so pass/fail is exact on both
# engines; the only division is the final per-source percentage.
# Scale shape: per n, one explode + (doc_id, gram) count + per-doc max —
# linear in corpus token count, partial-aggregated map-side; the join
# back to docs is on doc_id. Nothing all-pairs, no windows.
# ---------------------------------------------------------------------------
_REP_GATES = {2: 20, 3: 18, 4: 16}  # n-gram size -> max top-share, percent
# Dominance share is meaningless on tiny docs (ANY 2-gram of a 6-token doc
# covers 33%); Gopher pairs these gates with a minimum-length gate, so the
# repetition gates only judge docs of at least this many tokens.
_REP_MIN_TOKENS = 16


def q_repetition_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher top-n-gram dominance gates (n = 2, 3, 4): per source, docs
    whose single most repeated n-gram covers more than the Rae et al.
    thresholds — pure integer pass/fail on both engines."""
    from log_agent_spark.operators.decontaminate import token_ngrams

    # Rebalance first (r10): the fixture documents parquet is ONE row
    # group, so the three tokenize+explode passes below ran single-task
    # (same-session A/B best-of-3 at sf0.1: 4.2s → 2.3s rebalanced); at
    # cluster scale the scan is already wide and the exchange is a cheap
    # even-out next to the n-gram explodes it feeds.
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    out = d.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    for n in _REP_GATES:
        tops = (
            d.select(
                "doc_id", F.explode(token_ngrams(F.col("text"), n)).alias("g")
            )
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
            .groupBy("doc_id")
            .agg(F.max("c").alias(f"top{n}_cnt"))
        )
        out = out.join(tops, "doc_id", "left")
    long_enough = F.col("n_tok") >= _REP_MIN_TOKENS
    fails = {
        # a gram seen ONCE is not repetition, whatever share it covers —
        # without the >= 2 floor every short-ish all-distinct doc fails
        # the n=4 gate arithmetically (4/18 = 22% > 16%)
        n: long_enough
        & (F.col(f"top{n}_cnt") >= 2)
        & (F.col(f"top{n}_cnt") * n * 100 > F.lit(pct) * F.col("n_tok"))
        for n, pct in _REP_GATES.items()
    }
    fail_any = None
    for cond in fails.values():
        fail_any = cond if fail_any is None else (fail_any | cond)
    n_fail_any = F.sum(F.when(fail_any, 1).otherwise(0))
    return (
        out.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            *[
                F.sum(F.when(fails[n], 1).otherwise(0)).alias(f"n_fail_top{n}")
                for n in _REP_GATES
            ],
            n_fail_any.alias("n_fail_any"),
            F.round(n_fail_any * 100.0 / F.count("*"), 4).alias(
                "pct_fail_any"
            ),
        )
        .orderBy("source")
    )


def _repetition_gates_oracle() -> str:
    from log_agent_spark.operators.decontaminate import _sql_ngrams_n

    top_ctes = []
    joins = []
    for n in _REP_GATES:
        grams = _sql_ngrams_n(n).format(where="")
        top_ctes.append(
            f"""top{n} AS (
  SELECT doc_id, MAX(c) AS top{n}_cnt FROM (
    SELECT doc_id, ngram, COUNT(*) AS c FROM ({grams}) GROUP BY 1, 2
  ) GROUP BY 1
)"""
        )
        joins.append(f"LEFT JOIN top{n} USING (doc_id)")
    gates = {
        n: f"(n_tok >= {_REP_MIN_TOKENS} AND top{n}_cnt >= 2"
        f" AND top{n}_cnt * {n} * 100 > {pct} * n_tok)"
        for n, pct in _REP_GATES.items()
    }
    fail_cols = ",\n       ".join(
        f"CAST(SUM(CASE WHEN {g} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_fail_top{n}"
        for n, g in gates.items()
    )
    any_gate = " OR ".join(gates.values())
    return f"""
WITH base AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
  FROM documents
), {", ".join(top_ctes)}
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       {fail_cols},
       CAST(SUM(CASE WHEN {any_gate} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fail_any,
       ROUND(SUM(CASE WHEN {any_gate} THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 4)
         AS pct_fail_any
FROM base {" ".join(joins)}
GROUP BY source
ORDER BY source
"""


ORACLE_REPETITION_GATES = _repetition_gates_oracle()


QUERIES = {
    "text_quality_classifier": q_quality_classifier,
    "text_bpe_merge_step": q_bpe_merge_step,
    "text_bigram_logprob": q_bigram_logprob,
    "text_perplexity_filter": q_perplexity_filter,
    "text_bm25_search": q_bm25_search,
    "text_inverted_index": q_inverted_index,
    "text_langid_confusion": q_langid_confusion,
    "text_vocab_growth": q_vocab_growth,
    "text_zipf_fit": q_zipf_fit,
    "text_unigram_logprob": q_unigram_logprob,
    "text_repetition_metrics": q_repetition_metrics,
    "text_chunking": q_text_chunking,
    "text_pack_sequences": q_text_pack_sequences,
    "text_redact_pii": q_text_redact_pii,
    "text_token_stats": q_token_stats,
    "text_token_bpe": q_token_bpe,
    "text_tfidf_topterms": q_tfidf_topterms,
    "text_quality_score": q_quality_score,
    "text_langid_heuristic": q_langid_heuristic,
    "text_doc_fingerprint": q_doc_fingerprint,
    "text_lang_profile": q_lang_profile,
    "text_token_frequency": q_token_frequency,
    "text_pmi_top_pairs": q_pmi_top_pairs,
    "logs_template_mining": q_log_template_mining,
    "text_langid_fertility": q_langid_fertility,
    "text_quality_calibration": q_quality_calibration,
    "text_char_entropy": q_char_entropy,
    "text_judge_agreement": q_judge_agreement,
    "text_vocab_coverage": q_vocab_coverage,
    "text_repetition_gates": q_repetition_gates,
}

ORACLES = {
    "text_quality_classifier": ORACLE_QUALITY_CLASSIFIER,
    "text_bpe_merge_step": ORACLE_BPE_MERGE_STEP,
    "text_bigram_logprob": ORACLE_BIGRAM_LOGPROB,
    "text_perplexity_filter": ORACLE_PERPLEXITY_FILTER,
    "text_bm25_search": ORACLE_BM25_SEARCH,
    "text_inverted_index": ORACLE_INVERTED_INDEX,
    "text_langid_confusion": ORACLE_LANGID_CONFUSION,
    "text_vocab_growth": ORACLE_VOCAB_GROWTH,
    "text_zipf_fit": ORACLE_ZIPF_FIT,
    "text_unigram_logprob": ORACLE_UNIGRAM_LOGPROB,
    "text_repetition_metrics": ORACLE_REPETITION_METRICS,
    "text_chunking": ORACLE_TEXT_CHUNKING,
    "text_pack_sequences": ORACLE_TEXT_PACK_SEQUENCES,
    "text_redact_pii": ORACLE_TEXT_REDACT_PII,
    "text_token_stats": ORACLE_TOKEN_STATS,
    "text_token_bpe": ORACLE_TOKEN_BPE,
    "text_tfidf_topterms": ORACLE_TFIDF_TOPTERMS,
    "text_quality_score": ORACLE_QUALITY_SCORE,
    "text_langid_heuristic": ORACLE_LANGID_HEURISTIC,
    "text_doc_fingerprint": ORACLE_DOC_FINGERPRINT,
    "text_lang_profile": ORACLE_LANG_PROFILE,
    "text_token_frequency": ORACLE_TOKEN_FREQUENCY,
    "text_pmi_top_pairs": ORACLE_PMI_TOP_PAIRS,
    "logs_template_mining": ORACLE_LOG_TEMPLATE_MINING,
    "text_langid_fertility": ORACLE_LANGID_FERTILITY,
    "text_quality_calibration": ORACLE_QUALITY_CALIBRATION,
    "text_char_entropy": ORACLE_CHAR_ENTROPY,
    "text_judge_agreement": ORACLE_JUDGE_AGREEMENT,
    "text_vocab_coverage": ORACLE_VOCAB_COVERAGE,
    "text_repetition_gates": ORACLE_REPETITION_GATES,
}
