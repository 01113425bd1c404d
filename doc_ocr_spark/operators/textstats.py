"""Text-analysis operators: language ID, quality scoring, token counts.

All expressions are engine-portable (regex + length arithmetic; double
division with explicit casts) and stay JVM-side in Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc_ocr_spark.operators import load, respread

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")
_STOP_IN = ", ".join(f"'{w}'" for w in STOPWORDS)

# Per-language stopword sets for Latin-script discrimination (round 4:
# the script-class rule separates zh/ru/ar but predicted 'en' for ANY
# Latin text containing an English stopword — de/fr/es were
# unreachable).  Small high-frequency function-word sets; shared words
# ("la", "que", "es") are resolved by the deterministic priority order
# en > de > fr > es on exact count ties.
LANG_STOPS = {
    "en": STOPWORDS,
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "dans"),
    "es": ("el", "la", "los", "las", "es", "y", "un", "como"),
}

# BPE-ish token regex: letter runs, digit runs, single punctuation
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _stop_count(lang: str):
    words = list(LANG_STOPS[lang])
    return F.size(F.filter(F.split("text", " "), lambda w: w.isin(words)))


def lang_pred_col():
    """The language-ID prediction as a reusable Column (shared with the
    curation composite so the signal folds into an existing scan).

    Two-stage heuristic: character-script classes first (zh/ru/ar),
    then the argmax of per-language stopword counts over the
    Latin-script candidates (en/de/fr/es), ties broken in that fixed
    order; no stopword hits at all -> 'und'."""
    counts = {g: _stop_count(g) for g in ("en", "de", "fr", "es")}
    m = F.greatest(*counts.values())
    latin = (
        F.when(counts["en"] == m, "en")
        .when(counts["de"] == m, "de")
        .when(counts["fr"] == m, "fr")
        .otherwise("es")
    )
    return (
        F.when(F.col("text").rlike("[一-鿿]"), "zh")
        .when(F.col("text").rlike("[Ѐ-ӿ]"), "ru")
        .when(F.col("text").rlike("[؀-ۿ]"), "ar")
        .when(m > 0, latin)
        .otherwise("und")
    )


# --- lang-ID quality gate (VERDICT r04 item 3) -----------------------------
# The synthetic corpus's text is generated from ONE shared vocabulary, so
# its `lang` column is a label the text does not reflect — corpus accuracy
# is a ceiling, not ground truth.  Ground truth is CONSTRUCTED: snippets
# whose function words are drawn from the language's own pool, mixed with
# language-neutral content words (none of which appear in any stopword
# set), plus script-class snippets for zh/ru/ar and pseudo-word 'und'
# rows.  Deterministic (seeded), so the measured accuracy is a stable
# number a test can assert a floor on.

# content fillers shared by every Latin-script language; deliberately
# disjoint from every LANG_STOPS set so they carry zero language signal
_NEUTRAL_WORDS = (
    "market", "data", "report", "system", "number", "total", "info",
    "page", "item", "code", "unit", "value", "plan", "model", "base",
    "region", "portal", "status", "sector", "index", "film", "radio",
    "hotel", "taxi", "metro", "foto", "club", "bank",
)
# high-frequency real words for the script-class languages
_SCRIPT_WORDS = {
    "zh": ("的", "一", "是", "不", "了", "人", "我", "在", "有", "他",
           "这", "中", "大", "来", "上", "国", "个", "到", "说", "们"),
    "ru": ("и", "в", "не", "на", "что", "он", "как", "это", "по", "но",
           "из", "его", "для", "она", "так", "мы"),
    "ar": ("في", "من", "على", "أن", "إلى", "عن", "مع", "هذا", "كان",
           "التي", "الذي", "بعد", "قد", "كل"),
}
# pseudo-words: no stopword of any language, no script characters
_UND_WORDS = ("zorp", "blick", "frum", "quax", "snib", "vrel", "plon",
              "trasq", "glim", "worp")


def langid_eval_corpus(
    n_per_lang: int = 50, seed: int = 7
) -> list[tuple[str, str]]:
    """Deterministic (text, true_lang) snippets for measuring lang-ID
    accuracy: ``n_per_lang`` rows for each of en/de/fr/es/zh/ru/ar/und.
    Latin snippets mix ~35% own-language function words with neutral
    fillers (8-24 words), mirroring real function-word densities; shared
    stopwords across languages ("la", "es", ...) stay in the pools, so
    genuine fr/es-style confusion is part of the measurement."""
    import random as _random

    r = _random.Random(seed)
    out: list[tuple[str, str]] = []
    for lang in ("en", "de", "fr", "es"):
        stops = LANG_STOPS[lang]
        for _ in range(n_per_lang):
            words = [
                r.choice(stops) if r.random() < 0.35 else r.choice(_NEUTRAL_WORDS)
                for _ in range(r.randint(8, 24))
            ]
            out.append((" ".join(words), lang))
    for lang, pool in _SCRIPT_WORDS.items():
        for _ in range(n_per_lang):
            words = [r.choice(pool) for _ in range(r.randint(6, 16))]
            out.append((" ".join(words), lang))
    for _ in range(n_per_lang):
        words = [r.choice(_UND_WORDS) for _ in range(r.randint(8, 24))]
        out.append((" ".join(words), "und"))
    return out


def langid_eval_accuracy(
    spark: SparkSession, n_per_lang: int = 50, seed: int = 7
) -> dict[str, dict[str, float | int]]:
    """Per-language accuracy of :func:`lang_pred_col` on the constructed
    ground-truth corpus; {lang: {"n": ..., "acc": ...}}."""
    rows = langid_eval_corpus(n_per_lang, seed)
    df = spark.createDataFrame(rows, "text string, lang string")
    got = (
        df.select("lang", lang_pred_col().alias("pred"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("pred") == F.col("lang")).cast("long")).alias("hit"),
        )
        .collect()
    )
    return {
        r["lang"]: {"n": r["n"], "acc": round(r["hit"] / r["n"], 4)} for r in got
    }


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class + stopword heuristic language ID."""
    # round 6: regex/stopword map work runs at scan parallelism — one
    # split at the driver's sf1.0 corpus starved it to 1 core
    docs = respread(load(spark, sf_dir, "documents"))
    return docs.select("doc_id", "lang", lang_pred_col().alias("lang_pred"))


def _stop_count_sql(lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in LANG_STOPS[lang])
    return f"len(list_filter(string_split(text, ' '), w -> w IN ({inlist})))"


_C = {g: _stop_count_sql(g) for g in ("en", "de", "fr", "es")}
_M = f"greatest({_C['en']}, {_C['de']}, {_C['fr']}, {_C['es']})"

LANG_SQL = f"""
SELECT doc_id, lang,
  CASE
    WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
    WHEN regexp_matches(text, '[\\x{{0400}}-\\x{{04ff}}]') THEN 'ru'
    WHEN regexp_matches(text, '[\\x{{0600}}-\\x{{06ff}}]') THEN 'ar'
    WHEN {_M} > 0 THEN
      CASE
        WHEN {_C['en']} = {_M} THEN 'en'
        WHEN {_C['de']} = {_M} THEN 'de'
        WHEN {_C['fr']} = {_M} THEN 'fr'
        ELSE 'es'
      END
    ELSE 'und'
  END AS lang_pred
FROM documents
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / stopword-ratio / alpha-ratio quality heuristic.

    All three components are computed as DOUBLE with identical operation
    order in both engines, then rounded once at the end.
    """
    docs = respread(load(spark, sf_dir, "documents"))  # round 6, see lang_id
    n_words = F.size(F.split("text", " "))
    n_stop = F.size(
        F.filter(F.split("text", " "), lambda w: w.isin(list(STOPWORDS)))
    )
    n_chars = F.length("text")
    n_alpha = n_chars - F.length(F.regexp_replace("text", "[a-zA-Z]", ""))
    stop_ratio = n_stop.cast("double") / n_words
    alpha_ratio = n_alpha.cast("double") / F.greatest(n_chars, F.lit(1))
    quality = (
        F.least(n_words, F.lit(100)).cast("double") / 100 * 0.4
        + stop_ratio * 0.3
        + alpha_ratio * 0.3
    )
    # half-up via floor(x*1e6+0.5): floor on the (bit-identical) double
    # is exact in both engines, whereas round() differs on decimal ties
    # — Spark rounds the shortest decimal repr, DuckDB the binary value
    # (observed: quality exactly 0.5046875 -> 0.504688 vs 0.504687)
    def r6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        r6(stop_ratio).alias("stop_ratio"),
        r6(alpha_ratio).alias("alpha_ratio"),
        r6(quality).alias("quality"),
    )


QUALITY_SQL = f"""
SELECT doc_id,
  len(string_split(text, ' ')) AS n_words,
  floor(CAST(len(list_filter(string_split(text, ' '), w -> w IN ({_STOP_IN}))) AS DOUBLE)
        / len(string_split(text, ' ')) * 1e6 + 0.5) / 1e6 AS stop_ratio,
  floor(CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
        / greatest(length(text), 1) * 1e6 + 0.5) / 1e6 AS alpha_ratio,
  floor((CAST(least(len(string_split(text, ' ')), 100) AS DOUBLE) / 100 * 0.4
      + CAST(len(list_filter(string_split(text, ' '), w -> w IN ({_STOP_IN}))) AS DOUBLE)
        / len(string_split(text, ' ')) * 0.3
      + CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
        / greatest(length(text), 1) * 0.3) * 1e6 + 0.5) / 1e6 AS quality
FROM documents
"""


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    docs = respread(load(spark, sf_dir, "documents"))  # round 6, see lang_id
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), " +")).alias("n_ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{TOKEN_RE}', 0)")).alias(
            "n_re_tokens"
        ),
    )


TOKEN_SQL = f"""
SELECT doc_id,
  len(string_split_regex(trim(text), ' +')) AS n_ws_tokens,
  len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_re_tokens
FROM documents
"""


# --- TF-IDF keyword extraction (round 5) -------------------------------------
# Classic distinctive-term extraction over the corpus: per document the
# TOP_TERMS highest-scoring terms by term frequency x inverse document
# frequency.  Used in training pipelines for topic tagging, cluster
# labeling, and per-domain vocabulary audits.
#
# Exactness discipline: the usual ln((N+1)/(df+1)) idf would introduce
# the FIRST transcendental into the parity surface — Java's Math.log
# and DuckDB's libm log are not guaranteed the same last ulp, and a
# tie-adjacent score could rank differently per engine.  We rank by
# the RATIONAL idf variant instead: score_scaled = tf * (N+1) * 1e6
# div (df+1) — pure 64-bit integer arithmetic, bit-identical in both
# engines, and a strictly monotone transform of tf * (N+1)/(df+1), so
# the top-k SET and ORDER match what the ratio-idf ranking gives.
#
# Scale shape (100 TB): tf is a partial-agg groupBy on (doc, term);
# df is a frameless count window OVER term on the tf table — measured
# against the groupBy(term)+join-back form, the window moves the SAME
# tf rows through the same term exchange but deletes a whole corpus
# re-scan (the shared-subtree reuse broke when AQE broadcast one side;
# 6 FileScans -> 2) and the join itself; a Zipf-hot term's window
# partition is at most one row per containing doc (already tf-reduced)
# and count-only, which WindowExec spills fine.  The top-k window
# partitions by doc_id (bounded by per-doc vocabulary).  N arrives by
# broadcasting a one-row count-only aggregate — no collect, no driver
# loop.
TOP_TERMS = 3


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TOP_TERMS`` terms per document by the rational-idf TF-IDF
    score (ties: term ascending); score reported at 6 dp."""
    from pyspark.sql.window import Window

    from doc_ocr_spark.operators import respread

    docs = load(spark, sf_dir, "documents")
    terms = respread(docs).select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score_scaled",
            F.expr("tf * (n_docs + 1) * 1000000 div (df + 1)"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_scaled").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_TERMS)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("score_scaled").cast("double") / F.lit(1e6)).alias("score"),
            "rank",
        )
    )


TFIDF_SQL = f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms
  WHERE term <> '' GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, df,
         tf * (n_docs + 1) * 1000000 // (df + 1) AS score_scaled
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df,
       CAST(score_scaled AS DOUBLE) / 1e6 AS score, rank
FROM (
  SELECT doc_id, term, tf, df, score_scaled,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY score_scaled DESC, term
         ) AS rank
  FROM scored
) WHERE rank <= {TOP_TERMS}
"""

ORACLES = {
    "lang_id": LANG_SQL,
    "quality_score": QUALITY_SQL,
    "token_count": TOKEN_SQL,
    "tfidf_top_terms": TFIDF_SQL,
}

QUERIES = {
    "lang_id": lang_id,
    "quality_score": quality_score,
    "token_count": token_count,
    "tfidf_top_terms": tfidf_top_terms,
}
