"""Text-analysis operators for training-data pipelines: tokenization,
document stats / quality scoring, language ID, fingerprinting.

All pure built-in column expressions (whole-stage codegen; no Python in
the hot path), each with a DuckDB-SQL twin generated from the same
constants so the oracle can't drift from the implementation.

Scale notes: every operator here is a narrow map over the documents
table — no shuffle at all; Catalyst pushes the needed-columns-only
projection into the parquet scan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window

from spark_indexedrdd_spark.localframe import local_rows_df
from pyspark.sql import functions as F
from spark_indexedrdd_spark.checkpoint import truncate_lineage

# Stopword profiles for the language-ID heuristic. Deterministic,
# engine-agnostic: score(lang) = #tokens in profile; argmax with
# lexicographic-lang tiebreak.
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"],
    "en": ["the", "a", "of", "to", "and", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"],
}

STOPWORDS = LANG_PROFILES["en"]

# BPE-ish subword token estimate: runs of letters, digits, or single
# non-space symbols — a deterministic proxy for tokenizer counts.
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens, lowercased, empties removed (leading/trailing
    whitespace would otherwise produce '' in both engines)."""
    return F.filter(
        F.split(F.lower(F.trim(text)), "\\s+"), lambda t: t != F.lit("")
    )


def sql_tokens(text: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower(trim({text})), '\\s+'),"
        f" t -> t <> '')"
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics + quality score.

    Columns: n_chars, n_tokens, n_bpe_tokens (regex-estimated subwords),
    avg_token_len, uniq_token_ratio, stopword_ratio, quality (composite).
    All ratios are double divisions of exact integer counts —
    bit-identical across engines. Tokens are materialized below the
    stats projection (the `_tokenized` fence rationale: the projection
    holds HOFs, so it is CodegenFallback with no CSE, and the ~7
    references to the tokens expression would each re-split the
    text)."""
    tk = df.select(
        F.col(id_col), F.col(text_col), tokens(F.col(text_col)).alias("__t")
    )
    toks = F.col("__t")
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    # regexp_count, not size(regexp_extract_all): counting matches
    # without materializing the match array — the array allocation was
    # the r7 bench's only >2x-vs-r1 regression (0.21 s -> 0.47 s when
    # BPE counting was added); both run JVM-side, this one just doesn't
    # build |matches| strings per document to throw them away
    n_bpe = F.regexp_count(F.lower(F.col(text_col)), F.lit(BPE_REGEX))
    total_tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return tk.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
        (
            total_tok_chars.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
        ).alias("avg_token_len"),
        (
            n_uniq.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
        ).alias("uniq_token_ratio"),
        (
            n_stop.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
        ).alias("stopword_ratio"),
    )


def sql_text_stats(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    t = sql_tokens(text_col)
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
        WITH base AS (
            SELECT {id_col}, {text_col},
                   {t} AS toks,
                   regexp_extract_all(lower({text_col}), '{BPE_REGEX}') AS bpe
            FROM {table}
        )
        SELECT {id_col},
               CAST(length({text_col}) AS BIGINT) AS n_chars,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(bpe) AS BIGINT) AS n_bpe_tokens,
               CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                   / CAST(greatest(len(toks), 1) AS DOUBLE) AS avg_token_len,
               CAST(len(list_distinct(toks)) AS DOUBLE)
                   / CAST(greatest(len(toks), 1) AS DOUBLE) AS uniq_token_ratio,
               CAST(len(list_filter(toks, x -> x IN ({stop_list}))) AS DOUBLE)
                   / CAST(greatest(len(toks), 1) AS DOUBLE) AS stopword_ratio
        FROM base
    """


# Quality-filter thresholds (Gopher-style heuristics, simplified to the
# stats we compute; shared constants keep Spark and SQL twins in sync).
QF_MIN_TOKENS = 10
QF_MAX_TOKENS = 100_000
QF_MIN_AVG_TOKEN_LEN = 2.0
QF_MAX_AVG_TOKEN_LEN = 12.0
QF_MIN_UNIQ_RATIO = 0.1


def quality_filter(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Training-data quality gate: per-doc keep/drop decision with the
    first failing reason. Pure column logic over text_stats — one narrow
    pass, no shuffle."""
    stats = text_stats(df, text_col, id_col)
    reason = (
        F.when(F.col("n_tokens") < QF_MIN_TOKENS, "too_few_tokens")
        .when(F.col("n_tokens") > QF_MAX_TOKENS, "too_many_tokens")
        .when(F.col("avg_token_len") < QF_MIN_AVG_TOKEN_LEN, "avg_token_too_short")
        .when(F.col("avg_token_len") > QF_MAX_AVG_TOKEN_LEN, "avg_token_too_long")
        .when(F.col("uniq_token_ratio") < QF_MIN_UNIQ_RATIO, "too_repetitive")
        .otherwise("ok")
    )
    return stats.select(
        F.col(id_col),
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


def sql_quality_filter(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    return f"""
        WITH stats AS ({sql_text_stats(table, text_col, id_col)}),
        r AS (
            SELECT {id_col},
                   CASE WHEN n_tokens < {QF_MIN_TOKENS} THEN 'too_few_tokens'
                        WHEN n_tokens > {QF_MAX_TOKENS} THEN 'too_many_tokens'
                        WHEN avg_token_len < {QF_MIN_AVG_TOKEN_LEN} THEN 'avg_token_too_short'
                        WHEN avg_token_len > {QF_MAX_AVG_TOKEN_LEN} THEN 'avg_token_too_long'
                        WHEN uniq_token_ratio < {QF_MIN_UNIQ_RATIO} THEN 'too_repetitive'
                        ELSE 'ok' END AS reason
            FROM stats
        )
        SELECT {id_col}, reason, reason = 'ok' AS keep FROM r
    """


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: stopword-profile hit counts, argmax with
    lexicographic tiebreak (deterministic in both engines)."""
    toks = tokens(F.col(text_col))

    def _hits(words: list[str]):
        # closure factory: a default-arg lambda would have arity 2 and
        # PySpark would bind the second param to the array index
        return F.size(F.filter(toks, lambda t: t.isin(words)))

    scores = [
        _hits(words).alias(f"score_{lang}")
        for lang, words in sorted(LANG_PROFILES.items())
    ]
    scored = df.select(F.col(id_col), *scores)
    # argmax via greatest + chained when (ties -> lexicographically first)
    langs = sorted(LANG_PROFILES)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = None
    for lang in langs:
        cond = F.col(f"score_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return scored.select(
        F.col(id_col),
        *[F.col(f"score_{lang}").cast("long") for lang in langs],
        pred.alias("pred_lang"),
    )


def sql_lang_id(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    t = sql_tokens(text_col)
    langs = sorted(LANG_PROFILES)
    score_exprs = ",\n               ".join(
        f"CAST(len(list_filter(toks, x -> x IN ({', '.join(repr(w) for w in LANG_PROFILES[lang])}))) AS BIGINT) AS score_{lang}"
        for lang in langs
    )
    best = f"greatest({', '.join(f'score_{lang}' for lang in langs)})"
    case = "CASE " + " ".join(
        f"WHEN score_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
        WITH toksed AS (SELECT {id_col}, {t} AS toks FROM {table}),
        scored AS (
            SELECT {id_col},
               {score_exprs}
            FROM toksed
        )
        SELECT {id_col}, {', '.join(f'score_{lang}' for lang in langs)},
               {case} AS pred_lang
        FROM scored
    """


WINNOW_K = 3  # shingle size for winnowing (word k-grams)
WINNOW_W = 4  # window size: one fingerprint per w consecutive hashes


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS rolling-hash scheme): hash every word k-gram, then keep the
    minimum hash of each sliding window of w hashes. Guarantees any
    shared run of >= k+w-1 tokens between two documents shares a
    fingerprint — the standard local-similarity sketch.

    Pure per-row array transforms (shingle -> md5-derived int hash ->
    sliding-window min -> distinct) + one explode: no shuffle until the
    downstream groupBy/join a caller adds. Output: (doc_id, fp) rows.
    """
    toks = tokens(F.col(text_col))
    toked = df.select(F.col(id_col), toks.alias("__toks"))
    n = F.size(F.col("__toks"))
    mk = lambda i: F.concat_ws(  # noqa: E731  (column ref, not expr tree: HOF lambdas get no CSE)
        " ", *[F.element_at(F.col("__toks"), i + j) for j in range(WINNOW_K)]
    )
    grams = F.when(
        n >= WINNOW_K,
        F.transform(F.sequence(F.lit(1), n - (WINNOW_K - 1)), mk),
    ).otherwise(F.array().cast("array<string>"))
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
    )
    hashed = toked.select(F.col(id_col), hashes.alias("__hs"))
    hn = F.size(F.col("__hs"))
    wins = F.when(
        hn >= WINNOW_W,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), hn - (WINNOW_W - 1)),
                lambda i: F.array_min(F.slice(F.col("__hs"), i, WINNOW_W)),
            )
        ),
    ).otherwise(F.array_distinct(F.col("__hs")))  # short doc: keep all
    return hashed.select(F.col(id_col), F.explode(wins).alias("fp"))


def sql_winnow_fingerprints(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    t = sql_tokens(text_col)
    gram = " || ' ' || ".join(f"__toks[i + {j}]" for j in range(WINNOW_K))
    return f"""
        WITH toked AS (SELECT {id_col}, {t} AS __toks FROM {table}),
        hashed AS (
            SELECT {id_col},
                   CASE WHEN len(__toks) >= {WINNOW_K} THEN
                       list_transform(range(1, len(__toks) - {WINNOW_K - 2}),
                           i -> ('0x' || substr(md5({gram}), 1, 8))::BIGINT)
                   ELSE [] END AS __hs
            FROM toked
        ),
        winnowed AS (
            SELECT {id_col},
                   CASE WHEN len(__hs) >= {WINNOW_W} THEN
                       list_distinct(list_transform(range(1, len(__hs) - {WINNOW_W - 2}),
                           i -> list_min(__hs[i : i + {WINNOW_W - 1}])))
                   ELSE list_distinct(__hs) END AS fps
            FROM hashed
        )
        SELECT {id_col}, UNNEST(fps) AS fp FROM winnowed
    """


# PII patterns (shared constants: Spark and DuckDB twins can't drift).
# Both engines use RE2-ish syntax for these classes; no lookbehind.
PII_PATTERNS: list[tuple[str, str]] = [
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\+?[0-9][0-9()\\- ]{7,}[0-9]", "<PHONE>"),
    ("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
]


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Training-data scrubbing: replace emails / phone numbers / IPv4s
    with typed placeholder tokens. Chained regexp_replace — JVM regex,
    one narrow pass, order fixed (email first so phone can't eat one).
    Returns (doc_id, clean_text, n_redactions)."""
    clean = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    n_red = sum(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        for pat, _ in PII_PATTERNS
    )
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_red.cast("long").alias("n_redactions"),
    )


def sql_redact_pii(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    clean = text_col
    counts = []
    for pat, repl in PII_PATTERNS:
        sq = pat.replace("'", "''")
        clean = f"regexp_replace({clean}, '{sq}', '{repl}', 'g')"
        counts.append(f"len(regexp_extract_all({text_col}, '{sq}'))")
    n = " + ".join(counts)
    return f"""
        SELECT {id_col}, {clean} AS clean_text,
               CAST({n} AS BIGINT) AS n_redactions
        FROM {table}
    """


# Benchmark-contamination probes: fixed strings standing in for eval-set
# items; real pipelines load these from the benchmark corpora.
CONTAMINATION_PROBES: list[str] = [
    "key agg row scan slow fast table value part hash",
    "batch window spark order data column agg join small line",
    "this exact phrase appears in no training document at all",
]


def contamination_check(
    df: DataFrame,
    probes: list[str] | None = None,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-decontamination: flag documents sharing >= min_shared
    word shingles with any probe text (an eval-set item). The probe
    shingle set is tiny -> broadcast; the corpus side is the shingle
    explosion (no shuffle until the count agg). Output:
    (doc_id, probe_id, shared_shingles)."""
    from spark_indexedrdd_spark.functions.dedup import shingle_array, shingles

    spark = df.sparkSession
    probes = probes if probes is not None else CONTAMINATION_PROBES
    probe_df = local_rows_df(
        spark, [(i, p) for i, p in enumerate(probes)],
        "probe_id int, text string",
    )
    # tiny frame (a few probe rows): materialize tokens first anyway so
    # the shingle construction matches shingles()/sql twins exactly
    probe_toked = probe_df.select(
        "probe_id", tokens(F.col("text")).alias("__toks")
    )
    probe_sh = F.broadcast(
        probe_toked.select(
            "probe_id",
            F.explode(shingle_array(F.col("__toks"))).alias("shingle"),
        )
    )
    doc_sh = shingles(df, text_col, id_col)
    return (
        doc_sh.join(probe_sh, "shingle")
        .groupBy(id_col, "probe_id")
        .agg(F.count("*").cast("long").alias("shared_shingles"))
        .where(F.col("shared_shingles") >= min_shared)
    )


def sql_contamination_check(
    probes: list[str] | None = None,
    min_shared: int = 2,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    from spark_indexedrdd_spark.functions.dedup import sql_shingle_list, sql_shingles

    probes = probes if probes is not None else CONTAMINATION_PROBES
    vals = ", ".join(
        f"({i}, '{p.replace(chr(39), chr(39)*2)}')" for i, p in enumerate(probes)
    )
    return f"""
        WITH probe(probe_id, text) AS (VALUES {vals}),
        probe_sh AS (
            SELECT probe_id, UNNEST({sql_shingle_list()}) AS shingle
            FROM (SELECT probe_id, {sql_tokens('text')} AS __toks FROM probe)
        ),
        doc_sh AS ({sql_shingles(table, text_col, id_col)})
        SELECT d.{id_col}, p.probe_id,
               CAST(COUNT(*) AS BIGINT) AS shared_shingles
        FROM doc_sh d JOIN probe_sh p USING (shingle)
        GROUP BY d.{id_col}, p.probe_id
        HAVING COUNT(*) >= {min_shared}
    """


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: md5 of the whitespace-normalized lowered
    text (robust to formatting), plus a 32-bit rolling-hash-style value
    derived from the digest (hex -> int) for compact storage."""
    norm = F.concat_ws(" ", tokens(F.col(text_col)))
    digest = F.md5(norm)
    return df.select(
        F.col(id_col),
        digest.alias("fp_md5"),
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long").alias("fp32"),
    )


def sql_fingerprint(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    t = sql_tokens(text_col)
    return f"""
        WITH n AS (
            SELECT {id_col}, md5(array_to_string({t}, ' ')) AS fp_md5 FROM {table}
        )
        SELECT {id_col}, fp_md5,
               CAST(('0x' || substr(fp_md5, 1, 8))::BIGINT AS BIGINT) AS fp32
        FROM n
    """


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.9,
    valid: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """Deterministic train/valid/test split by content-independent hash
    of the document id — the split a 100 TB pipeline needs: stable under
    re-runs, re-partitioning, and incremental appends (a doc's split
    never changes), with no sampling state. bucket = first 8 hex chars of
    md5(seed||id) as a uniform [0,1) draw; pure JVM expressions.

    Returns (id, bucket, split). Cross-engine exact: the md5 hex prefix
    and the integer-to-double division are identical in DuckDB."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    bucket = (h / F.lit(float(1 << 32))).alias("bucket")
    split = (
        F.when(F.col("bucket") < train, "train")
        .when(F.col("bucket") < train + valid, "valid")
        .otherwise("test")
        .alias("split")
    )
    return df.select(F.col(id_col), bucket).select(id_col, "bucket", split)


def sql_hash_split(
    table: str = "documents",
    id_col: str = "doc_id",
    train: float = 0.9,
    valid: float = 0.05,
    seed: int = 42,
) -> str:
    return f"""
        SELECT {id_col}, bucket,
               CASE WHEN bucket < {train} THEN 'train'
                    WHEN bucket < {train + valid} THEN 'valid'
                    ELSE 'test' END AS split
        FROM (
            SELECT {id_col},
                   CAST(('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE) / 4294967296.0 AS bucket
            FROM {table}
        )
    """


def hash_sample(
    df: DataFrame,
    rate: float = 0.1,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic sample by id-hash threshold — the eval-slice /
    debugging sample a 100 TB pipeline needs: stable under re-runs,
    repartitioning, and incremental appends (a doc is in or out forever,
    per seed), composable with :func:`hash_split` (different seeds give
    independent draws). Unlike ``df.sample()`` there is no sampler state
    and no rand() — just a pure row-level predicate evaluated inside the
    scan stage's codegen (no shuffle, no extra pass; the md5 itself
    cannot reach parquet's PushedFilters, only plain comparisons can).
    Keeps ALL columns."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return df.where(h / F.lit(float(1 << 32)) < F.lit(float(rate)))


def sql_hash_sample(
    table: str = "documents",
    rate: float = 0.1,
    id_col: str = "doc_id",
    seed: int = 42,
) -> str:
    return f"""
        SELECT * FROM {table}
        WHERE CAST(('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE) / 4294967296.0 < {rate}
    """


def pack_documents(
    df: DataFrame,
    capacity_chars: int = 8000,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """Context-window packing: assign documents to fixed-capacity bins
    per (lang, source) stream. The SQL-expressible single-pass form:
    bin = floor(cumulative_size_before_doc / capacity) over a
    deterministic doc order — each bin holds consecutive docs and
    overflows by at most one document past capacity (the standard
    streaming approximation of greedy first-fit; exact greedy is
    inherently sequential). One shuffle on the stream key; the cumsum is
    computed inside each stream's sorted frame."""
    w = (
        Window.partitionBy("lang", "source")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0)).alias("cum_before")
    return (
        df.select("lang", "source", F.col(id_col), F.col(size_col), cum_before)
        .withColumn(
            "pack_id", F.floor(F.col("cum_before") / capacity_chars).cast("long")
        )
        .select("lang", "source", id_col, size_col, "pack_id")
    )


def sql_pack_documents(
    table: str = "documents",
    capacity_chars: int = 8000,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> str:
    return f"""
        SELECT lang, source, {id_col}, {size_col},
               CAST(FLOOR(COALESCE(SUM({size_col}) OVER (
                   PARTITION BY lang, source ORDER BY {id_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {capacity_chars}) AS BIGINT) AS pack_id
        FROM {table}
    """


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals — the Gopher-style filters that
    catch boilerplate/generated text where simple length/stopword checks
    pass: (doc_id, n_tokens, dup_bigram_frac, dup_trigram_frac,
    repetition_flag). dup_ngram_frac = 1 - distinct n-grams / n-grams;
    high values mean the document keeps repeating the same phrases
    (public heuristic: Rae et al. 2021 "Scaling Language Models" §A1.2,
    also C4's boilerplate filters).

    Scale: pure per-row array expressions (n-gram construction via
    slice+zip_with, distinct via array_distinct) — a narrow map inside
    the scan stage, no shuffle, no UDF. Exact-ratio arithmetic, so the
    DuckDB twin is bit-identical. Tokens are materialized behind the
    ``_tokenized`` fence: HOF projections are CodegenFallback
    (interpreted, no CSE), so the ~6 references to the tokens
    expression re-tokenized each row 6× — measured 3.2 s → 1.2 s at
    sf0.1 with the fence, identical values."""
    tk = _tokenized(df, text_col, id_col)
    toks = F.col("__t")
    n = F.size(toks)

    def ngram_array(width: int) -> Column:
        # n-grams by zipping shifted slices: [t0..tn-2] x [t1..tn-1]
        grams = F.slice(toks, 1, F.greatest(n - (width - 1), F.lit(0)))
        for off in range(1, width):
            grams = F.zip_with(
                grams,
                F.slice(toks, 1 + off, F.greatest(n - (width - 1), F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        return grams

    # Two more projection fences (same device as the `_tokenized` one
    # above): the gram arrays are referenced 3x each (two sizes + the
    # distinct) and the dup fractions 2x each (value column + flag) —
    # inlined, the interpreted zip_with chain re-built every gram array
    # 6x per row. CollapseProject keeps both fences (non-cheap aliases,
    # multiply referenced); values are bit-identical.
    g = tk.select(
        F.col(id_col),
        n.cast("int").alias("n_tokens"),
        ngram_array(2).alias("__g2"),
        ngram_array(3).alias("__g3"),
    )

    def dup_frac(grams: Column) -> Column:
        n_grams = F.size(grams)
        return F.when(
            n_grams <= 0, F.lit(0.0)
        ).otherwise(
            1.0 - F.size(F.array_distinct(grams)) / n_grams.cast("double")
        )

    d = g.select(
        F.col(id_col),
        "n_tokens",
        dup_frac(F.col("__g2")).alias("__d2"),
        dup_frac(F.col("__g3")).alias("__d3"),
    )
    return d.select(
        F.col(id_col),
        "n_tokens",
        F.col("__d2").alias("dup_bigram_frac"),
        F.col("__d3").alias("dup_trigram_frac"),
        ((F.col("__d2") > 0.2) | (F.col("__d3") > 0.18)).alias(
            "repetition_flag"
        ),
    )


def sql_repetition_stats(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`repetition_stats` — same n-gram
    construction (list_transform over an index range), same exact-ratio
    arithmetic, same flag thresholds."""
    toks = sql_tokens(text_col)

    def gram(width: int) -> str:
        parts = " || ' ' || ".join(
            f"t[i + {off}]" if off else "t[i]" for off in range(width)
        )
        return (
            f"list_transform(range(1, greatest(len(t) - {width - 1}, 0) + 1),"
            f" i -> {parts})"
        )

    def dup_frac(width: int) -> str:
        g = gram(width)
        return f"""
            CASE WHEN len({g}) <= 0 THEN 0.0
                 ELSE 1.0 - len(list_distinct({g})) / CAST(len({g}) AS DOUBLE)
            END
        """

    return f"""
        WITH tk AS (SELECT {id_col}, {toks} AS t FROM {table})
        SELECT {id_col},
               CAST(len(t) AS INTEGER) AS n_tokens,
               {dup_frac(2)} AS dup_bigram_frac,
               {dup_frac(3)} AS dup_trigram_frac,
               (({dup_frac(2)}) > 0.2 OR ({dup_frac(3)}) > 0.18) AS repetition_flag
        FROM tk
    """


def domain_cap_sample(
    df: DataFrame,
    cap: int = 100,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """At most ``cap`` documents per domain, chosen by a deterministic
    hash order — the standard web-corpus defense against a single crawl
    domain dominating the training mix. Hash order (not id order) so the
    kept set is an unbiased per-domain sample, yet stable across re-runs
    and incremental appends; ties broken by id. Emits the kept rows'
    (domain, doc_id, domain_rank).

    Scale: one shuffle on the domain column (the window's partition
    key). A pathologically hot domain makes one big partition, but the
    rank predicate truncates it at ``cap`` — WindowGroupLimit pushes the
    rank<=cap cutoff below the exchange (partial mode), so the shuffle
    carries at most cap rows per domain per map task, not the whole
    domain. The ordering hash is the same md5-of-id used by
    hash_sample/weighted_sample — engine-identical and safe for
    arbitrarily large ids (a Knuth multiplicative ``id * 2654435761``
    was tried first and overflows BIGINT past id ≈ 3.5e9, which under
    Spark 4's default ANSI mode is a runtime error, not a wrap)."""
    order_h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = Window.partitionBy(domain_col).orderBy(order_h.asc(), F.col(id_col).asc())
    return (
        df.select(
            F.col(domain_col).alias("domain"),
            F.col(id_col),
            F.row_number().over(w).alias("domain_rank"),
        )
        .where(F.col("domain_rank") <= cap)
    )


def sql_domain_cap_sample(
    table: str = "documents",
    cap: int = 100,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    return f"""
        SELECT domain, {id_col}, domain_rank FROM (
            SELECT {domain_col} AS domain, {id_col},
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY {domain_col}
                       ORDER BY ('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT,
                                {id_col}
                   ) AS INTEGER) AS domain_rank
            FROM {table}
        ) WHERE domain_rank <= {cap}
    """


def corpus_top_terms(
    df: DataFrame, k: int = 50, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level term frequencies: the k most frequent tokens with
    counts and corpus share — the vocabulary health-check (tokenizer
    coverage, boilerplate discovery) run once per ingest. Deterministic:
    ties rank by term.

    Scale: explode is a narrow per-row flatMap; the groupBy(term) agg
    does map-side partial aggregation, so its shuffle carries at most
    |vocab| rows per map task, not |corpus tokens|. The aggregated
    vocab is then localCheckpoint'ed (millions of types ≈ 100 MB —
    block-manager sized, NOT corpus sized), so its two consumers — the
    tiny grand-total aggregate and the top-k rank — read the
    materialized counts instead of re-running the corpus scan (Spark
    does not reuse the exchange across consumers — measured). The
    grand total (two-phase aggregate: partial per partition, then a
    |partitions|-row final) broadcasts back onto the k result rows,
    and the rank-filter collapses to TakeOrderedAndProject(limit=k) —
    map-side top-k per partition, so the final ordering task and the
    k-row rank window see at most |partitions|·k rows. No
    unpartitioned window ever sees the full vocabulary (the r7-flagged
    single-partition WindowExec for the total sum is gone;
    plan-asserted in tests/test_plans.py).
    Degenerate vocabularies (billions of types from URLs/hashes)
    should be cleaned upstream (quality_filter / repetition_stats)
    before corpus statistics; that is pipeline order, not an operator
    knob."""
    terms = df.select(F.explode(tokens(F.col(text_col))).alias("term"))
    counts = (
        terms.groupBy("term")
        .agg(F.count("*").alias("n"))
        .transform(truncate_lineage)
    )
    total = counts.agg(F.sum("n").cast("long").alias("total"))
    w = Window.orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .join(F.broadcast(total))
        .select(
            "term",
            F.col("n").cast("long").alias("n"),
            (F.col("n") / F.col("total").cast("double")).alias("corpus_share"),
            F.col("rank").cast("int"),
        )
    )


def sql_corpus_top_terms(
    table: str = "documents", k: int = 50, text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    toks = sql_tokens(text_col)
    return f"""
        WITH t AS (
            SELECT unnest({toks}) AS term FROM {table}
        ),
        counts AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY term
        ),
        ranked AS (
            SELECT term, n,
                   n / CAST((SELECT SUM(n) FROM counts) AS DOUBLE) AS corpus_share,
                   CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS INTEGER) AS rank
            FROM counts
        )
        SELECT term, n, corpus_share, rank FROM ranked WHERE rank <= {k}
    """


def temperature_sample(
    df: DataFrame,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Temperature-based language rebalancing (public recipe: XLM-R /
    mT5 corpus mixing): sampling probability per language ∝ (n_l)^alpha,
    scaled so the expected kept fraction of the corpus is
    ``budget_frac``. alpha<1 flattens the language distribution (upweights
    low-resource languages relative to their share); alpha=1 is
    proportional (plain uniform sampling); per-language rates cap at 1.0
    (a language cannot be sampled above its size — the standard
    truncation, which makes the realized total land slightly under
    budget when a rate saturates).

    Membership is the deterministic id-hash threshold of
    :func:`hash_sample` — stable under re-runs, repartitioning, and
    appends. Output: (doc_id, lang, rate) for KEPT rows.

    Scale: one tiny groupBy(lang) count (map-side combined, |langs|
    rows), broadcast back onto the corpus; the keep predicate is then a
    narrow per-row filter inside the scan stage. Cross-engine note: the
    rate involves pow(), whose last ulp is not guaranteed identical
    across libm builds — rates are ROUNDed to 12 decimals on BOTH
    engines before the threshold comparison (same collapse trick as the
    fast cosine path), so the kept set hash-matches."""
    counts = df.groupBy(lang_col).agg(F.count("*").alias("__n"))
    tot = Window.partitionBy()
    rates = counts.select(
        F.col(lang_col),
        F.round(
            F.least(
                F.lit(1.0),
                (
                    F.lit(float(budget_frac))
                    * F.sum("__n").over(tot).cast("double")
                    * (
                        F.pow(F.col("__n").cast("double"), float(alpha))
                        / F.sum(
                            F.pow(F.col("__n").cast("double"), float(alpha))
                        ).over(tot)
                    )
                )
                / F.col("__n").cast("double"),
            ),
            12,
        ).alias("rate"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        df.select(id_col, lang_col)
        .join(F.broadcast(rates), lang_col)
        .where(h / F.lit(float(1 << 32)) < F.col("rate"))
        .select(id_col, F.col(lang_col).alias("lang"), "rate")
    )


def sql_temperature_sample(
    table: str = "documents",
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
) -> str:
    return f"""
        WITH c AS (
            SELECT {lang_col}, CAST(COUNT(*) AS DOUBLE) AS n
            FROM {table} GROUP BY {lang_col}
        ),
        r AS (
            SELECT {lang_col},
                   ROUND(LEAST(1.0,
                       {float(budget_frac)} * (SELECT SUM(n) FROM c)
                       * (POW(n, {float(alpha)}) / (SELECT SUM(POW(n, {float(alpha)})) FROM c))
                       / n
                   ), 12) AS rate
            FROM c
        )
        SELECT d.{id_col}, d.{lang_col} AS lang, r.rate
        FROM {table} d JOIN r ON d.{lang_col} = r.{lang_col}
        WHERE CAST(('0x' || substr(md5('{seed}:' || CAST(d.{id_col} AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE) / 4294967296.0 < r.rate
    """


def dsir_select(
    df: DataFrame,
    target: Column,
    k: int = 200,
    n_buckets: int = 256,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169,
    "Data Selection for Language Models via Importance Resampling"):
    score every document by the log-likelihood ratio of its hashed
    n-gram features under a TARGET distribution vs the raw corpus, and
    keep the top-k — the standard way to skew a web-scale corpus toward
    a target domain without a learned classifier. ``target`` is a
    boolean Column over ``df``'s rows defining the in-domain slice
    (e.g. ``F.col('lang') == 'en'``); the paper's held-out target
    corpus is the same computation with the slice unioned in.

    Features: word unigrams + bigrams hashed into ``n_buckets`` buckets
    (paper §3.1's hashed n-grams; md5-derived bucket ids so both
    engines agree). Bucket distributions are add-``alpha`` smoothed;
    score(doc) = Σ_gram [ln p_target(bucket) − ln p_raw(bucket)].

    Determinism / oracle: counts are exact integers; the per-bucket
    log-ratio is ROUND(…, 9) (engines' ln may differ in the last ulp —
    same practice as similarity_topk_fast), and each document folds its
    OWN gram sequence over those rounded values (F.aggregate — order-
    deterministic, never a grouped float sum). Deterministic top-k
    (score desc, id) stands in for the paper's Gumbel resampling so the
    selection is reproducible and hash-checkable.

    Scale: one materialized pass tokenizes+hashes each doc (the count
    and scoring consumers would otherwise re-tokenize the corpus); raw
    and target counts come out of ONE explode pass (count + count_if in
    the same aggregate) shuffling ``n_buckets``-cardinality keys with
    map-side combine; the log-ratio
    table is ONE broadcast row of ``n_buckets`` doubles; scoring is a
    narrow fold; selection is orderBy+limit = TakeOrderedAndProject
    (per-partition k-heaps, no global sort or single-task window).

    Output: (doc_id, n_grams, dsir_score, rank), the k selected docs."""
    toks = tokens(F.col(text_col))
    tk = df.select(
        F.col(id_col), target.alias("__is_target"), toks.alias("__t")
    )
    t = F.col("__t")
    n = F.size(t)
    pair_len = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(t, 1, pair_len),
        F.slice(t, 2, pair_len),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(t, bigrams)
    bucket_of = lambda g: (  # noqa: E731 - tiny local expr builder
        F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).cast("int")
    docs_b = tk.select(
        F.col(id_col),
        "__is_target",
        F.transform(grams, bucket_of).alias("__b"),
    ).transform(truncate_lineage)

    # raw + target counts in ONE explode pass: ct = COUNT(rows where
    # __is_target) == count_if(__is_target) (count_if skips false AND
    # null exactly as the old .where() did), so one map-side-combined
    # aggregate replaces two full passes over the checkpointed arrays
    # and the grid joins once instead of twice (r14, guide §2.3).
    cnts = (
        docs_b.select(F.explode("__b").alias("bucket"), "__is_target")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cs"),
            F.count_if("__is_target").alias("ct"),
        )
    )
    spark = df.sparkSession
    grid = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    d = grid.join(cnts, "bucket", "left").select(
        "bucket",
        F.coalesce("cs", F.lit(0)).alias("cs"),
        F.coalesce("ct", F.lit(0)).alias("ct"),
    )
    wall = Window.partitionBy()
    a, ab = float(alpha), float(alpha) * n_buckets
    lr = F.round(
        F.log((F.col("ct") + a) / (F.sum("ct").over(wall) + ab))
        - F.log((F.col("cs") + a) / (F.sum("cs").over(wall) + ab)),
        9,
    )
    lr_row = d.select("bucket", lr.alias("v")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bucket", "v"))),
            lambda s: s["v"],
        ).alias("__lr")
    )
    scored = docs_b.crossJoin(F.broadcast(lr_row)).select(
        F.col(id_col),
        F.size("__b").alias("n_grams"),
        F.aggregate(
            F.col("__b"),
            F.lit(0.0),
            lambda acc, b: acc + F.element_at(F.col("__lr"), b + 1),
        ).alias("dsir_score"),
    )
    top = scored.orderBy(F.desc("dsir_score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("dsir_score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def sql_dsir_select(
    table: str = "documents",
    target_sql: str = "lang = 'en'",
    k: int = 200,
    n_buckets: int = 256,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Exact DuckDB twin of :func:`dsir_select` (same hashed buckets,
    same smoothing formula shape, ROUND(9) log-ratios, same per-doc
    fold order, same (score desc, id) top-k)."""
    t = sql_tokens(text_col)
    a, ab = float(alpha), float(alpha) * n_buckets
    return f"""
        WITH tk AS (
            SELECT {id_col}, ({target_sql}) AS is_target, {t} AS t
            FROM {table}
        ),
        b AS (
            SELECT {id_col}, is_target,
                   list_transform(
                       list_concat(
                           t,
                           list_transform(range(1, len(t)),
                                          i -> t[i] || ' ' || t[i + 1])
                       ),
                       g -> CAST(('0x' || substr(md5(g), 1, 8))::BIGINT
                                 % {n_buckets} AS INTEGER)
                   ) AS bks
            FROM tk
        ),
        src AS (
            SELECT u.bucket, COUNT(*) AS cs
            FROM (SELECT unnest(bks) AS bucket FROM b) u GROUP BY 1
        ),
        tgt AS (
            SELECT u.bucket, COUNT(*) AS ct
            FROM (SELECT unnest(bks) AS bucket FROM b WHERE is_target) u
            GROUP BY 1
        ),
        d AS (
            SELECT CAST(g.range AS INTEGER) AS bucket,
                   COALESCE(src.cs, 0) AS cs, COALESCE(tgt.ct, 0) AS ct
            FROM range({n_buckets}) g
            LEFT JOIN src ON src.bucket = g.range
            LEFT JOIN tgt ON tgt.bucket = g.range
        ),
        lr AS (
            SELECT bucket,
                   ROUND(ln((ct + {a}) / (SUM(ct) OVER () + {ab}))
                         - ln((cs + {a}) / (SUM(cs) OVER () + {ab})), 9) AS v
            FROM d
        ),
        lrarr AS (SELECT list(v ORDER BY bucket) AS arr FROM lr),
        scored AS (
            SELECT {id_col}, CAST(len(bks) AS INTEGER) AS n_grams,
                   CASE WHEN len(bks) = 0 THEN 0.0
                        ELSE list_reduce(
                            list_transform(bks, x -> arr[x + 1]),
                            (acc, v) -> acc + v)
                   END AS dsir_score
            FROM b CROSS JOIN lrarr
        )
        SELECT {id_col}, n_grams, dsir_score, rank FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (
                ORDER BY dsir_score DESC, {id_col} ASC) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def lm_cross_entropy(
    df: DataFrame,
    n_buckets: int = 65536,
    alpha: float = 1.0,
    flag_factor: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style language-model quality filtering (Wenzek et al.
    2020, arXiv:1911.00359 §3.3 — docs whose LM perplexity is far above
    the corpus norm are noise), with the KenLM model replaced by an
    IN-CORPUS hashed add-``alpha`` bigram model so the operator is
    self-contained and cross-engine exact: p(w2|w1) = (c(w1 w2) + α) /
    (c(w1) + αB) over md5-hashed buckets.

    Per doc: cross_entropy = −mean over its bigrams of ln p — the log
    of perplexity (exp is omitted: monotone, and engines' exp would
    reintroduce last-ulp drift). ``lm_flag`` marks documents whose
    cross-entropy exceeds ``flag_factor · ln(n_buckets)`` — near the
    uniform-model entropy, i.e. the corpus model finds the text
    unpredictable. Documents with no bigrams get NULL / unflagged.
    ``n_buckets`` must keep the bigram table SPARSE (buckets >> distinct
    corpus bigrams is ideal; saturated buckets make everything look
    predictable — measured: at B=256 on the test corpus a gibberish doc
    scored BELOW the norm); 65536 buckets is 512 KB of broadcast model
    and holds to ~10k-vocab corpora. DSIR's relative ratios don't need
    sparsity, hence its smaller default.

    Determinism (same playbook as :func:`dsir_select`): integer bucket
    counts; per-bucket ln terms ROUND(9); each document folds its own
    bigram sequence — never a grouped float sum. Plan shape: one
    tokenize+hash pass, two bucket-cardinality count aggregates, one
    broadcast row with the two ln-term arrays, then a narrow fold.

    Output: (doc_id, n_bigrams, cross_entropy, lm_flag)."""
    docs_b = _lm_buckets(df, n_buckets, text_col, id_col)
    cg = _bucket_counts(docs_b, "__g", "cg")
    cu = _bucket_counts(docs_b, "__u", "cu")
    return _lm_score(docs_b, cg, cu, n_buckets, alpha, flag_factor, id_col)


def _lm_buckets(
    df: DataFrame, n_buckets: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, __u unigram buckets, __g bigram buckets) — materialized once
    (multiple consumers would each re-tokenize the corpus)."""
    toks = tokens(F.col(text_col))
    tk = df.select(F.col(id_col), toks.alias("__t"))
    t = F.col("__t")
    n = F.size(t)
    pair_len = F.greatest(n - 1, F.lit(0))
    hist = F.slice(t, 1, pair_len)
    bigrams = F.zip_with(
        hist, F.slice(t, 2, pair_len),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bucket_of = lambda g: (  # noqa: E731
        F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).cast("int")
    return tk.select(
        F.col(id_col),
        F.transform(hist, bucket_of).alias("__u"),
        F.transform(bigrams, bucket_of).alias("__g"),
    ).transform(truncate_lineage)


def _bucket_counts(docs_b: DataFrame, col: str, name: str) -> DataFrame:
    return (
        docs_b.select(F.explode(col).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias(name))
    )


def _lm_score(
    docs_b: DataFrame,
    cg: DataFrame,
    cu: DataFrame,
    n_buckets: int,
    alpha: float,
    flag_factor: float,
    id_col: str,
) -> DataFrame:
    """Score (id, __u, __g) docs against bigram/unigram bucket counts
    ``cg``/``cu`` (columns (bucket, cg|cu)) — shared by the in-plan
    operator and the persisted-count-store path so both provably apply
    the same model arithmetic."""
    spark = docs_b.sparkSession
    a, ab = float(alpha), float(alpha) * n_buckets
    grid = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    d = (
        grid.join(cg, "bucket", "left")
        .join(cu, "bucket", "left")
        .select(
            "bucket",
            F.round(F.log(F.coalesce("cg", F.lit(0)) + a), 9).alias("lng"),
            F.round(F.log(F.coalesce("cu", F.lit(0)) + ab), 9).alias("lnu"),
        )
    )
    arrs = d.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bucket", "lng"))),
            lambda s: s["lng"],
        ).alias("__lng"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("bucket", "lnu"))),
            lambda s: s["lnu"],
        ).alias("__lnu"),
    )
    terms = F.zip_with(
        F.col("__g"), F.col("__u"),
        lambda g, u: F.element_at(F.col("__lng"), g + 1)
        - F.element_at(F.col("__lnu"), u + 1),
    )
    nb = F.size("__g")
    ce = F.when(
        nb > 0,
        -F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
        / nb.cast("double"),
    )
    thr = float(flag_factor) * math.log(n_buckets)
    return docs_b.crossJoin(F.broadcast(arrs)).select(
        F.col(id_col),
        nb.alias("n_bigrams"),
        ce.alias("cross_entropy"),
        (ce.isNotNull() & (ce > F.lit(thr))).alias("lm_flag"),
    )


# ------------------------------------------------------------------ #
# Persisted n-gram count store: the additive-state form of the hashed
# LM/DSIR models — counts are plain integers, so per-batch rows merge
# by SUM at read time (the counts analog of the HLL/KLL sketch store).
# ------------------------------------------------------------------ #


def write_ngram_count_store(
    df: DataFrame,
    path: str,
    n_buckets: int = 65536,
    text_col: str = "text",
    id_col: str = "doc_id",
    applied_tags: "tuple[str, ...]" = (),
) -> None:
    """Initialize the store with this batch's unigram+bigram bucket
    counts: rows (space 'u'|'g', bucket, c) at ``path/counts`` —
    ≤ 2·n_buckets rows per batch regardless of batch size — plus
    ``path/meta.json`` pinning n_buckets (mixing bucketizations would
    silently corrupt the model). Retract (rebuild case) → data → atomic
    meta commit: meta's existence is the store's commit marker, and
    retracting the OLD marker before an overwrite-mode rebuild means a
    crash at any point leaves the store clearly uncommitted rather
    than the old meta over half-overwritten counts
    (store_commit module docstring); the re-run is idempotent.
    ``applied_tags`` records the initializing batch's replay tag in
    the SAME atomic commit (the store-family convention), so a
    replayed batch 0 is a no-op like any later tagged append."""
    from spark_indexedrdd_spark.functions import store_commit as SC

    SC.retract_meta(path)
    _store_counts(df, n_buckets, text_col, id_col).write.mode(
        "overwrite"
    ).parquet(path + "/counts")
    SC.commit_meta(
        path,
        {
            "n_buckets": int(n_buckets),
            "applied": [str(t) for t in applied_tags],
        },
    )


def append_ngram_count_batch(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_tag: "str | None" = None,
) -> "bool":
    """Fold an ingest batch in (counts merge by SUM at read). n_buckets
    comes from the store's meta — never the caller.

    ``batch_tag=None`` is the legacy operator append: a plain parquet
    append under ``counts/`` (counts are additive, so a replayed
    UNTAGGED batch perturbs the model's counts statistically — the
    pre-r14 documented trade-off, kept for ad-hoc batch use).

    ``batch_tag`` given (r14) makes the append EXACTLY-ONCE, the same
    contract every other store-family writer has: the batch's count
    rows land under their own ``counts_tagged/tag=<tag>`` directory
    (overwrite mode — a crashed first attempt is simply rewritten),
    and only the atomic meta commit appending the tag to ``applied``
    publishes them; readers resolve tagged directories FROM the meta
    snapshot, so an uncommitted directory is invisible and a replayed
    committed tag is a no-op (returns False). Because the commit rides
    the OCC version ledger, every tagged append is also an as-of
    boundary: ``_read_counts(version=)`` serves the counts exactly as
    of any committed version — the reproducibility contract a DSIR/LM
    filtering run needs (score against the count model as of the
    training-data cut, regardless of later ingest)."""
    import json
    import os

    from spark_indexedrdd_spark.functions import store_commit as SC

    if batch_tag is None:
        with open(os.path.join(path, "meta.json")) as f:
            n_buckets = int(json.load(f)["n_buckets"])
        _store_counts(df, n_buckets, text_col, id_col).write.mode(
            "append"
        ).parquet(path + "/counts")
        return True
    SC.validate_batch_tag(batch_tag)
    meta = SC.read_meta(path)
    applied = meta.setdefault("applied", [])
    if SC.tag_is_applied(meta, batch_tag):
        return False  # at-least-once replay of a committed batch
    n_buckets = int(meta["n_buckets"])
    _store_counts(df, n_buckets, text_col, id_col).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "counts_tagged", f"tag={batch_tag}"))
    applied.append(batch_tag)
    SC.commit_meta(path, meta)  # <-- commit point publishes the tag
    return True


def compact_ngram_count_store(spark, path: str) -> int:
    """Fold every committed tagged directory (and any legacy untagged
    appends) into ONE base count file set — the count store's bounded-
    read maintenance op: under continuous tagged ingest the read-time
    merge unions one ≤2·n_buckets-row directory PER BATCH, so a year
    of micro-batches turns every model read into a 10^5-directory
    union; after compaction a read is one base scan again, and counts
    are byte-identical (integer SUM is associative — pytest-pinned).

    Swap protocol (the compact_postings_store pattern): the merged
    counts land in a SIBLING directory first, then retract →
    dir swap → ``commit_meta(rewrite=True)`` — a crash before the
    retract leaves the old store committed and untouched; inside the
    window, loudly uncommitted with the compacted copy recoverable on
    disk. The rewrite commit advances the servability floor, so as-of
    reads BELOW the compaction refuse loudly (their tagged directories
    are folded — the family's snapshots-survive-until-rewrite trade)
    while the replay ledger (``applied``) survives the fold: a
    redelivered pre-compaction batch is still a no-op. Returns the
    number of live (space, bucket) rows."""
    import os
    import shutil

    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.read_meta(path)
    merged, _ = _read_counts(spark, path)
    tmp = path + "__compact"
    shutil.rmtree(tmp, ignore_errors=True)
    # ≤ 2·n_buckets rows — one file reads fastest
    merged.coalesce(1).write.parquet(os.path.join(tmp, "counts"))
    n_rows = spark.read.parquet(os.path.join(tmp, "counts")).count()
    SC.retract_meta(path)  # loudly uncommitted through the swap
    old = os.path.join(path, "counts")
    shutil.rmtree(old, ignore_errors=True)
    shutil.move(os.path.join(tmp, "counts"), old)
    shutil.rmtree(os.path.join(path, "counts_tagged"), ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    # This family's `applied` list doubles as the live counts_tagged/
    # directory pointer, so it can only fold into per-checkpoint
    # watermarks HERE — the directories just merged into the base, so
    # post-compaction the list is a pure replay ledger again. Without
    # the fold, continuous streaming ingest grows meta by one tag per
    # micro-batch forever (compaction bounds the DIRECTORIES but the
    # vacuum-side fold is gated off this family exactly because of the
    # dual use). Replays of folded tags stay no-ops via tag_is_applied.
    SC.fold_applied_watermarks(meta)
    SC.commit_meta(path, meta, rewrite=True)  # floor advances
    return int(n_rows)


def _store_counts(
    df: DataFrame, n_buckets: int, text_col: str, id_col: str
) -> DataFrame:
    docs_b = _lm_buckets(df, n_buckets, text_col, id_col)
    u = _bucket_counts(docs_b, "__u", "c").withColumn("space", F.lit("u"))
    g = _bucket_counts(docs_b, "__g", "c").withColumn("space", F.lit("g"))
    return u.unionByName(g).select("space", "bucket", "c")


def _read_counts(
    spark, path: str, version: "int | None" = None
) -> "tuple[DataFrame, int]":
    """Merged (space, bucket, c) counts + n_buckets from ONE meta
    snapshot: the base/legacy files under ``counts/`` plus exactly the
    committed tagged directories the snapshot's ``applied`` list names
    — an uncommitted (crashed) tagged write is invisible, and
    ``version=`` serves the counts as of any committed ledger version
    (tagged appends after the snapshot are invisible; the base +
    legacy untagged appends predate the ledger and are part of every
    snapshot, the other stores' legacy-history caveat)."""
    import os

    from spark_indexedrdd_spark.functions import store_commit as SC

    meta = SC.resolve_serve_meta(path, version)
    n_buckets = int(meta["n_buckets"])
    counts = spark.read.parquet(path + "/counts")
    tagged_dirs = [
        os.path.join(path, "counts_tagged", f"tag={t}")
        for t in meta.get("applied", [])
        if os.path.isdir(os.path.join(path, "counts_tagged", f"tag={t}"))
    ]
    if tagged_dirs:
        counts = counts.unionByName(
            spark.read.parquet(*tagged_dirs).select("space", "bucket", "c")
        )
    merged = counts.groupBy("space", "bucket").agg(
        F.sum("c").cast("long").alias("c")
    )
    return merged, n_buckets


def lm_cross_entropy_from_store(
    df: DataFrame,
    path: str,
    alpha: float = 1.0,
    flag_factor: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    version: "int | None" = None,
) -> DataFrame:
    """Score NEW documents under the PERSISTED corpus model — the
    incremental-ingest form of :func:`lm_cross_entropy` (quality-gate a
    batch against the accumulated corpus without re-reading it). Same
    scoring core, so store-built-from-X scores exactly like in-plan
    over X (pytest-pinned). ``version=`` scores under the count model
    AS OF a committed ledger version (r14: tagged appends after the
    snapshot are invisible) — a training run pins the model it
    filtered with, like every other store serve."""
    spark = df.sparkSession
    merged, n_buckets = _read_counts(spark, path, version=version)
    docs_b = _lm_buckets(df, n_buckets, text_col, id_col)
    cg = merged.where("space = 'g'").select("bucket", F.col("c").alias("cg"))
    cu = merged.where("space = 'u'").select("bucket", F.col("c").alias("cu"))
    return _lm_score(docs_b, cg, cu, n_buckets, alpha, flag_factor, id_col)


from spark_indexedrdd_spark.functions.store_commit import (  # noqa: E402
    StreamTagMixin as _StreamTagMixin,
)


class StreamingNgramCountStore(_StreamTagMixin):
    """foreachBatch ingest for the n-gram count store: every store
    family ships a streaming twin (signatures, IVF, sketches, top-m,
    SCD2, counts). Counts are additive and the read merges by SUM, so
    per-batch appends need no read of existing state; a resumed stream
    appends to an existing store instead of re-initializing it.

    r14: appends carry the batch_id as a replay tag (the postings-twin
    convention — batch 0's tag lands in the initializing commit), so
    at-least-once redelivery of a committed batch is a true NO-OP
    rather than the pre-r14 statistical double-count, and every
    micro-batch is an as-of boundary for ``_read_counts(version=)``.

    Self-maintenance (the full streaming-store composition):
    ``compact_every=N`` folds the accumulated tagged directories into
    one base via :func:`compact_ngram_count_store` whenever N of them
    exist — bounded read-time merge under continuous ingest;
    ``vacuum_every=M`` rides the shared
    ``snapshots.LedgerVacuumCadence`` (full-interval re-arm, pin
    routing) to checkpoint the per-commit ledger — the store has no
    manifest-tracked data roots, so the cadence's vacuum is
    ledger-and-floor only, which is exactly what grows here."""

    def __init__(
        self,
        path: str,
        n_buckets: int = 65536,
        text_col: str = "text",
        id_col: str = "doc_id",
        compact_every: "int | None" = None,
        vacuum_every: "int | None" = None,
        keep_versions: int = 8,
        pin_tag_dir: "str | None" = None,
    ):
        import os

        self.path = path
        self.n_buckets = n_buckets
        self.text_col = text_col
        self.id_col = id_col
        self.compact_every = compact_every
        if vacuum_every is not None:
            from spark_indexedrdd_spark.functions.snapshots import (
                LedgerVacuumCadence,
            )

            self._vacuum = LedgerVacuumCadence(
                path, vacuum_every, keep_versions, pin_tag_dir
            )
        else:
            self._vacuum = None
        self._initialized = os.path.exists(os.path.join(path, "meta.json"))

    def foreach_batch(self, batch_df, batch_id: int) -> None:
        import os

        if not batch_df.take(1):
            return
        tag = self._stream_tag(f"b{batch_id}")
        if self._legacy_applied(self.path, f"b{batch_id}"):
            return
        if not self._initialized:
            write_ngram_count_store(
                batch_df, self.path, self.n_buckets, self.text_col,
                self.id_col, applied_tags=(tag,),
            )
            self._initialized = True
        else:
            append_ngram_count_batch(
                batch_df, self.path, self.text_col, self.id_col,
                batch_tag=tag,
            )
            if self.compact_every:
                tagged = os.path.join(self.path, "counts_tagged")
                n_dirs = (
                    len(os.listdir(tagged)) if os.path.isdir(tagged) else 0
                )
                if n_dirs >= int(self.compact_every):
                    compact_ngram_count_store(
                        batch_df.sparkSession, self.path
                    )
        if self._vacuum is not None:
            self._vacuum.maybe_vacuum()

    def attach(self, stream_df, checkpoint_dir: str, **trigger_kwargs):
        return self._start_stream(
            stream_df, checkpoint_dir, "update", **trigger_kwargs
        )


def dsir_scores_from_stores(
    df: DataFrame,
    raw_store: str,
    target_store: str,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    raw_version: "int | None" = None,
    target_version: "int | None" = None,
) -> DataFrame:
    """DSIR importance scores for NEW documents from two PERSISTED
    count stores — the paper's actual deployment shape (Xie et al.
    2023 §3): the target model comes from a held-out in-domain corpus
    (its own store), the raw model from the accumulated crawl, and
    neither corpus is re-read to score an ingest batch. Uses both
    hashed spaces (unigrams + bigrams) of the stores.
    ``raw_version=``/``target_version=`` (r14) pin each model AS OF a
    committed ledger version — the selection a training run made stays
    reproducible while both stores keep ingesting.

    score(doc) = Σ over its uni- and bigram buckets of
    [ln p_target(bucket) − ln p_raw(bucket)], each space's
    distribution add-``alpha`` smoothed over its own totals; per-bucket
    terms ROUND(9); per-doc sequential folds (the shared determinism
    playbook). The two stores must share a bucketization.

    Returns every scored doc (no top-k — the caller composes selection
    with the batch's own budget): (doc_id, n_grams, dsir_score)."""
    spark = df.sparkSession
    raw, n_raw = _read_counts(spark, raw_store, version=raw_version)
    tgt, n_tgt = _read_counts(spark, target_store, version=target_version)
    if n_raw != n_tgt:
        raise ValueError(f"bucketization mismatch: {n_raw} vs {n_tgt}")
    n_buckets = n_raw
    a, ab = float(alpha), float(alpha) * n_buckets
    docs_b = _lm_buckets(df, n_buckets, text_col, id_col)
    grid = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    wall = Window.partitionBy()

    def lr_array(space: str, name: str):
        r = raw.where(F.col("space") == space).select(
            "bucket", F.col("c").alias("cr")
        )
        t = tgt.where(F.col("space") == space).select(
            "bucket", F.col("c").alias("ct")
        )
        d = (
            grid.join(r, "bucket", "left")
            .join(t, "bucket", "left")
            .select(
                "bucket",
                F.coalesce("cr", F.lit(0)).alias("cr"),
                F.coalesce("ct", F.lit(0)).alias("ct"),
            )
        )
        lr = F.round(
            F.log((F.col("ct") + a) / (F.sum("ct").over(wall) + ab))
            - F.log((F.col("cr") + a) / (F.sum("cr").over(wall) + ab)),
            9,
        )
        return d.select("bucket", lr.alias("v")).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bucket", "v"))),
                lambda s: s["v"],
            ).alias(name)
        )

    arrs = lr_array("u", "__lru").crossJoin(lr_array("g", "__lrg"))

    def fold(col: str, arr: str):
        return F.aggregate(
            F.col(col),
            F.lit(0.0),
            lambda acc, b: acc + F.element_at(F.col(arr), b + 1),
        )

    return docs_b.crossJoin(F.broadcast(arrs)).select(
        F.col(id_col),
        (F.size("__u") + F.size("__g")).alias("n_grams"),
        (fold("__u", "__lru") + fold("__g", "__lrg")).alias("dsir_score"),
    )


def corpus_kl_divergence(
    spark,
    path_a: str,
    path_b: str,
    alpha: float = 1.0,
) -> DataFrame:
    """Distribution drift between two n-gram count stores: KL(A‖B) and
    KL(B‖A) over the smoothed UNIGRAM bucket distributions — the
    vocabulary-level complement of the KLL quantile drift monitor
    (sketches.quantile_drift). Inputs are two count stores (≤ 2·B rows
    each), never the corpora. Deterministic: integer counts, per-bucket
    double terms folded in bucket order (one array fold — never a
    grouped float sum). Returns one row (kl_ab, kl_ba)."""
    ca, na = _read_counts(spark, path_a)
    cb, nb = _read_counts(spark, path_b)
    if na != nb:
        raise ValueError(f"bucketization mismatch: {na} vs {nb}")
    a = float(alpha)
    grid = spark.range(na).select(F.col("id").cast("int").alias("bucket"))
    d = (
        grid.join(
            ca.where("space = 'u'").select("bucket", F.col("c").alias("c_a")),
            "bucket", "left",
        )
        .join(
            cb.where("space = 'u'").select("bucket", F.col("c").alias("c_b")),
            "bucket", "left",
        )
        .select(
            "bucket",
            (F.coalesce("c_a", F.lit(0)) + a).alias("sa"),
            (F.coalesce("c_b", F.lit(0)) + a).alias("sb"),
        )
    )
    wall = Window.partitionBy()
    pa = F.col("sa") / F.sum("sa").over(wall)
    pb = F.col("sb") / F.sum("sb").over(wall)
    terms = d.select(
        "bucket",
        (pa * F.round(F.log(pa) - F.log(pb), 9)).alias("t_ab"),
        (pb * F.round(F.log(pb) - F.log(pa), 9)).alias("t_ba"),
    )
    folded = terms.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bucket", "t_ab"))),
                lambda s: s["t_ab"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("kl_ab"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bucket", "t_ba"))),
                lambda s: s["t_ba"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("kl_ba"),
    )
    return folded


def sql_lm_cross_entropy(
    table: str = "documents",
    n_buckets: int = 65536,
    alpha: float = 1.0,
    flag_factor: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Exact DuckDB twin of :func:`lm_cross_entropy` (same buckets,
    ROUND-9 ln terms, identical per-doc fold sequence; the flag
    threshold is a Python-computed literal on both sides)."""
    t = sql_tokens(text_col)
    a, ab = float(alpha), float(alpha) * n_buckets
    thr = float(flag_factor) * math.log(n_buckets)
    bucket = (
        lambda g: f"CAST(('0x' || substr(md5({g}), 1, 8))::BIGINT"
        f" % {n_buckets} AS INTEGER)"
    )
    return f"""
        WITH tk AS (SELECT {id_col}, {t} AS t FROM {table}),
        b AS (
            SELECT {id_col},
                   list_transform(t[1:len(t) - 1], w -> {bucket('w')}) AS bu,
                   list_transform(range(1, len(t)),
                                  i -> {bucket("t[i] || ' ' || t[i + 1]")}) AS bg
            FROM tk
        ),
        cg AS (SELECT u.bucket, COUNT(*) AS c
               FROM (SELECT unnest(bg) AS bucket FROM b) u GROUP BY 1),
        cu AS (SELECT u.bucket, COUNT(*) AS c
               FROM (SELECT unnest(bu) AS bucket FROM b) u GROUP BY 1),
        d AS (
            SELECT CAST(g.range AS INTEGER) AS bucket,
                   ROUND(ln(COALESCE(cg.c, 0) + {a}), 9) AS lng,
                   ROUND(ln(COALESCE(cu.c, 0) + {ab}), 9) AS lnu
            FROM range({n_buckets}) g
            LEFT JOIN cg ON cg.bucket = g.range
            LEFT JOIN cu ON cu.bucket = g.range
        ),
        arrs AS (
            SELECT list(lng ORDER BY bucket) AS ag,
                   list(lnu ORDER BY bucket) AS au
            FROM d
        ),
        scored AS (
            SELECT {id_col}, CAST(len(bg) AS INTEGER) AS n_bigrams,
                   CASE WHEN len(bg) > 0 THEN
                       -list_reduce(
                           list_transform(range(1, len(bg) + 1),
                                          i -> ag[bg[i] + 1] - au[bu[i] + 1]),
                           (acc, x) -> acc + x
                       ) / CAST(len(bg) AS DOUBLE)
                   END AS cross_entropy
            FROM b CROSS JOIN arrs
        )
        SELECT {id_col}, n_bigrams, cross_entropy,
               (cross_entropy IS NOT NULL AND cross_entropy > {thr}) AS lm_flag
        FROM scored
    """


def weighted_sample(
    df: DataFrame,
    k: int = 100,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Weighted sample WITHOUT replacement of k rows, deterministic:
    Efraimidis–Spirakis (2006) one-pass reservoir keys — each row gets
    ``key = u^(1/w)`` with u a stable id-hash uniform in (0,1], and the
    k largest keys win. Inclusion probability is proportional to weight
    without replacement — the data-selection primitive for "keep the
    best k documents by quality score" (weights = quality/length/model
    scores). Rows with weight <= 0 are excluded (a zero-weight row can
    never win; documented rather than clamped).

    Determinism/oracle: u derives from the same md5 hash as
    :func:`hash_sample` (stable under re-runs/repartition/appends); the
    key is ROUNDed to 12 decimals on both engines before ranking (pow's
    last ulp is libm-dependent — same collapse as temperature_sample),
    ties break on id.

    Scale: narrow per-row key computation inside the scan; the global
    top-k window is WindowGroupLimit-pruned, so each map task ships only
    its local top-k — never a full sort, never a full shuffle.
    Output: (doc_id, weight, sample_rank)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    # (h+1)/2^32 ∈ (0, 1]: u=0 (log-singular in the classic form) is
    # impossible, and u=1 gives key=1 — fine under max-ranking
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 32))
    w = F.col(weight_col).cast("double")
    key = F.round(F.pow(u, F.lit(1.0) / w), 12)
    win = Window.orderBy(F.desc("__key"), F.asc(id_col))
    return (
        df.where(w > 0)
        .select(F.col(id_col), w.alias("weight"), key.alias("__key"))
        .withColumn("sample_rank", F.row_number().over(win))
        .where(F.col("sample_rank") <= k)
        .select(id_col, "weight", F.col("sample_rank").cast("int"))
    )


def sql_weighted_sample(
    table: str = "documents",
    k: int = 100,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: int = 42,
) -> str:
    u = (
        f"(CAST(('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE) + 1)"
        f" / 4294967296.0"
    )
    return f"""
        SELECT {id_col}, weight, sample_rank FROM (
            SELECT {id_col},
                   CAST({weight_col} AS DOUBLE) AS weight,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY ROUND(POW({u}, 1.0 / CAST({weight_col} AS DOUBLE)), 12) DESC,
                                {id_col}
                   ) AS INTEGER) AS sample_rank
            FROM {table}
            WHERE CAST({weight_col} AS DOUBLE) > 0
        ) WHERE sample_rank <= {k}
    """


def duplicate_spans(
    df: DataFrame,
    width: int = 10,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring span dedup statistics (the corpus-level signal
    behind Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better", arXiv:2107.06499): hash every ``width``-token
    sliding window (step ``stride``), count how often each span occurs
    ANYWHERE in the corpus, and report per document how much of it is
    corpus-duplicated text: (doc_id, n_spans, n_dup_spans,
    dup_span_frac). A span is duplicated when its corpus-wide
    occurrence count is >= 2 — within-document repeats count, exactly
    as a suffix-array dedup would see them.

    Scale: span construction is a narrow per-row array expression
    (sequence → slice → md5) fused into the scan; the explode amplifies
    each doc to ~n_tokens/stride rows, and ``stride`` is the knob that
    trades resolution for cost at 100 TB (stride=width gives
    non-overlapping spans at 1/width the rows — what a petabyte run
    wants). Then: one map-side-combined count to distinct
    (doc, span) pairs, one span-keyed count for corpus totals, one
    equi-join of those two (both already span-keyed), one final doc
    aggregation. No UDFs; every hash is md5 so the DuckDB twin is
    bit-identical, and the fraction is a single IEEE division.

    Docs shorter than ``width`` tokens have zero spans and report
    dup_span_frac = 0.0 (restored by the left join — explode drops
    them)."""
    occ = _span_tokenized(df, text_col, id_col).select(
        F.col(id_col), F.explode(_span_hashes(width, stride)).alias("__h")
    )
    per_doc_span = occ.groupBy(id_col, "__h").agg(
        F.count("*").cast("long").alias("__c")
    )
    corpus = per_doc_span.groupBy("__h").agg(F.sum("__c").alias("__tc"))
    stats = (
        per_doc_span.join(corpus, "__h")
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("__n"),
            F.sum(F.when(F.col("__tc") >= 2, F.col("__c")).otherwise(0)).alias(
                "__nd"
            ),
        )
    )
    return (
        df.select(id_col)
        .join(stats, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__n"), F.lit(0)).cast("int").alias("n_spans"),
            F.coalesce(F.col("__nd"), F.lit(0)).cast("int").alias("n_dup_spans"),
            F.when(F.coalesce(F.col("__n"), F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.col("__nd").cast("double") / F.col("__n").cast("double")
            )
            .alias("dup_span_frac"),
        )
    )


def _tokenized(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, __t=tokens) projection — the FENCE below every span
    Generate. Higher-order-function lambdas are interpreted with NO
    common-subexpression elimination: building spans directly over the
    ``tokens(text)`` expression re-tokenizes the document once PER SPAN
    inside the slice lambda (measured at sf0.1: the span explode cost
    2.8 s single-task; with tokens materialized behind this projection
    — which CollapseProject does not merge through a Generate — the
    same explode is 0.5 s). Every span operator builds on this.

    The SPAN operators (duplicate/remove/report/stats) additionally
    exclude null document ids via :func:`_span_tokenized` — see its
    note on why the explicit predicate is load-bearing for exchange
    reuse."""
    return df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))


def _span_tokenized(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """:func:`_tokenized` with null document ids excluded — the span
    operators' shared base (ids are non-null by the engine's key
    contract; the span SQL twins carry the same predicate). The
    explicit exclusion is LOAD-BEARING for performance: the span ops
    reference their exploded per-(doc, span) aggregation from two plan
    branches, and Catalyst pushes the join side's IsNotNull into one
    branch only — the subtrees then stop being canonically identical,
    ReusedExchange no longer fires, and the explode (the dominant
    cost) silently runs once PER BRANCH. With the filter applied at
    the base, both branches match and the explode runs once
    (plan-asserted in tests/test_plans.py; duplicate_spans measured
    5.58 s → 3.5 s at sf1.0)."""
    return _tokenized(df.where(F.col(id_col).isNotNull()), text_col, id_col)


def _span_starts(width: int, stride: int) -> Column:
    n = F.size(F.col("__t"))
    return F.when(
        n >= width,
        F.sequence(F.lit(1), n - width + 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))


def _span_hashes(width: int, stride: int) -> Column:
    return F.transform(
        _span_starts(width, stride),
        lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("__t"), i, width))),
    )


def corpus_span_stats(
    df: DataFrame,
    width: int = 10,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    approx: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """One-row corpus duplication summary: (n_spans, n_distinct_spans,
    dup_rate) where dup_rate = 1 - distinct/total over all
    ``width``-token spans — the single number that tells you whether a
    crawl snapshot needs the full :func:`remove_duplicate_spans` pass
    before training.

    ``approx=False`` (driver-checked): exact COUNT(DISTINCT md5) — the
    distinct-aggregate shuffles one row per DISTINCT span, which at
    100 TB is corpus-vocabulary-sized. ``approx=True`` is the scale
    path: ``approx_count_distinct`` (HyperLogLog++, relative error
    ``rsd``) — partial sketches merge map-side, so the exchange carries
    one ~1.5 KB sketch per task instead of the distinct span set. The
    approx twin is pytest-pinned within rsd of the exact answer; it has
    no SQL oracle (HLL register layouts are engine-specific)."""
    occ = _span_tokenized(df, text_col, id_col).select(
        F.explode(_span_hashes(width, stride)).alias("__h")
    )
    distinct = (
        F.approx_count_distinct("__h", rsd) if approx
        else F.count_distinct("__h")
    )
    return occ.agg(
        F.count("*").cast("bigint").alias("n_spans"),
        distinct.cast("bigint").alias("n_distinct_spans"),
    ).select(
        "n_spans",
        "n_distinct_spans",
        F.when(F.col("n_spans") == 0, F.lit(0.0))
        .otherwise(
            1.0
            - F.col("n_distinct_spans").cast("double")
            / F.col("n_spans").cast("double")
        )
        .alias("dup_rate"),
    )


def sql_corpus_span_stats(
    table: str = "documents",
    width: int = 10,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of the EXACT form of :func:`corpus_span_stats` —
    same null-id exclusion as the Spark side's ``_span_tokenized``."""
    toks = sql_tokens(text_col)
    spans = (
        f"list_transform(range(1, greatest(len(t) - {width - 1}, 0) + 1, {stride}),"
        f" i -> md5(array_to_string(list_slice(t, i, i + {width - 1}), ' ')))"
    )
    return f"""
        WITH tk AS (SELECT {toks} AS t FROM {table}
                    WHERE {id_col} IS NOT NULL),
        occ AS (SELECT unnest({spans}) AS h FROM tk)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct_spans,
               CASE WHEN COUNT(*) = 0 THEN 0.0
                    ELSE 1.0 - CAST(COUNT(DISTINCT h) AS DOUBLE)
                         / CAST(COUNT(*) AS DOUBLE)
               END AS dup_rate
        FROM occ
    """


def corpus_span_report(
    df: DataFrame,
    width: int = 10,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Consolidated one-row corpus span-duplication report — the r13
    contract fold of :func:`duplicate_spans` into
    :func:`corpus_span_stats` (same pattern as the r12 similarity_topk
    fold): (n_spans, n_distinct_spans, dup_rate, n_dup_spans,
    n_docs_with_dups). The first three columns are corpus_span_stats'
    exact form; the last two are the corpus fold of duplicate_spans'
    per-document statistics, so ONE hash-check pins BOTH pipelines —
    the distinct-span sketch path AND the full per-doc occurrence
    pipeline (explode → per-doc span counts → corpus totals → join →
    doc aggregation). Internal consistency is structural: both sides
    explode the identical md5 span hashes, so the per-doc SUM(n_spans)
    equals the direct COUNT(*) (pytest-pinned in test_text_dedup).

    Scale: ONE pass over the span explode feeds both halves — the
    summary's corpus totals are derived from the same per-(doc, span)
    aggregation the per-doc path shuffles (n_spans = SUM over the
    span-keyed totals, n_distinct_spans = their row count), so the two
    branches share identical scan → explode → partial-agg → exchange
    subtrees and Spark's ReusedExchange computes them once
    (plan-asserted in tests/test_plans.py; measured ~20% off the
    naive two-pass compose at sf1.0). The final combine is a 1-row ×
    1-row scalar crossJoin (broadcast, no data movement)."""
    occ = _span_tokenized(df, text_col, id_col).select(
        F.col(id_col), F.explode(_span_hashes(width, stride)).alias("__h")
    )
    per = occ.groupBy(id_col, "__h").agg(
        F.count("*").cast("long").alias("__c")
    )
    tot = per.groupBy("__h").agg(F.sum("__c").alias("__tc"))
    summary = tot.agg(
        F.coalesce(F.sum("__tc"), F.lit(0)).cast("bigint").alias("n_spans"),
        F.count("*").cast("bigint").alias("n_distinct_spans"),
    ).select(
        "n_spans",
        "n_distinct_spans",
        F.when(F.col("n_spans") == 0, F.lit(0.0))
        .otherwise(
            1.0
            - F.col("n_distinct_spans").cast("double")
            / F.col("n_spans").cast("double")
        )
        .alias("dup_rate"),
    )
    # the per-doc dup stats (duplicate_spans' aggregation), folded to
    # corpus level; docs with zero spans contribute nothing to either
    # corpus column, so the explode-dropped short docs need no restore
    doc_stats = (
        per.join(tot, "__h")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("__tc") >= 2, F.col("__c")).otherwise(0)
            ).alias("__nd"),
        )
    )
    fold = doc_stats.agg(
        F.coalesce(F.sum("__nd"), F.lit(0))
        .cast("bigint")
        .alias("n_dup_spans"),
        F.coalesce(
            F.sum(F.when(F.col("__nd") > 0, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_docs_with_dups"),
    )
    return summary.crossJoin(fold)


def sql_corpus_span_report(
    table: str = "documents",
    width: int = 10,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`corpus_span_report`: the corpus_span_stats
    twin cross-joined with the corpus fold of the duplicate_spans
    twin — both one-row."""
    stats = sql_corpus_span_stats(table, width, stride, text_col, id_col)
    per_doc = sql_duplicate_spans(table, width, stride, text_col, id_col)
    return f"""
        WITH stats AS ({stats}),
        per_doc AS ({per_doc}),
        fold AS (
            -- COALESCE to match the Spark side's F.coalesce(..., 0):
            -- on an EMPTY corpus the fold aggregates are NULL in SQL
            -- but 0 in corpus_span_report (r13 ADVICE)
            SELECT CAST(COALESCE(SUM(n_dup_spans), 0) AS BIGINT)
                       AS n_dup_spans,
                   CAST(COALESCE(
                        SUM(CASE WHEN n_dup_spans > 0 THEN 1 ELSE 0 END),
                        0) AS BIGINT) AS n_docs_with_dups
            FROM per_doc
        )
        SELECT stats.*, fold.* FROM stats CROSS JOIN fold
    """


def remove_duplicate_spans(
    df: DataFrame,
    width: int = 10,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The REMOVAL counterpart of :func:`duplicate_spans` — the actual
    dedup step of Lee et al. 2021 (arXiv:2107.06499), fixed-width form:
    for every ``width``-token span occurring >= 2 times in the corpus,
    keep exactly ONE canonical occurrence (the lexicographically
    smallest (doc_id, position)) and delete the tokens of every other
    occurrence. Returns (doc_id, n_tokens, n_removed, clean_text).

    Determinism: the canonical occurrence is a pure MIN over
    (doc_id, position) pairs, so any engine picks the same survivor;
    token coverage is integer-range arithmetic. The DuckDB twin is
    bit-identical.

    Scale: same shuffle structure as duplicate_spans — ONE
    per-(doc, span) aggregation (positions collected per doc-span,
    fine-grained keys, so a boilerplate span repeated across millions
    of docs never makes a hot key) that BOTH downstream branches
    (corpus canon/count and the removal join) reference, so the span
    explode and its exchange run once and ReusedExchange serves the
    second branch (plan-asserted; the previous occ-join-occ shape ran
    the explode once per branch). ``stride`` bounds the explode; the
    removal-starts list is bounded by spans-per-doc, not corpus size.
    The final token filter is a per-row HOF over (token index ×
    removal ranges) — quadratic only in per-document terms. Positions
    are 1-based on both engines."""
    tk = _span_tokenized(df, text_col, id_col)
    # (doc, start_pos, hash) occurrences; pos is 1-based token index
    occ = tk.select(
        F.col(id_col),
        F.posexplode(_span_hashes(width, stride)).alias("__sp", "__h"),
    ).select(
        id_col,
        (F.col("__sp") * stride + 1).alias("__p"),
        "__h",
    )
    # the shared base: one sorted position list per (doc, span)
    per = occ.groupBy(id_col, "__h").agg(
        F.sort_array(F.collect_list("__p")).alias("__ps")
    )
    # corpus canon per span: the lexicographically smallest (doc, pos)
    # is the min over per-doc minima (ps is sorted, so ps[1] is the
    # per-doc minimum position)
    dup_canon = (
        per.groupBy("__h")
        .agg(
            F.sum(F.size("__ps")).alias("__cnt"),
            F.min(
                F.struct(
                    F.col(id_col).alias("d"),
                    F.element_at("__ps", 1).alias("p"),
                )
            ).alias("__canon"),
        )
        .where(F.col("__cnt") >= 2)
        .select("__h", "__canon")
    )
    removals = (
        per.join(dup_canon, "__h")
        .select(
            id_col,
            F.filter(
                F.col("__ps"),
                lambda p: ~(
                    (F.col(id_col) == F.col("__canon.d"))
                    & (p == F.col("__canon.p"))
                ),
            ).alias("__rm"),
        )
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("__rm")))
            ).alias("__starts")
        )
    )
    starts_or_empty = F.coalesce(
        F.col("__starts"), F.array().cast("array<int>")
    )
    # coverage filter over the MATERIALIZED token column (__t), same
    # fence rationale as _tokenized
    kept = F.filter(
        F.col("__t"),
        lambda _t, i: ~F.exists(
            starts_or_empty,
            lambda s: (s <= i + 1) & (i + 1 < s + width),
        ),
    )
    n = F.size(F.col("__t"))
    return (
        tk.join(removals, id_col, "left")
        .select(
            F.col(id_col),
            n.cast("int").alias("n_tokens"),
            (n - F.size(kept)).cast("int").alias("n_removed"),
            F.concat_ws(" ", kept).alias("clean_text"),
        )
    )


def sql_remove_duplicate_spans(
    table: str = "documents",
    width: int = 10,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`remove_duplicate_spans` — same md5 spans,
    same MIN-(doc,pos) canonical rule, same 1-based range coverage."""
    toks = sql_tokens(text_col)
    spans = (
        f"list_transform(range(1, greatest(len(t) - {width - 1}, 0) + 1, {stride}),"
        f" i -> md5(array_to_string(list_slice(t, i, i + {width - 1}), ' ')))"
    )
    return f"""
        WITH tk AS (SELECT {id_col}, {toks} AS t FROM {table}
                    WHERE {id_col} IS NOT NULL),
        sp AS (SELECT {id_col}, unnest(range(1, len({spans}) + 1)) AS i,
                      {spans} AS hs
               FROM tk),
        occ AS (
            SELECT {id_col}, CAST((i - 1) * {stride} + 1 AS INTEGER) AS p,
                   hs[i] AS h
            FROM sp
        ),
        marked AS (
            SELECT {id_col}, p, h,
                   COUNT(*) OVER (PARTITION BY h) AS cnt,
                   ROW_NUMBER() OVER (
                       PARTITION BY h ORDER BY {id_col}, p
                   ) AS rn
            FROM occ
        ),
        rem AS (
            SELECT {id_col}, list_sort(list(DISTINCT p)) AS starts
            FROM marked WHERE cnt >= 2 AND rn > 1
            GROUP BY {id_col}
        ),
        kept AS (
            SELECT tk.{id_col}, tk.t,
                   list_filter(tk.t, (tok, i) -> len(list_filter(
                       COALESCE(rem.starts, []),
                       s -> s <= i AND i < s + {width}
                   )) = 0) AS kt
            FROM tk LEFT JOIN rem USING ({id_col})
        )
        SELECT {id_col},
               CAST(len(t) AS INTEGER) AS n_tokens,
               CAST(len(t) - len(kt) AS INTEGER) AS n_removed,
               -- array_to_string([]) is NULL in DuckDB but concat_ws
               -- gives '' in Spark: normalize fully-removed docs to ''
               COALESCE(array_to_string(kt, ' '), '') AS clean_text
        FROM kept
    """


def sql_duplicate_spans(
    table: str = "documents",
    width: int = 10,
    stride: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`duplicate_spans` — same md5 span hashing
    over the same token windows, integer counts, one IEEE division."""
    toks = sql_tokens(text_col)
    spans = (
        f"list_transform(range(1, greatest(len(t) - {width - 1}, 0) + 1, {stride}),"
        f" i -> md5(array_to_string(list_slice(t, i, i + {width - 1}), ' ')))"
    )
    return f"""
        WITH tk AS (SELECT {id_col}, {toks} AS t FROM {table}
                    WHERE {id_col} IS NOT NULL),
        occ AS (SELECT {id_col}, unnest({spans}) AS h FROM tk),
        per AS (SELECT {id_col}, h, CAST(COUNT(*) AS BIGINT) AS c
                FROM occ GROUP BY {id_col}, h),
        tot AS (SELECT h, SUM(c) AS tc FROM per GROUP BY h),
        st AS (
            SELECT {id_col}, SUM(c) AS n,
                   SUM(CASE WHEN tc >= 2 THEN c ELSE 0 END) AS nd
            FROM per JOIN tot USING (h) GROUP BY {id_col}
        )
        SELECT d.{id_col},
               CAST(COALESCE(st.n, 0) AS INTEGER) AS n_spans,
               CAST(COALESCE(st.nd, 0) AS INTEGER) AS n_dup_spans,
               CASE WHEN COALESCE(st.n, 0) = 0 THEN 0.0
                    ELSE CAST(st.nd AS DOUBLE) / CAST(st.n AS DOUBLE)
               END AS dup_span_frac
        FROM {table} d LEFT JOIN st USING ({id_col})
    """


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking: split each document into token windows of
    at most ``max_tokens``, starting every ``stride`` tokens — the
    training-prep step that turns variable-length documents into
    model-context-sized examples (stride < max_tokens gives the standard
    overlapping windows so no span is ever cut without context).

    Contract: starts are 1, 1+stride, 2*stride+1, … up to the document's
    token count; each chunk is the token slice [start, start+max_tokens)
    re-joined with single spaces (tail chunks run shorter). An empty
    document yields one empty chunk — the row is never silently dropped,
    so per-document accounting downstream stays total. chunk_id =
    (start-1)/stride is the 0-based window ordinal.

    Scale: embarrassingly parallel — one Generate per row inside the
    scan stage, NO shuffle anywhere. The tokenization sits behind the
    :func:`_tokenized` projection fence (same measured 3-4× explode
    saving as the span operators: HOF lambdas re-evaluate un-fenced
    child expressions once per generated element). Output rows ≈
    n_tokens/stride per doc; at 100 TB the fan-out is bounded and
    streaming-friendly because nothing aggregates."""
    ex = _tokenized(df, text_col, id_col).select(
        F.col(id_col),
        F.col("__t"),
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.size(F.col("__t")), F.lit(1)),
                F.lit(stride),
            )
        ).alias("chunk_start"),
    )
    return ex.select(
        F.col(id_col),
        F.expr(f"CAST((chunk_start - 1) DIV {stride} AS BIGINT)").alias(
            "chunk_id"
        ),
        F.col("chunk_start").cast("int").alias("chunk_start"),
        F.concat_ws(
            " ", F.slice(F.col("__t"), F.col("chunk_start"), max_tokens)
        ).alias("chunk_text"),
        F.greatest(
            F.least(
                F.lit(max_tokens),
                F.size(F.col("__t")) - F.col("chunk_start") + 1,
            ),
            F.lit(0),
        )
        .cast("int")
        .alias("n_tokens"),
    )


def sql_chunk_documents(
    table: str = "documents",
    max_tokens: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    return f"""
        SELECT {id_col},
               CAST((cs - 1) // {stride} AS BIGINT) AS chunk_id,
               CAST(cs AS INTEGER) AS chunk_start,
               array_to_string(list_slice(t, cs, cs + {max_tokens} - 1), ' ') AS chunk_text,
               CAST(GREATEST(LEAST({max_tokens}, len(t) - cs + 1), 0) AS INTEGER) AS n_tokens
        FROM (
            SELECT {id_col}, {sql_tokens(text_col)} AS t,
                   unnest(generate_series(1, GREATEST(len({sql_tokens(text_col)}), 1), {stride})) AS cs
            FROM {table}
        )
    """


def epoch_upsample(
    df: DataFrame,
    epochs_by_source: dict | None = None,
    default_epochs: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Fractional-epoch upsampling for corpus mixing: each source gets a
    target epoch count e (e.g. 2.5 = every doc twice, half the docs a
    third time); a document is emitted floor(e) times plus one more when
    its deterministic id-hash fraction falls under frac(e). This is the
    materialized form of the published data-mixture recipes (The Pile /
    LLaMA tables quote per-source epochs): downstream shuffling/packing
    consumes a plain DataFrame with a copy_id, no weighted sampler state.

    The extra-copy membership reuses :func:`hash_sample`'s id-hash
    threshold, so it is stable under re-runs, repartitioning, and
    appends, and independent draws per seed. Epoch values are
    non-negative; e = 0 drops the source entirely.

    Scale: the epochs table is a literal (|sources| rows) joined
    broadcast; the fan-out is a per-row Generate with NO shuffle —
    sequence(0, n_copies-1) explodes inside the scan stage, so a 100 TB
    upsample streams. Output: (id, source, copy_id) with copy_id in
    [0, n_copies)."""
    epochs_by_source = epochs_by_source or {}
    e = F.lit(float(default_epochs))
    for src, ep in sorted(epochs_by_source.items()):
        e = F.when(F.col(source_col) == src, F.lit(float(ep))).otherwise(e)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    frac_hit = (h / F.lit(float(1 << 32))) < (e - F.floor(e))
    n_copies = (
        F.floor(e).cast("long") + F.when(frac_hit, 1).otherwise(0)
    ).alias("__copies")
    base = df.select(F.col(id_col), F.col(source_col), n_copies)
    return base.where(F.col("__copies") > 0).select(
        F.col(id_col),
        F.col(source_col),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("__copies") - 1)
        ).alias("copy_id"),
    )


def sql_epoch_upsample(
    table: str = "documents",
    epochs_by_source: dict | None = None,
    default_epochs: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> str:
    epochs_by_source = epochs_by_source or {}
    e = f"CAST({float(default_epochs)} AS DOUBLE)"
    for src, ep in sorted(epochs_by_source.items()):
        e = (
            f"CASE WHEN {source_col} = '{src}' THEN CAST({float(ep)} AS DOUBLE) "
            f"ELSE {e} END"
        )
    h = (
        f"CAST(('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 8))"
        f"::BIGINT AS DOUBLE)"
    )
    return f"""
        SELECT {id_col}, {source_col},
               unnest(generate_series(0, CAST(n_copies AS BIGINT) - 1)) AS copy_id
        FROM (
            SELECT {id_col}, {source_col},
                   FLOOR(e) + (CASE WHEN {h} / 4294967296.0 < e - FLOOR(e)
                               THEN 1 ELSE 0 END) AS n_copies
            FROM (SELECT {id_col}, {source_col}, {e} AS e FROM {table})
        )
        WHERE n_copies > 0
    """
