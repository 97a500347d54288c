"""Document-pipeline queries (north_star extension operators over the
driver's ``documents`` table): dedup (exact / n-gram-Jaccard /
MinHash-LSH / SimHash), text analysis, fingerprinting, language ID.

Oracle notes: the probabilistic ops (MinHash, SimHash) hash with
Spark's xxhash64, which DuckDB cannot reproduce — their *outputs* are
still oracle-checked where the pipeline ends in an exact verify step
(MinHash→Jaccard equals the exact all-pairs SQL); the raw
candidate/fingerprint queries are rows-only entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ckpt import spill_checkpoint
from ..operators import clustering as C
from ..operators import dedup as D
from ..operators import text as X
from ..operators import training as TR
from ..sources.io import load_table
from .catalog import query, shared

# DuckDB mirror of text.tokens(): [] (not ['']) for empty/whitespace
# text. JACCARD_SQL and the contamination/assembly oracles keep the
# raw split deliberately — both engines emit ONE empty shingle for an
# empty doc, so shingle semantics already agree.
TOKS_SQL = (
    "CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END"
)

JACCARD_SQL = """
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id, shingle
      FROM (
        SELECT doc_id,
               unnest(list_distinct([array_to_string(toks[i:i+7], ' ')
                      FOR i IN generate_series(1, greatest(len(toks)-7, 1))])) AS shingle
        FROM t
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b, i.n_inter,
           CAST(i.n_inter AS DOUBLE) / (sa.n_shingles + sb.n_shingles - i.n_inter)
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.n_inter AS DOUBLE) / (sa.n_shingles + sb.n_shingles - i.n_inter)
          >= 0.8
"""

# The capped derivation ENDING AT the thresholded SCORED pair list
# ``pairs(da, db, n_inter, jaccard)`` — the single definition of the
# CAPPED rule (width-7 shingles / df>1000 cap / 0.8 threshold,
# replaying ``dedup._pair_intersections``) for the seven entries
# that consume it: the graph oracles (keep-best dedup, leakage-safe
# split, triangle stats, pagerank) compose ``"WITH RECURSIVE " +
# JACCARD_PAIR_CTES + ", <downstream CTEs...>"``, and the
# scored-list JACCARD_CAPPED_SQL below is a thin SELECT — so a
# future cap/width/threshold change cannot desync one family of
# CAPPED oracles from the other. The UNCAPPED JACCARD_SQL above
# (minhash / prefix-join oracles, where the cap must NOT apply) is a
# deliberately separate shape — touch both when changing the shared
# shingling itself.
JACCARD_PAIR_CTES = """t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ),
    sh0 AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(toks[i:i+7], ' ')
                    FOR i IN generate_series(1, greatest(len(toks)-7, 1))]))
               AS shingle
      FROM t
    ),
    sh AS (
      -- engine's hot-shingle cap (dedup._pair_intersections,
      -- max_doc_freq=1000) replayed: dropped from join AND sizes
      SELECT doc_id, shingle FROM sh0
      WHERE shingle NOT IN (
        SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) > 1000
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT da, db, n_inter,
             CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter)
               AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = inter.da
      JOIN sizes sb ON sb.doc_id = inter.db
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
    )"""

# JACCARD_SQL with the engine's hot-shingle document-frequency cap
# (dedup._pair_intersections, max_doc_freq=1000) replayed in SQL:
# shingles in >1000 docs are removed from BOTH the join and the sizes,
# so the oracle checks the capped metric exactly at any data scale
# instead of relying on the test corpus having no hot shingles.
JACCARD_CAPPED_SQL = (
    "WITH "
    + JACCARD_PAIR_CTES
    + """
    SELECT da AS doc_a, db AS doc_b, n_inter, jaccard FROM pairs
    """
)



# path -> ((applicationId, mtime_ns, size), checkpointed DataFrame).
# One live entry per corpus path: a new Spark context or a
# regenerated file REPLACES the slot instead of accumulating dead
# checkpoint handles (stale entries reference a stopped context's
# executor blocks and would otherwise pin py4j plans forever).
_PAIRS_CACHE: dict[str, tuple[tuple, DataFrame]] = {}


def _jaccard_pairs_cached(spark: SparkSession, sf_dir: str, docs: DataFrame) -> DataFrame:
    """The capped-Jaccard 0.8 SCORED pair list (``doc_a``, ``doc_b``,
    ``n_inter``, ``jaccard``), localCheckpointed once per (Spark
    context, corpus file) — the ``_BPE_CACHE`` pattern. Eight catalog
    entries consume this same list: the scored entry itself
    (ngram_jaccard), the quality/verify twins (simhash_quality,
    editdist_verify), and the four graph consumers (keep-best dedup,
    leakage-safe split, triangles, pagerank), and the source-overlap
    matrix (docs_source_overlap); without the cache each
    re-paid the shingle equi-join, the dominant cost of every one of
    them. The checkpoint is lazy (materializes
    on the first consumer's action) and executor-local: the pair
    list is near-dup-volume, not corpus-volume, so holding it
    materialized is the natural shape at any scale — a production
    pipeline would persist this pair table once and fan the graph
    stages out from it. The slot validates on applicationId — a fresh
    context (whose executors no longer hold the old checkpoint
    blocks) never sees a stale handle — and on file mtime/size so a
    regenerated corpus recomputes; either mismatch REPLACES the
    path's single slot, keeping the cache bounded by live corpora
    (bookkeeping shared with the kNN pair cache — _pair_cache.py)."""
    import os

    from ._pair_cache import cached_pair_checkpoint

    return cached_pair_checkpoint(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        _PAIRS_CACHE,
        lambda: D.ngram_jaccard_pairs(docs, threshold=0.8),
    )


@query(
    "docs_exact_dedup",
    oracle="""
    WITH doubled AS (
      SELECT * FROM documents UNION ALL SELECT * FROM documents
    )
    SELECT source,
           COUNT(DISTINCT md5(lower(trim(text)))) AS n_kept,
           COUNT(*) AS n_input_rows
    FROM doubled GROUP BY source
    """,
)
def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a duplicate-injected corpus (the documents table
    unioned with itself): fingerprint → min-key keep (deterministic
    first-wins, SURVEY §2 A6). Output: per-source kept/input counts.

    Scale: the shuffle key is the 16-byte md5, not the document text.
    """
    docs = load_table(spark, sf_dir, "documents")
    doubled = docs.unionByName(docs)
    kept = D.exact_dedup(doubled, "text", "doc_id")
    n_kept = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
    n_in = doubled.groupBy("source").agg(F.count(F.lit(1)).alias("n_input_rows"))
    return n_kept.join(n_in, "source").select("source", "n_kept", "n_input_rows")


@query(
    "docs_fingerprint",
    oracle="""
    SELECT doc_id, md5(lower(trim(text))) AS fingerprint, n_chars
    FROM documents
    """,
)
def docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document content fingerprint (north_star: doc fingerprinting)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", X.fingerprint(F.col("text")).alias("fingerprint"), "n_chars"
    )


@query(
    "docs_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_uniq_tokens,
           len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','it')))
             AS n_stopwords,
           CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / len(toks)
             AS avg_token_len
    FROM (
      SELECT doc_id, text, {TOKS_SQL} AS toks
      FROM documents
    )
    """,
)
def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (north_star): whitespace tokens, distinct tokens,
    stopword hits, mean token length — one codegen'd projection."""
    docs = load_table(spark, sf_dir, "documents")
    return X.with_token_stats(docs).select(
        "doc_id", "n_tokens", "n_uniq_tokens", "n_stopwords", "avg_token_len"
    )


@query(
    "docs_quality_score",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_uniq_tokens,
             len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','it')))
               AS n_stopwords
      FROM (SELECT doc_id, lang, {TOKS_SQL} AS toks
            FROM documents)
    )
    SELECT doc_id, lang,
           CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_uniq_tokens AS DOUBLE) / n_tokens AS lexical_diversity,
           CASE WHEN n_tokens >= 20 AND n_tokens <= 1000
                     AND CAST(n_uniq_tokens AS DOUBLE) / n_tokens > 0.2
                THEN 'good' ELSE 'low' END AS quality_flag
    FROM s
    """,
)
def docs_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (north_star): pretraining-style heuristic filter
    (length band, stopword ratio, lexical diversity)."""
    docs = load_table(spark, sf_dir, "documents")
    return X.with_quality_score(docs).select(
        "doc_id", "lang", "stopword_ratio", "lexical_diversity", "quality_flag"
    )


@query("docs_ngram_jaccard", oracle=JACCARD_CAPPED_SQL)
def docs_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs by 8-token-shingle Jaccard ≥ 0.8 (north_star
    n-gram Jaccard dedup; also the verification stage of the MinHash
    pipeline). Shingle-join fan-out is bounded because w=8 shingles are
    near-unique outside true near-dups, PLUS the df>1000 hot-shingle
    cap (boilerplate guard) — the oracle replays the cap in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return _jaccard_pairs_cached(spark, sf_dir, docs)


@query("docs_minhash_near_dup", oracle=JACCARD_SQL)
def docs_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16×4) candidates → exact-Jaccard verify ≥ 0.8.

    Oracle-checked against the *exact* all-pairs SQL: with the corpus's
    planted near-dups at J≈0.99, LSH recall is 1-(1-0.99⁴)¹⁶ ≈ 1-1e-23,
    so the probabilistic pipeline must reproduce the exact answer.
    """
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_near_dup_pairs(docs, threshold=0.8)


# Full SQL replay of the SimHash pipeline with the md5_64 token hash
# (dedup._token_hash64): per-token 64-bit pattern from the first 16
# md5 hex chars, per-bit majority vote, 4×16-bit pigeonhole blocks,
# block-bucket candidate join, exact Hamming verify ≤ 3. Fingerprints
# are carried as the four block values (b0..b3 = bits 0-15 … 48-63),
# which sidesteps signed-64 overflow in both engines. The oracle
# replays the UNCAPPED blocking — the Spark side's max_bucket star
# degradation cannot trigger at oracle scale (bucket size ≤ corpus).
SIMHASH_SQL = f"""
    WITH t AS (SELECT doc_id, {{toks}} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
    h AS (SELECT doc_id, md5(tk) AS hx FROM tok),
    bits AS (
      SELECT doc_id, i,
             ((strpos('0123456789abcdef', substr(hx, 16 - (i // 4), 1)) - 1)
              >> (i % 4)) & 1 AS b
      FROM h, (SELECT unnest(generate_series(0, 63)) AS i)
    ),
    votes AS (
      SELECT doc_id, i,
             CASE WHEN 2 * SUM(b) > COUNT(*) THEN 1 ELSE 0 END AS bit
      FROM bits GROUP BY doc_id, i
    ),
    fp AS (
      SELECT d.doc_id,
             COALESCE(SUM(CASE WHEN v.i < 16 THEN v.bit << v.i END), 0) AS b0,
             COALESCE(SUM(CASE WHEN v.i BETWEEN 16 AND 31
                               THEN v.bit << (v.i - 16) END), 0) AS b1,
             COALESCE(SUM(CASE WHEN v.i BETWEEN 32 AND 47
                               THEN v.bit << (v.i - 32) END), 0) AS b2,
             COALESCE(SUM(CASE WHEN v.i >= 48
                               THEN v.bit << (v.i - 48) END), 0) AS b3
      FROM documents d LEFT JOIN votes v ON v.doc_id = d.doc_id
      GROUP BY d.doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
              + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
             AS INT) AS hamming
    FROM fp a JOIN fp b
      ON a.doc_id < b.doc_id
     AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
    WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
        + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
""".format(toks=TOKS_SQL)


@query("docs_simhash_near_dup", oracle=SIMHASH_SQL)
def docs_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs (Hamming ≤ 3) via pigeonhole block
    join, hash-checked end to end (VERDICT r02 item 4 — formerly the
    one rows-only entry): the md5_64 token hash is engine-neutral, so
    the oracle recomputes fingerprints, blocking, AND the Hamming
    verify in SQL. The xxhash64 default stays for production speed;
    planted-pair recall is additionally asserted in tests and the
    ``docs_simhash_quality`` twin."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_dup_pairs(docs, hash_fn="md5_64").withColumn(
        "hamming", F.col("hamming").cast("int")
    )


@query(
    "docs_simhash_quality",
    oracle=f"""
    SELECT COUNT(*) AS n_exact_pairs, TRUE AS recall_floor_met
    FROM ({JACCARD_CAPPED_SQL})
    """,
)
def docs_simhash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked structural statement about the SimHash pipeline
    (VERDICT r01 next-round 8): the exact Jaccard≥0.8 pair count must
    match SQL, and SimHash@Hamming≤3 must recover ≥ half of those
    pairs (the planted-pair recall floor asserted in pytest, now
    driver-checked). The pair listing itself is ALSO hash-checked —
    ``docs_simhash_near_dup`` replays the md5-derived token hash in
    SQL; this entry pins the pipeline's QUALITY as a separate fact."""
    docs = load_table(spark, sf_dir, "documents")
    exact = _jaccard_pairs_cached(spark, sf_dir, docs).select(
        "doc_a", "doc_b"
    )
    sh = (
        D.simhash_near_dup_pairs(docs)
        .select("doc_a", "doc_b")
        .withColumn("_hit", F.lit(1))
    )
    # ONE pass over the (expensive) exact-Jaccard subtree: a separate
    # count + semi-join would inline the whole shingle pipeline into
    # two plan branches with zero exchange reuse (measured: 9 scans /
    # 28 exchanges → halved)
    return (
        exact.join(sh, ["doc_a", "doc_b"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_exact_pairs"),
            F.count("_hit").alias("_n_hit"),
        )
        .select(
            "n_exact_pairs",
            (F.col("_n_hit") * 2 >= F.col("n_exact_pairs")).alias(
                "recall_floor_met"
            ),
        )
    )


@query(
    "docs_minhash_estimate_error",
    oracle=f"""
    SELECT COUNT(*) AS n_pairs, TRUE AS mean_err_ok, TRUE AS max_err_ok
    FROM ({JACCARD_CAPPED_SQL})
    """,
)
def docs_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash ESTIMATE-ERROR self-eval — the dedup-family twin of the
    ANN family's ``emb_ivf_recall``/``emb_pq_recall`` pattern: over
    the exact Jaccard≥0.8 ground-truth pairs (SQL-replayed), the
    64-permutation signature agreement fraction must estimate the true
    Jaccard within statistical bounds — mean |est − J| ≤ 0.04 and
    max ≤ 0.20 (≈4σ at the J=0.8 threshold, σ = √(J(1−J)/64) = 0.05;
    measured across the shipped corpora: mean ≈ 0.017, max ≤ 0.097 at
    sf0.001/0.01/0.1). The ``docs_simhash_quality`` gate pattern: the
    pair COUNT is hash-checked against SQL, the probabilistic bounds
    are engine-computed booleans the oracle pins as literal TRUE —
    xxhash64 signatures themselves are not DuckDB-replayable.

    Scale: the estimate join touches only near-dup-volume pairs (the
    shared ``_jaccard_pairs_cached`` checkpoint) and corpus-volume
    signatures once; the per-pair 64-lane agreement fold runs on pair
    volume, not corpus volume, and the output is one row.
    """
    docs = load_table(spark, sf_dir, "documents")
    exact = _jaccard_pairs_cached(spark, sf_dir, docs).select(
        "doc_a", "doc_b", "jaccard"
    )
    sigs = D.minhash_signatures(docs)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"), F.col("signature").alias("_sa")
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("signature").alias("_sb")
    )
    err = (
        exact.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.abs(
                F.aggregate(
                    F.zip_with(
                        "_sa", "_sb", lambda x, y: (x == y).cast("int")
                    ),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / F.lit(64.0)
                - F.col("jaccard")
            ).alias("_err")
        )
    )
    return err.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (F.mean("_err") <= 0.04).alias("mean_err_ok"),
        (F.max("_err") <= 0.20).alias("max_err_ok"),
    )


@query(
    "docs_lang_stats",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def docs_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile (grouping + distinct count)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


@query(
    "docs_repetition",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN len(toks) >= 3
                THEN 1.0 - CAST(len(list_distinct(tris)) AS DOUBLE) / len(tris)
           END AS repetition
    FROM (
      SELECT doc_id, toks,
             [array_to_string(toks[i:i+2], ' ')
              FOR i IN generate_series(1, greatest(len(toks) - 2, 1))] AS tris
      FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents)
    )
    """,
)
def docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition score (1 − distinct/total token
    trigrams) — the pretraining boilerplate filter signal; NULL below
    3 tokens. Narrow projection, oracle reconstructs the trigram list
    in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", X.trigram_repetition(F.col("text")).alias("repetition")
    )


def _pii_oracle() -> str:
    """Generated from the SAME pattern pack as with_pii_counts.
    Counts/flag coalesce NULL text to 0/false exactly like the Spark
    side (regexp over NULL is NULL in both engines)."""
    counts = ",\n           ".join(
        f"COALESCE(len(regexp_extract_all(text, '{pat}')), 0) AS n_{name}"
        for name, pat in X.PII_PATTERNS.items()
    )
    flag = " OR ".join(
        f"COALESCE(len(regexp_extract_all(text, '{pat}')), 0) > 0"
        for pat in X.PII_PATTERNS.values()
    )
    return f"""
    SELECT doc_id,
           {counts},
           ({flag}) AS pii_flag
    FROM documents
    """


@query("docs_pii_scan", oracle=_pii_oracle())
def docs_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pattern scan (emails/phones/IPs) per document — hit counts
    plus a redaction flag, all codegen'd regexp_count projections; the
    oracle is generated from the same pattern pack so the two engines
    cannot drift."""
    docs = load_table(spark, sf_dir, "documents")
    return X.with_pii_counts(docs).select(
        "doc_id", *[f"n_{k}" for k in X.PII_PATTERNS], "pii_flag"
    )


def _language_id_oracle() -> str:
    """DuckDB replica of the classifier, generated from the SAME
    profile table (single source of truth) — latin trigram hits via
    contains(), zh via the CJK-ideograph count, argmax with the
    array_max tie-break (hits DESC, lang DESC), all-zero → 'und'."""
    structs = ", ".join(
        "{'plang': '%s', 'hits': %s}"
        % (
            lang,
            " + ".join(
                "CAST(contains(lower(text), '%s') AS INTEGER)" % g for g in grams
            ),
        )
        for lang, grams in X._LANG_PROFILES.items()
    )
    # standard SQL single-quoted literals pass backslashes through
    # verbatim, so the Spark-side pattern drops in unchanged
    structs += (
        ", {'plang': 'zh', 'hits': len(regexp_extract_all(text, '%s'))}" % X.CJK_RE
    )
    return f"""
    SELECT doc_id, lang,
           CASE WHEN hits > 0 THEN plang ELSE 'und' END AS predicted_lang
    FROM (
      SELECT doc_id, lang, s.plang, s.hits,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY s.hits DESC, s.plang DESC) AS rn
      FROM (SELECT doc_id, lang, unnest([{structs}]) AS s FROM documents)
    ) WHERE rn = 1
    """


@query("docs_language_id", oracle=_language_id_oracle())
def docs_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-profile language ID (north_star), Cavnar–Trenkle-style
    hit counting over per-language trigram profiles, all JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    return X.with_language_id(docs).select("doc_id", "lang", "predicted_lang")


def _train_split_oracle(train: float = 0.9, val: float = 0.05) -> str:
    """Generated from the SAME cut derivation as split_assign
    (training.split_cuts) so the two engines cannot drift."""
    t_cut, v_cut = TR.split_cuts(train, val)
    return f"""
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(len({TOKS_SQL}))
                AS BIGINT) AS total_tokens
    FROM (
      SELECT text,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{t_cut}'
                    THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{v_cut}'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    GROUP BY 1
    """


@query("docs_train_split", oracle=_train_split_oracle())
def docs_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-addressed train/val/test split (90/5/5):
    md5-hex bucket on doc_id, portable to any engine — the oracle
    reproduces the assignment bit-for-bit. Narrow projection + one
    3-key shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        TR.split_assign(docs)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(X.tokens(F.col("text")))).alias("total_tokens"),
        )
    )


@query(
    "docs_token_packing",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id,
             len({TOKS_SQL}) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT source, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM t
    )
    SELECT source, CAST(prev // 2048 AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM c GROUP BY 1, 2
    """,
)
def docs_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing (2048/pack) per source shard: offset-based
    pack assignment via a per-shard running sum — parallel across
    shards, no global sort (the 100 TB constraint). Emits per-pack
    doc and token counts."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        TR.pack_documents(docs, budget=2048)
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
    )


def _chunking_oracle(budget: int, overlap: int) -> str:
    """Generated from the SAME (budget, overlap) as the catalog call —
    stride and both slice bounds derive from one place, so the oracle
    cannot drift from chunk_documents."""
    stride = budget - overlap
    return f"""
    WITH t AS (
      SELECT doc_id, {TOKS_SQL} AS toks FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             unnest(generate_series(0,
               greatest(CAST(ceil((len(toks) - {overlap}) / {stride}.0) AS INT),
                        1) - 1)) AS chunk_idx
      FROM t
    )
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           len(toks[chunk_idx*{stride} + 1 : chunk_idx*{stride} + {budget}])
             AS n_chunk_tokens,
           md5(array_to_string(
                 toks[chunk_idx*{stride} + 1 : chunk_idx*{stride} + {budget}],
                 ' ')) AS chunk_md5
    FROM c
    """


@query("docs_chunking", oracle=_chunking_oracle(budget=512, overlap=64))
def docs_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (512-token windows, 64 overlap, stride
    448): one row per chunk with its exact token count and content
    md5 — the oracle reconstructs every window via list slicing, so
    chunk boundaries, overlap, and content are all hash-checked."""
    docs = load_table(spark, sf_dir, "documents")
    return TR.chunk_documents(docs, budget=512, overlap=64)


@query(
    "docs_contamination",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(toks[i:i+7], ' ')
                    FOR i IN generate_series(1, greatest(len(toks)-7, 1))]))
               AS shingle
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents)
    )
    SELECT DISTINCT a.doc_id
    FROM sh a JOIN sh b ON a.shingle = b.shingle
    WHERE a.doc_id % 50 <> 0 AND b.doc_id % 50 = 0
    """,
)
def docs_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: train docs sharing an 8-token
    shingle with the (synthetic) benchmark subset ``doc_id % 50 = 0``.
    The benchmark shingle set is distinct-small → broadcast semi-join;
    the corpus side never pair-expands."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id")
    return TR.contamination(docs, bench)


@query(
    "docs_stratified_sample",
    oracle="""
    SELECT lang, doc_id, CAST(rk AS BIGINT) AS sample_rank
    FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':strat'), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 20
    """,
)
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20-per-language sample (training.py
    ``stratified_sample``): md5(key:salt) is a portable uniform
    permutation, so the oracle reproduces the exact membership AND
    rank. The rank-filter shape compiles to WindowGroupLimit — a
    per-mapper k-row heap per stratum before the shuffle, the
    deterministic cousin of reservoir sampling (asserted in
    test_plan_audit)."""
    docs = load_table(spark, sf_dir, "documents")
    return TR.stratified_sample(docs, strata_col="lang", k=20).select(
        "lang", "doc_id", "sample_rank"
    )


_TFIDF_TERMS = ("spark", "vector", "stream")


def _tfidf_oracle(terms: tuple[str, ...], k: int) -> str:
    """Generated from the SAME term list and k as the catalog call.
    Integer rarity weights keep every score in BIGINT arithmetic —
    exact and associative in both engines (the catalog.py determinism
    rule applied to relevance scoring; a float ln() idf would hash-
    drift in the last ulp between libm and the JVM)."""
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{t}" for t in terms
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in terms
    )
    score = " + ".join(f"tf_{t} * (n_docs - df_{t})" for t in terms)
    tf_out = ", ".join(f"CAST(tf_{t} AS BIGINT) AS tf_{t}" for t in terms)
    return f"""
    WITH f AS (
      SELECT doc_id, len(toks) AS n_tokens,
             {tf_cols}
      FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents)
    ),
    s AS (SELECT COUNT(*) AS n_docs, {df_cols} FROM f)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, {tf_out},
           CAST({score} AS BIGINT) AS score,
           CAST(CASE WHEN n_tokens > 0
                THEN (({score}) * 1000) // n_tokens END AS BIGINT)
             AS score_per_1k
    FROM f CROSS JOIN s
    ORDER BY score DESC, doc_id
    LIMIT {k}
    """


def _term_eq(term: str):
    return lambda x: x == F.lit(term)


@query("docs_tfidf_topk", oracle=_tfidf_oracle(_TFIDF_TERMS, 25))
def docs_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style top-k keyword retrieval: score docs against a query
    term set with integer rarity weights (tf · (N − df), the log-free
    idf — exact BIGINT arithmetic in both engines), plus a
    length-normalized score via integer division.

    Scale: with a LITERAL query term set, the right plan is a
    projection, not an inverted index — per-term tf counts are codegen
    array filters in the corpus scan, the (N, df_t) statistics row is
    a 1-row broadcast, and top-k is TakeOrdered (per-partition k-row
    heaps, no global sort). The posting-list/index form (explode
    tokens → shuffle by term) only wins when the query set is itself a
    table — that shape is ``contamination``'s shingle join."""
    docs = load_table(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    f = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        # NB: a `lambda x, t=t:` capture would make PySpark treat the
        # lambda as the 2-arg (element, index) form and bind t to the
        # index column — hence the explicit closure factory
        *[
            F.size(F.filter(toks, _term_eq(t))).cast("long").alias(f"tf_{t}")
            for t in _TFIDF_TERMS
        ],
    )
    # Cache the narrow counts table: both the stats row and the scored
    # projection derive from `f`, and without the shared InMemory
    # relation the broadcast subtree re-runs the tokenizing corpus
    # scan a second time. `f` is doc_id + a few longs — ~16 B/row at
    # any scale, halving the corpus scans while keeping the plan lazy.
    f = shared(f)
    stats = f.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in _TFIDF_TERMS
        ],
    )
    score = None
    for t in _TFIDF_TERMS:
        term = F.col(f"tf_{t}") * (F.col("n_docs") - F.col(f"df_{t}"))
        score = term if score is None else score + term
    return (
        f.crossJoin(F.broadcast(stats))
        .withColumn("score", score)
        .withColumn(
            "score_per_1k",
            F.when(
                F.col("n_tokens") > 0,
                F.expr("(score * 1000) div n_tokens"),
            ),
        )
        .select(
            "doc_id",
            "n_tokens",
            *[f"tf_{t}" for t in _TFIDF_TERMS],
            "score",
            "score_per_1k",
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(25)
    )


def _bm25_oracle(terms: tuple[str, ...], k: int) -> str:
    """Generated from the SAME term list, k, and constants as the
    catalog call. The per-(doc,term) BM25 score is one double
    expression written with the IDENTICAL operation tree as the Spark
    column (every +,*,/ is exact-rounded IEEE on bit-identical
    operands; the one ln() per distinct (df) value matches cross-engine
    — the docs_unigram_nll precedent), then quantized to DECIMAL(18,6)
    BEFORE the cross-term sum so ordering and the final double are
    engine-free."""
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{t}" for t in terms
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in terms
    )
    term_exprs = "\n           + ".join(
        f"""CAST(ROUND(
               LN(1.0 + (CAST(n_docs - df_{t} AS DOUBLE) + 0.5)
                        / (CAST(df_{t} AS DOUBLE) + 0.5))
               * ((CAST(tf_{t} AS DOUBLE) * 2.2)
                  / (CAST(tf_{t} AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(n_tokens AS DOUBLE)
                       / (CAST(total_tokens AS DOUBLE)
                          / CAST(n_docs AS DOUBLE)))))),
               6) AS DECIMAL(18,6))"""
        for t in terms
    )
    return f"""
    WITH f AS (
      SELECT doc_id, len(toks) AS n_tokens,
             {tf_cols}
      FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents)
    ),
    s AS (SELECT COUNT(*) AS n_docs, SUM(n_tokens) AS total_tokens,
                 {df_cols}
          FROM f),
    scored AS (
      SELECT doc_id, n_tokens,
           {term_exprs} AS score_q
      FROM f CROSS JOIN s
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(score_q AS DOUBLE) AS score
    FROM scored
    ORDER BY score_q DESC, doc_id
    LIMIT {k}
    """


@query("docs_bm25_topk", oracle=_bm25_oracle(_TFIDF_TERMS, 15))
def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (Robertson-Sparck Jones, the Lucene/ES
    default ranking) over the same literal query-term set as
    ``docs_tfidf_topk`` — the REAL ranking function that entry's
    integer-weight variant approximates: tf saturation via
    k1=1.2 and document-length normalization via b=0.75, idf =
    ln(1 + (N - df + 0.5)/(df + 0.5)).

    Determinism: per-term scores quantize to DECIMAL(18,6) before the
    cross-term sum; top-k tie-breaks on doc_id (see _bm25_oracle).

    Scale: identical plan shape to docs_tfidf_topk — tf counts are
    codegen array filters in the corpus scan, (N, total_tokens, df_t)
    is a 1-row broadcast, top-k is TakeOrdered per-partition heaps. No
    inverted index needed for a literal query set.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    f = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        *[
            F.size(F.filter(toks, _term_eq(t))).cast("long").alias(f"tf_{t}")
            for t in _TFIDF_TERMS
        ],
    )
    # shared by the stats row and the scored projection (tfidf
    # precedent: halve the tokenizing corpus scans)
    f = shared(f)
    stats = f.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in _TFIDF_TERMS
        ],
    )
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")
    score_q = None
    for t in _TFIDF_TERMS:
        tf_d = F.col(f"tf_{t}").cast("double")
        df_c = F.col(f"df_{t}")
        idf = F.log(
            F.lit(1.0)
            + ((F.col("n_docs") - df_c).cast("double") + F.lit(0.5))
            / (df_c.cast("double") + F.lit(0.5))
        )
        tfpart = (tf_d * F.lit(2.2)) / (
            tf_d
            + F.lit(1.2)
            * (
                F.lit(0.25)
                + F.lit(0.75) * (F.col("n_tokens").cast("double") / avgdl)
            )
        )
        term = F.round(idf * tfpart, 6).cast("decimal(18,6)")
        score_q = term if score_q is None else score_q + term
    return (
        f.crossJoin(F.broadcast(stats))
        .withColumn("score_q", score_q)
        .orderBy(F.desc("score_q"), "doc_id")
        .limit(15)
        .select(
            "doc_id", "n_tokens", F.col("score_q").cast("double").alias("score")
        )
    )


def _dup_clusters_oracle(budget: int, overlap: int, width: int, threshold: float) -> str:
    """Generated from the SAME (budget, overlap, width, threshold) as
    the catalog call. Chunking, shingling, the Jaccard pair filter,
    and the transitive closure (a recursive CTE computing the min
    reachable label — DuckDB's equivalent of the iterative
    min-label-propagation operator) all derive from one place."""
    stride = budget - overlap
    w1 = width - 1
    return f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, {TOKS_SQL} AS toks FROM documents
      WHERE doc_id % 5 = 0
    ),
    c AS (
      SELECT doc_id, toks,
             unnest(generate_series(0,
               greatest(CAST(ceil((len(toks) - {overlap}) / {stride}.0) AS INT),
                        1) - 1)) AS chunk_idx
      FROM t
    ),
    ch AS (
      SELECT doc_id * 100000 + chunk_idx AS chunk_key,
             toks[chunk_idx*{stride} + 1 : chunk_idx*{stride} + {budget}] AS ctoks
      FROM c
    ),
    sh0 AS (
      SELECT chunk_key,
             unnest(list_distinct([array_to_string(ctoks[i:i+{w1}], ' ')
                    FOR i IN generate_series(1, len(ctoks) - {w1})])) AS shingle
      FROM ch WHERE len(ctoks) >= {width}
    ),
    sh AS (
      -- engine's hot-shingle cap (max_doc_freq=1000) replayed:
      -- dropped from join AND sizes
      SELECT chunk_key, shingle FROM sh0
      WHERE shingle NOT IN (
        SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) > 1000
      )
    ),
    sizes AS (SELECT chunk_key, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    inter AS (
      SELECT a.chunk_key AS ka, b.chunk_key AS kb, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.chunk_key < b.chunk_key
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT ka, kb FROM inter
      JOIN sizes sa ON sa.chunk_key = inter.ka
      JOIN sizes sb ON sb.chunk_key = inter.kb
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter)
            >= {threshold}
    ),
    edges AS (
      SELECT ka AS u, kb AS v FROM pairs
      UNION SELECT kb, ka FROM pairs
    ),
    reach(u, lbl) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.u = e.v
    ),
    cc AS (SELECT u, MIN(lbl) AS cluster_id FROM reach GROUP BY u),
    csz AS (SELECT cluster_id, COUNT(*) AS n_members FROM cc GROUP BY 1)
    SELECT cc.u AS chunk_key, cc.cluster_id,
           cc.u = cc.cluster_id AS is_canonical, csz.n_members
    FROM cc JOIN csz USING (cluster_id)
    """


@query(
    "docs_dup_clusters",
    oracle=_dup_clusters_oracle(budget=32, overlap=24, width=8, threshold=0.4),
)
def docs_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering end to end: pairwise similarity EDGES →
    transitive duplicate GROUPS via distributed connected components
    (min-label propagation + pointer doubling, clustering.py) → one
    canonical survivor per group.

    The pair graph is built over OVERLAPPING CHUNKS (32-token windows,
    24 overlap) so it contains genuine multi-hop chains at every scale
    factor: adjacent windows of a doc are near-dups (Jaccard ≈ 0.5-0.6
    on shared shingles), windows two strides apart are not — the
    transitive closure, not the pair list, is what groups a document's
    windows (plus any true cross-doc near-dups) into one cluster. The
    oracle replays chunking, shingling, Jaccard, and the closure as a
    recursive CTE, so cluster ids, canonical flags, and sizes are all
    hash-checked. The graph covers a deterministic 1-in-5 systematic
    sample (``doc_id % 5 = 0``, declared in both engines) — the
    operator is corpus-linear (see below), the sample just keeps this
    entry's bench share proportionate to the 6-7× row fan-out that
    32/8 chunking applies to the corpus.

    Scale: chunk shingle fan-out is bounded (a shingle lands in ≤
    budget/stride = 4 windows), the CC state is two longs per chunk,
    and convergence takes O(log chain-length) rounds — see
    clustering.py for the 100 TB argument.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    chunks = TR.chunk_documents(
        docs, budget=32, overlap=24, with_text=True
    ).filter(F.col("n_chunk_tokens") >= 8).select(
        (F.col("doc_id") * 100000 + F.col("chunk_idx")).cast("long").alias(
            "chunk_key"
        ),
        "chunk_text",
    )
    pairs = D.ngram_jaccard_pairs(
        chunks, key_col="chunk_key", text_col="chunk_text", width=8, threshold=0.4
    )
    return C.dup_clusters(pairs).select(
        F.col("node").alias("chunk_key"), "cluster_id", "is_canonical", "n_members"
    )


@query(
    "training_data_assembly",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, text,
             regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, lang, text, len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_uniq
      FROM t
    ),
    q AS (
      SELECT * FROM s
      WHERE n_tokens BETWEEN 20 AND 1000
        AND CAST(n_uniq AS DOUBLE) / n_tokens > 0.2
    ),
    d AS (
      SELECT *, row_number() OVER (PARTITION BY md5(lower(trim(text)))
                                   ORDER BY doc_id) AS rn
      FROM q
    )
    SELECT d.doc_id, d.lang, d.n_tokens, d.n_uniq AS n_uniq_tokens,
           e.label, len(e.embedding) AS dim
    FROM d JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE d.rn = 1
    """,
)
def training_data_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone pipeline query — the LLM-training-data shape end to
    end: quality filter (token-count band + lexical diversity) →
    exact dedup (min-key survivor per fingerprint) → join document
    embeddings → emit the training-record projection. One window
    shuffle for dedup + one join shuffle; the text column is dropped
    before the join so the shuffle carries metadata only. The input
    is projected to the three columns the pipeline touches BEFORE the
    opaque-ish score/dedup operators (guide §6: the un-projected form
    read source and n_chars into the scan's ReadSchema for nothing —
    column pruning can't see through the downstream fingerprint
    window)."""
    docs = X.with_quality_score(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    )
    good = docs.filter(F.col("quality_flag") == "good")
    kept = D.exact_dedup(
        good, keep_cols=["doc_id", "lang", "n_tokens", "n_uniq_tokens"]
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "label", F.size("embedding").alias("dim")
    )
    return kept.join(emb, "doc_id")


def _bpe_oracle() -> str:
    """Generated from the SAME regex-class constants as
    with_bpe_token_stats; the pattern subset is chosen to evaluate
    identically under Java regex and RE2."""
    w, d, o = X.BPE_WORD_RE, X.BPE_DIGIT_RE, X.BPE_OTHER_RE
    return f"""
    SELECT doc_id,
           CAST(len({TOKS_SQL}) AS BIGINT) AS n_ws_tokens,
           CAST(nw + nd + no AS BIGINT) AS n_bpe_tokens,
           CAST(nw AS BIGINT) AS n_word_tokens,
           CAST(nd AS BIGINT) AS n_digit_tokens,
           CAST(no AS BIGINT) AS n_other_tokens,
           CASE WHEN len({TOKS_SQL}) > 0
                THEN CAST((nw + nd + no) * 100 AS BIGINT)
                     / len({TOKS_SQL}) END AS bpe_per_100_ws
    FROM (
      SELECT doc_id, text,
             len(regexp_extract_all(text, '{w}')) AS nw,
             len(regexp_extract_all(text, '{d}')) AS nd,
             len(regexp_extract_all(text, '{o}')) AS no
      FROM documents
    )
    """


@query("docs_bpe_token_stats", oracle=_bpe_oracle())
def docs_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-ish regex variant (north_star §2.13:
    whitespace + BPE-ish): per-doc whitespace-vs-pretokenizer budget
    profile with per-class counts and the fertility ratio. One
    codegen'd projection over the corpus scan — the oracle shares the
    exact pattern constants, so the two engines cannot drift."""
    docs = load_table(spark, sf_dir, "documents")
    return X.with_bpe_token_stats(docs).select(
        "doc_id",
        "n_ws_tokens",
        "n_bpe_tokens",
        "n_word_tokens",
        "n_digit_tokens",
        "n_other_tokens",
        "bpe_per_100_ws",
    )


@query(
    "docs_editdist_verify",
    oracle=f"""
    SELECT p.doc_a, p.doc_b,
           CAST(levenshtein(substr(da.text, 1, 64), substr(db.text, 1, 64))
                AS BIGINT) AS prefix_editdist,
           p.jaccard
    FROM ({JACCARD_CAPPED_SQL}) p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    """,
)
def docs_editdist_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verify stage: Levenshtein over 64-char prefixes
    of each candidate near-dup pair — the character-level second
    opinion on the token-level Jaccard signal (classic Levenshtein is
    implemented identically in both engines, so the distances
    hash-match exactly).

    Scale: Levenshtein is O(len²) PER PAIR — the whole design point is
    that it runs only on the candidate pair set (near-linear, from
    LSH/shingle blocking) and only on bounded prefixes, never on the
    corpus cross product. Two co-partitioned joins fetch the prefix
    payloads; the quadratic kernel touches 64×64 cells per pair.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_cached(spark, sf_dir, docs).select(
        "doc_a", "doc_b", "jaccard"
    )
    pa = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.substring("text", 1, 64).alias("_ta"),
    )
    pb = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.substring("text", 1, 64).alias("_tb"),
    )
    return (
        pairs.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("_ta", "_tb").cast("long").alias("prefix_editdist"),
            "jaccard",
        )
    )


@query(
    "docs_gopher_rules",
    oracle=f"""
    WITH s AS (
      SELECT lang,
             len(toks) AS n_toks,
             CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
               / len(toks) AS mean_len,
             len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','it')))
               AS n_stop,
             len(list_distinct(toks)) AS n_uniq
      FROM (SELECT lang, text, {TOKS_SQL} AS toks FROM documents)
    ),
    r AS (
      SELECT lang,
             COALESCE(n_toks >= 50 AND n_toks <= 100000, FALSE) AS r_word_count,
             COALESCE(mean_len >= 3.0 AND mean_len <= 10.0, FALSE) AS r_word_len,
             COALESCE(n_stop >= 2, FALSE) AS r_stopwords,
             COALESCE(CAST(n_uniq AS DOUBLE) / n_toks > 0.2, FALSE) AS r_diversity
      FROM s
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN NOT r_word_count THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_word_count,
           CAST(SUM(CASE WHEN NOT r_word_len THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_word_len,
           CAST(SUM(CASE WHEN NOT r_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stopwords,
           CAST(SUM(CASE WHEN NOT r_diversity THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_diversity,
           CAST(SUM(CASE WHEN r_word_count AND r_word_len AND r_stopwords
                         AND r_diversity THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
    FROM r GROUP BY 1
    """,
)
def docs_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality rules (published pretraining
    filter heuristics: word-count band, mean-word-length band, minimum
    stopword evidence, diversity floor), reported as per-language
    failure counts per rule plus the all-rules pass count — the
    corpus-curation dashboard a 100 TB filtering run is driven by.

    Scale: one pass, all four predicates codegen'd in the same
    projection as the token stats; the rollup shuffles |langs| rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    flags = X.with_gopher_flags(docs)
    fail = lambda c: F.sum(F.when(~F.col(c), 1).otherwise(0))  # noqa: E731
    return flags.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        fail("r_word_count").alias("n_fail_word_count"),
        fail("r_word_len").alias("n_fail_word_len"),
        fail("r_stopwords").alias("n_fail_stopwords"),
        fail("r_diversity").alias("n_fail_diversity"),
        F.sum(F.when(F.col("r_pass"), 1).otherwise(0)).alias("n_pass"),
    )


@query(
    "docs_boilerplate_ngrams",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(toks[i:i+1], ' ')
                    FOR i IN generate_series(1, greatest(len(toks)-1, 1))]))
               AS shingle
      FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents)
    ),
    boiler AS (
      SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) >= 20
    )
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler,
           CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS boiler_frac
    FROM sh LEFT JOIN boiler b ON sh.shingle = b.shingle
    GROUP BY doc_id
    """,
)
def docs_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate scoring: bigrams present in ≥20
    documents are 'boilerplate'; every document reports the fraction
    of its distinct bigrams that are boilerplate (template/chrome
    removal signal — the cross-document complement of the
    within-document ``docs_repetition``).

    Scale: shuffle on the shingle for document frequency (counts, not
    countDistinct — shingles are pre-deduped per doc), join back, re-agg
    on doc_id. See ``text.boilerplate_stats`` for the 100 TB notes
    (min_docs scales with corpus; heavy-hitter set stays broadcastable).
    """
    docs = load_table(spark, sf_dir, "documents")
    return X.boilerplate_stats(docs, width=2, min_docs=20)


@query(
    "docs_containment",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ),
    sh0 AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(toks[i:i+7], ' ')
                    FOR i IN generate_series(1, greatest(len(toks)-7, 1))]))
               AS shingle
      FROM t
    ),
    sh AS (
      SELECT doc_id, shingle FROM sh0
      WHERE shingle NOT IN (
        SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) > 1000
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    j AS (
      SELECT i.doc_a, i.doc_b, i.n_inter, sa.n_shingles AS n_a, sb.n_shingles AS n_b
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
    ),
    d AS (
      SELECT doc_a AS doc_sub, doc_b AS doc_sup, n_inter,
             CAST(n_inter AS DOUBLE) / n_a AS containment FROM j
      UNION ALL
      SELECT doc_b, doc_a, n_inter, CAST(n_inter AS DOUBLE) / n_b FROM j
    )
    SELECT * FROM d WHERE containment >= 0.9
    """,
)
def docs_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection: documents ≥90% shingle-contained
    in another (prefix/subset duplicates symmetric Jaccard
    under-scores). One row per contained direction.

    Scale: identical join topology to ``docs_ngram_jaccard`` — one
    bounded shingle equi-join with the df>1000 hot-shingle cap
    (replayed in the oracle); the directional expansion is a
    projection.
    """
    docs = load_table(spark, sf_dir, "documents")
    return D.containment_pairs(docs, width=8, threshold=0.9)


MIXTURE_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}


def _mixture_oracle() -> str:
    """Generated from MIXTURE_WEIGHTS — one source of truth for both
    engines (same pattern as the PII and split oracles)."""
    arms = " ".join(
        f"WHEN source = '{src}' THEN "
        + (
            "TRUE"
            if float(w) >= 1.0
            else f"substring(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8) < '{format(int(float(w) * 16**8), '08x')}'"
        )
        for src, w in MIXTURE_WEIGHTS.items()
    )
    return f"""
    WITH kept AS (
      SELECT source, doc_id FROM documents
      WHERE CASE {arms} ELSE TRUE END
    )
    SELECT d.source,
           COUNT(*) AS n_input,
           CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM documents d LEFT JOIN kept k
      ON d.doc_id = k.doc_id AND d.source = k.source
    GROUP BY d.source
    """


@query("docs_mixture_sample", oracle=_mixture_oracle())
def docs_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture/curriculum downsampling (training.py
    ``mixture_sample``): per-source keep rates via content-addressed
    hex-threshold draws (src0 kept fully, src1 at 50%, src2 at 25%,
    src3 at 10%, the other sources untouched); output per-source
    input/kept counts. Membership is RNG-free and engine-portable, so
    the counts hash-match exactly — unlike sampleBy, which is seeded
    per-partitioning.

    Scale: the filter is a codegen'd projection on the scan; the count
    rollup shuffles |sources| rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    kept = TR.mixture_sample(docs, MIXTURE_WEIGHTS, salt="mix").groupBy(
        "source"
    ).agg(F.count(F.lit(1)).alias("n_kept"))
    n_in = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_input"))
    return n_in.join(kept, "source", "left").select(
        "source", "n_input", F.coalesce("n_kept", F.lit(0)).alias("n_kept")
    )


@query(
    "docs_shard_manifest",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || ':shard'),
                                         1, 8)) AS BIGINT) % 8 AS shard_id,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS fp
      FROM documents
    )
    SELECT shard_id, COUNT(*) AS n_rows,
           CAST(SUM(fp // 1073741824) AS BIGINT) AS content_sum_hi,
           CAST(SUM(fp % 1073741824) AS BIGINT) AS content_sum_lo
    FROM s GROUP BY 1
    """,
)
def docs_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export-side shard manifest (training.py ``shard_assign`` /
    ``write_training_shards``): content-addressed shard ids (md5 mod n,
    RNG-free, layout-stable) with per-shard counts and an
    order-invariant content fingerprint (commutative sum of per-row
    md5 prefixes) — what a training-data consumer verifies before
    reading the shards. The 15-hex-char fingerprints (< 2⁶⁰) are
    summed as two exact integer lanes (hi = fp div 2³⁰, lo = fp mod
    2³⁰) — a decimal-sum-cast-double diverged between engines in the
    last ulp; integer lanes cannot.

    Scale: a codegen projection plus one |shards|-row rollup; the
    actual file write (repartition + sortWithinPartitions +
    partitionBy) is exercised in tests — file count == shard count, no
    small-file explosion.
    """
    docs = load_table(spark, sf_dir, "documents")
    sharded = TR.shard_assign(docs, 8, "doc_id", "shard")
    fp = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    return sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.shiftright(fp, 30)).alias("content_sum_hi"),
        F.sum(fp % F.lit(1 << 30)).alias("content_sum_lo"),
    )


@query(
    "docs_dedup_keep_best",
    oracle="WITH RECURSIVE " + JACCARD_PAIR_CTES + f""",
    edges AS (SELECT da AS u, db AS v FROM pairs UNION SELECT db, da FROM pairs),
    reach(u, lbl) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.u = e.v
    ),
    cc AS (SELECT u, MIN(lbl) AS cluster_id FROM reach GROUP BY u),
    m AS (
      SELECT cc.u AS doc_id, cc.cluster_id, d.source, d.n_chars
      FROM cc JOIN documents d ON cc.u = d.doc_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY cluster_id
                                   ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM m
    ),
    dropped AS (SELECT source, COUNT(*) AS n FROM ranked WHERE rn > 1 GROUP BY 1),
    dup AS (SELECT source, COUNT(*) AS n FROM m GROUP BY 1),
    tot AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1)
    SELECT t2.source, t2.n_docs,
           COALESCE(dup.n, 0) AS n_in_dup_clusters,
           COALESCE(dropped.n, 0) AS n_dropped,
           t2.n_docs - COALESCE(dropped.n, 0) AS n_kept
    FROM tot t2
    LEFT JOIN dup ON dup.source = t2.source
    LEFT JOIN dropped ON dropped.source = t2.source
    """,
)
def docs_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end near-dup dedup flow a pretraining pipeline runs:
    exact-Jaccard pairs (hot-shingle-capped) → transitive duplicate
    clusters (connected components) → keep the BEST member per
    cluster (longest text, ties to the lower doc_id) → per-source
    kept/dropped accounting. Everything downstream of the pair list —
    closure, survivor choice, counts — is replayed in SQL (recursive
    CTE), so the whole pipeline is hash-checked.

    Scale: the cluster/survivor stages run on the near-dup SUBSET
    (pair members), not the corpus — the row_number window partitions
    by cluster over that subset only, and the final counts are
    map-side-combinable aggregates on the full corpus scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_cached(spark, sf_dir, docs).select(
        "doc_a", "doc_b"
    )
    cc = C.dup_clusters(pairs).select("node", "cluster_id")
    meta = docs.select("doc_id", "source", "n_chars")
    m = cc.join(meta, cc.node == meta.doc_id).select(
        "doc_id", "cluster_id", "source", "n_chars"
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("cluster_id").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    )
    ranked = m.withColumn("rn", rn)
    dropped = ranked.filter(F.col("rn") > 1).groupBy("source").agg(
        F.count(F.lit(1)).alias("_nd")
    )
    dup = m.groupBy("source").agg(F.count(F.lit(1)).alias("_nm"))
    tot = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tot.join(dup, "source", "left")
        .join(dropped, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("_nm"), F.lit(0)).alias("n_in_dup_clusters"),
            F.coalesce(F.col("_nd"), F.lit(0)).alias("n_dropped"),
            (F.col("n_docs") - F.coalesce(F.col("_nd"), F.lit(0))).alias(
                "n_kept"
            ),
        )
    )


@query(
    "docs_substring_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    w AS (
      SELECT doc_id,
             md5(unnest(list_distinct([array_to_string(toks[i:i+31], ' ')
                 FOR i IN generate_series(1, greatest(len(toks)-31, 1))])))
               AS wfp
      FROM t
    ),
    freq AS (SELECT wfp, COUNT(*) AS df FROM w GROUP BY 1)
    SELECT w.doc_id,
           COUNT(*) AS n_windows,
           CAST(COALESCE(SUM(CASE WHEN freq.df >= 2 THEN 1 END), 0)
                AS BIGINT) AS n_dup_windows,
           CAST(COALESCE(SUM(CASE WHEN freq.df >= 2 THEN 1 END), 0) AS DOUBLE)
             / COUNT(*) AS dup_fraction
    FROM w JOIN freq USING (wfp)
    GROUP BY w.doc_id
    """,
)
def docs_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication scan (the Lee-et-al.-2022 exact
    substring dedup signal, window-granular): every distinct 32-token
    window is fingerprinted, windows appearing in ≥2 documents are
    duplicated spans, and each document reports its duplicated-window
    fraction — the per-doc signal a pretraining pipeline uses to cut
    boilerplate-heavy documents or route spans to removal.

    Scale: windows shuffle as 16-byte md5 fingerprints, never text;
    the document-frequency aggregate is map-side combinable, and the
    join back to docs is on the same fingerprint key (one shuffle
    reused). A 32-token window in k docs contributes k rows — linear,
    no pair expansion anywhere (contrast the Jaccard join).
    """
    docs = load_table(spark, sf_dir, "documents")
    # the window-fingerprint table feeds the document-frequency
    # aggregate AND the final per-doc join — shared() so the
    # 32-token shingle+md5 pass runs once, not twice (r11)
    w = shared(
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(X.shingle_array(F.col("text"), 32))
            ).alias("_w"),
        ).select("doc_id", F.md5("_w").alias("wfp"))
    )
    freq = w.groupBy("wfp").agg(F.count(F.lit(1)).alias("df"))
    dup = F.sum(F.when(F.col("df") >= 2, 1)).cast("long")
    return (
        w.join(freq, "wfp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.coalesce(dup, F.lit(0)).alias("n_dup_windows"),
            (
                F.coalesce(dup, F.lit(0)).cast("double") / F.count(F.lit(1))
            ).alias("dup_fraction"),
        )
    )


# Shared CTE body: per-doc (n_tokens, avg_nll) under the corpus
# unigram LM — the oracle twin of operators/text.py:unigram_nll,
# reused by docs_unigram_nll and docs_perplexity_buckets.
UNIGRAM_NLL_SQL = f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
    vocab AS (SELECT tk, COUNT(*) AS cnt FROM tok GROUP BY 1),
    tot AS (SELECT SUM(cnt) AS total FROM vocab),
    nll AS (
      SELECT tk,
             CAST(ROUND(LN(CAST(total AS DOUBLE) / cnt), 6)
                  AS DECIMAL(18,6)) AS nll_q
      FROM vocab, tot
    ),
    doc_nll AS (
      SELECT tok.doc_id,
             COUNT(*) AS n_tokens,
             CAST(SUM(nll.nll_q) AS DOUBLE) / COUNT(*) AS avg_nll
      FROM tok JOIN nll USING (tk)
      GROUP BY tok.doc_id
    )
"""


@query(
    "docs_unigram_nll",
    oracle=UNIGRAM_NLL_SQL + "SELECT doc_id, n_tokens, avg_nll FROM doc_nll",
)
def docs_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM quality score (the CCNet-style perplexity-filter
    signal, with the corpus itself as the LM): per document, the mean
    negative log-likelihood of its tokens under corpus unigram
    frequencies — low = common boilerplate-ish text, high = rare
    vocabulary. Documents with no tokens have no defined score and
    are omitted (same grouping semantics in both engines).

    Cross-engine determinism: per-token NLL is quantized to
    DECIMAL(18,6) BEFORE the per-doc sum, so the (order-free) decimal
    sum is exact in both engines and only the final mean divides in
    double. The one ln() per DISTINCT token is computed from the same
    double division in both engines.

    Scale: the vocab is a map-side-combinable count; the token→NLL
    join is broadcast-able (a natural-language unigram vocab is
    millions of rows, not fact-sized) and the per-doc agg is one
    shuffle on doc_id. Shared with ``docs_perplexity_buckets`` via
    operators/text.py:unigram_nll.
    """
    docs = load_table(spark, sf_dir, "documents")
    return X.unigram_nll(docs).select("doc_id", "n_tokens", "avg_nll")


@query(
    "docs_perplexity_buckets",
    oracle=UNIGRAM_NLL_SQL
    + """,
    bounds AS (
      SELECT quantile_disc(avg_nll, 0.3333333333333333) AS b1,
             quantile_disc(avg_nll, 0.6666666666666666) AS b2
      FROM doc_nll
    )
    SELECT doc_id, n_tokens, avg_nll,
           CASE WHEN avg_nll <= b1 THEN 'head'
                WHEN avg_nll <= b2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM doc_nll CROSS JOIN bounds
    """,
)
def docs_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): split the
    corpus into head/middle/tail TERCILES of the unigram-LM score —
    the data-mixing step downstream samplers key on (head = most
    fluent). ``docs_unigram_nll`` computes the signal; this entry is
    the global-quantile + join-back assignment operator.

    Determinism: the tercile boundaries are ``percentile_disc``
    (actual data values, no interpolation — the events_percentiles
    precedent) over avg_nll doubles that are themselves bit-identical
    cross-engine (decimal-quantized sums, one division); bucket
    assignment is then pure comparison.

    Scale: boundaries are a 1-row global aggregate broadcast back to
    the corpus — NOT an ntile() global-sort window, which would pull
    every row through one partition. Exact disc quantiles at this
    corpus scale; for the billions-of-docs regime swap the bounds
    aggregate for approx_percentile and the assignment is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Cache the narrow per-doc scores: both the bounds aggregate and
    # the assignment join consume `base`, and without the shared
    # InMemory relation the broadcast subtree re-runs the tokenize +
    # vocab-join corpus scan a second time (the docs_tfidf_topk
    # precedent). (doc_id, 2 numbers) — ~24 B/row at any scale.
    base = shared(X.unigram_nll(docs))
    bounds = base.agg(
        F.expr(
            "percentile_disc(0.3333333333333333) WITHIN GROUP (ORDER BY avg_nll)"
        ).alias("b1"),
        F.expr(
            "percentile_disc(0.6666666666666666) WITHIN GROUP (ORDER BY avg_nll)"
        ).alias("b2"),
    )
    return base.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        "n_tokens",
        "avg_nll",
        F.when(F.col("avg_nll") <= F.col("b1"), "head")
        .when(F.col("avg_nll") <= F.col("b2"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


@query(
    "docs_winnowing",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(toks[i:i+7], ' ')) AS fp
      FROM t, LATERAL unnest(generate_series(1, greatest(len(toks)-7, 1))) AS u(i)
    ),
    w AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_grams,
             MIN(fp) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
      FROM g
    )
    SELECT doc_id,
           MAX(n_grams) AS n_grams,
           COUNT(DISTINCT CASE WHEN pos <= greatest(n_grams - 4, 0)
                               THEN wmin END) AS n_fingerprints,
           CAST(COUNT(DISTINCT CASE WHEN pos <= greatest(n_grams - 4, 0)
                                    THEN wmin END) AS DOUBLE)
             / MAX(n_grams) AS density
    FROM w GROUP BY doc_id
    """,
)
def docs_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS
    local-fingerprinting scheme; north_star doc fingerprinting at span
    granularity): hash every 8-token shingle, slide a guarantee window
    of w=4 consecutive hashes, select the window minimum — any shared
    span of >= w+k-1 tokens between two documents is then guaranteed to
    share a selected fingerprint. Output per doc: gram count, distinct
    selected fingerprints, selection density (theory: ~2/(w+1) = 0.4
    on random text).

    Cross-engine determinism: the "hash" ordering is the md5 hex
    string itself — lexicographic min over lowercase hex is identical
    in every engine, so no integer-hash replay is needed (contrast
    SIMHASH_SQL's block reconstruction).

    Scale: positions come from one posexplode (no pair space); the
    sliding min is a bounded ROWS window, and the count-distinct
    rollup re-keys on (doc_id, fingerprint) — two doc-key-prefixed
    exchanges total, both linear in gram count. Fingerprints shuffle
    as 32-byte hex, never text.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    g = docs.select(
        "doc_id",
        F.posexplode(X.shingle_array(F.col("text"), 8)).alias("pos", "_gram"),
    ).select("doc_id", "pos", F.md5("_gram").alias("fp"))
    wfull = W.partitionBy("doc_id")
    wslide = (
        W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.currentRow, 3)
    )
    sel = g.select(
        "doc_id",
        "pos",
        F.count(F.lit(1)).over(wfull).alias("n_grams"),
        F.min("fp").over(wslide).alias("wmin"),
    )
    picked = F.when(
        F.col("pos") <= F.greatest(F.col("n_grams") - 4, F.lit(0)),
        F.col("wmin"),
    )
    return sel.groupBy("doc_id").agg(
        F.max("n_grams").alias("n_grams"),
        F.count_distinct(picked).alias("n_fingerprints"),
        (
            F.count_distinct(picked).cast("double") / F.max("n_grams")
        ).alias("density"),
    )


@query(
    "docs_token_entropy",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
    cnts AS (SELECT doc_id, tk, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
    s AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_distinct,
             SUM(CAST(ROUND(cnt * LN(cnt), 6) AS DECIMAL(18,6))) AS cl
      FROM cnts GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_distinct,
           CAST(CAST(ROUND(n_tokens * LN(CAST(n_tokens AS DOUBLE)), 6)
                     AS DECIMAL(18,6)) - cl AS DOUBLE)
             / n_tokens AS entropy
    FROM s
    """,
)
def docs_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon token entropy (the lexical-diversity signal
    a pretraining quality filter pairs with the repetition ratio): with
    per-doc token counts c_i and N tokens, H = ln N - (1/N) * SUM c_i
    ln c_i. Low entropy = repeated-token boilerplate, high = diverse
    vocabulary. Empty documents have no defined entropy and are
    omitted by the grouping in both engines.

    Cross-engine determinism: each c*ln(c) term AND the N*ln(N) term
    are quantized to DECIMAL(18,6) (the docs_unigram_nll pattern —
    quantization also absorbs any 1-ulp libm ln() divergence between
    JVM and C, which a first draft of this entry measurably hit), the
    subtraction is exact decimal, and only the final divide runs in
    double.

    Scale: one explode + one (doc_id, token) map-side-combinable agg +
    one doc_id agg — counts shuffle, never text.
    """
    docs = load_table(spark, sf_dir, "documents")
    cnts = (
        docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("tk"))
        .groupBy("doc_id", "tk")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    s = cnts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(
            F.round(F.col("cnt") * F.log(F.col("cnt")), 6).cast(
                "decimal(18,6)"
            )
        ).alias("cl"),
    )
    nl = F.round(
        F.col("n_tokens") * F.log(F.col("n_tokens").cast("double")), 6
    ).cast("decimal(18,6)")
    return s.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        ((nl - F.col("cl")).cast("double") / F.col("n_tokens")).alias(
            "entropy"
        ),
    )


@query(
    "docs_zipf_fit",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT unnest(toks) AS tk FROM t),
    vocab AS (SELECT tk, COUNT(*) AS cnt FROM tok GROUP BY 1),
    ranked AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, tk) AS rnk
      FROM vocab
    ),
    pts AS (
      SELECT CAST(ROUND(LN(CAST(rnk AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
             CAST(ROUND(LN(CAST(cnt AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
      FROM ranked
    ),
    s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM pts
    )
    SELECT n AS n_vocab,
           (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0)
             AS zipf_slope,
           (sy - (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) * sx)
             / n AS zipf_intercept
    FROM s
    """,
)
def docs_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf's-law fit: least-squares slope of ln(frequency) on
    ln(rank) over the unigram vocabulary (natural text ~ -1; the
    corpus-health metric that catches templated / machine-generated
    corpora whose token distribution is too flat or too peaked).

    Cross-engine determinism: ln(rank)/ln(cnt) points are quantized to
    DECIMAL(18,6), the regression sums (sum x, y, xy, x^2) accumulate
    in exact decimal (order-free), and only the closed-form slope /
    intercept arithmetic runs in double — written token-for-token
    identically in both engines. regr_slope() exists in both but sums
    doubles in engine-dependent order, so it is deliberately avoided.

    Scale: vocab count is map-side combinable; the global rank is a
    window over the AGGREGATED vocab (millions of rows, the
    user-deciles single-partition caveat applies and the same
    approx-boundary swap-in is documented there); the regression
    reduce is one row.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    vocab = (
        docs.select(F.explode(X.tokens(F.col("text"))).alias("tk"))
        .groupBy("tk")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = vocab.select(
        "cnt",
        F.row_number()
        .over(W.orderBy(F.desc("cnt"), F.asc("tk")))
        .alias("rnk"),
    )
    pts = ranked.select(
        F.round(F.log(F.col("rnk").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("x"),
        F.round(F.log(F.col("cnt").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    # NULLIF guard: a degenerate single-word vocabulary zeroes the
    # denominator — DuckDB's double division returns NULL, but Spark
    # runs ANSI mode where x/0 RAISES; nullif makes both engines
    # yield NULL.
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    return s.select(
        F.col("n").alias("n_vocab"),
        slope.alias("zipf_slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias(
            "zipf_intercept"
        ),
    )


@query(
    "docs_zipf_fit_scalable",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    tok AS (SELECT unnest(toks) AS tk FROM t),
    vocab AS (SELECT tk, COUNT(*) AS cnt FROM tok GROUP BY 1),
    grp AS (SELECT cnt, COUNT(*) AS n_in_grp FROM vocab GROUP BY 1),
    offs AS (
      SELECT cnt,
             COALESCE(SUM(n_in_grp) OVER (ORDER BY cnt DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS base
      FROM grp
    ),
    ranked AS (
      SELECT v.cnt,
             o.base + row_number() OVER (PARTITION BY v.cnt
                                         ORDER BY v.tk) AS rnk
      FROM vocab v JOIN offs o USING (cnt)
    ),
    pts AS (
      SELECT CAST(ROUND(LN(CAST(rnk AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
             CAST(ROUND(LN(CAST(cnt AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
      FROM ranked
    ),
    s AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM pts
    )
    SELECT n AS n_vocab,
           (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0)
             AS zipf_slope,
           (sy - (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) * sx)
             / n AS zipf_intercept
    FROM s
    """,
)
def docs_zipf_fit_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``docs_zipf_fit`` with the global rank DECOMPOSED — the last of
    the three single-partition sorts (VERDICT r06 item 1), and unlike
    the quantile-banded entries this swap is EXACT: rank under
    ``(cnt DESC, tk ASC)`` equals ``base(cnt) + row_number within the
    cnt group``, where ``base(cnt)`` is the running count of vocab
    items with strictly higher frequency. Identical output to the
    exact entry, bit for bit (gated in tests/test_banded_quantiles.py).

    Scale: the ONLY unpartitioned window runs over DISTINCT FREQUENCY
    VALUES (``grp`` — a Zipfian vocabulary of V items has ~O(√V)
    distinct counts: every count in the long tail is shared by many
    items), and the per-item row_number partitions by ``cnt`` — the
    hot group is cnt=1 (the hapax half of the vocabulary), which at
    the billions-of-types regime is itself salt-splittable since
    within-group order only needs to be SOME total order consistent
    across engines. The offs relation broadcasts back to vocab.

    Cross-engine determinism: identical decomposition replayed in the
    oracle; ln-points quantized to DECIMAL(18,6) and regression sums
    accumulate in exact decimal, as in the exact entry.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    vocab = (
        docs.select(F.explode(X.tokens(F.col("text"))).alias("tk"))
        .groupBy("tk")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    grp = vocab.groupBy("cnt").agg(F.count(F.lit(1)).alias("n_in_grp"))
    offs = grp.select(
        "cnt",
        F.coalesce(
            F.sum("n_in_grp").over(
                W.orderBy(F.desc("cnt")).rowsBetween(
                    W.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("base"),
    )
    ranked = vocab.join(F.broadcast(offs), "cnt").select(
        "cnt",
        (
            F.col("base")
            + F.row_number().over(
                W.partitionBy("cnt").orderBy("tk")
            )
        ).alias("rnk"),
    )
    pts = ranked.select(
        F.round(F.log(F.col("rnk").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("x"),
        F.round(F.log(F.col("cnt").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    return s.select(
        F.col("n").alias("n_vocab"),
        slope.alias("zipf_slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias(
            "zipf_intercept"
        ),
    )


@query(
    "docs_dsir_weights",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {TOKS_SQL} AS toks FROM documents),
    tok AS (
      SELECT doc_id, lang,
             (strpos('0123456789abcdef', substr(md5(tk), 31, 1)) - 1) * 16
              + strpos('0123456789abcdef', substr(md5(tk), 32, 1)) - 1 AS b
      FROM (SELECT doc_id, lang, unnest(toks) AS tk FROM t)
    ),
    allc AS (SELECT b, COUNT(*) AS na FROM tok GROUP BY 1),
    tgtc AS (SELECT b, COUNT(*) AS nt FROM tok WHERE lang = 'en' GROUP BY 1),
    tot AS (
      SELECT (SELECT COUNT(*) FROM tok) AS na_tot,
             (SELECT COUNT(*) FROM tok WHERE lang = 'en') AS nt_tot
    ),
    terms AS (
      SELECT allc.b,
             CAST(ROUND(LN(
               (CAST(COALESCE(tgtc.nt, 0) + 1 AS DOUBLE)
                  * (tot.na_tot + 256))
               / (CAST(allc.na + 1 AS DOUBLE) * (tot.nt_tot + 256))
             ), 8) AS DECIMAL(18,8)) AS term
      FROM allc LEFT JOIN tgtc ON allc.b = tgtc.b, tot
    )
    SELECT tok.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(terms.term) AS DOUBLE) AS log_weight
    FROM tok JOIN terms ON tok.b = terms.b
    GROUP BY tok.doc_id
    """,
)
def docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    per-document log importance weight log p_target/p_raw under
    hashed-unigram bag-of-words LMs — the data-selection score used to
    resample a raw crawl toward a target domain (here: the 'en'
    slice as the target). Features are md5-derived 256-bucket hashed
    unigrams (engine-neutral); both LMs use add-one smoothing.

    Cross-engine determinism: each bucket's log-ratio is ONE double
    expression written identically in both engines (products of exact
    integer counts, one division, one ln), quantized to
    DECIMAL(18,8) (absorbing libm ulp drift) before the order-free
    per-doc decimal sum; one final double cast.

    Scale: bucket tables are ≤256 rows (broadcast); the corpus is
    scanned once for features; per-doc weights are one
    map-side-combinable agg keyed by doc_id. This is the property
    that makes DSIR viable at 100 TB: the "language model" is a
    256-row table, not a model artifact.
    """
    docs = load_table(spark, sf_dir, "documents")
    # the hashed token stream feeds the bucket counts AND the final
    # per-doc weight join — shared() so tokenize+md5 runs once, not
    # four times (r11); the two bucket LMs and the corpus totals all
    # come from ONE map-combinable aggregate over it (na and nt fused
    # into a single groupBy — a missing target bucket is nt=0, the
    # exact value the old left-join COALESCE produced)
    tok = shared(
        docs.select(
            "doc_id", "lang", F.explode(X.tokens(F.col("text"))).alias("tk")
        ).select(
            "doc_id",
            "lang",
            F.conv(F.substring(F.md5("tk"), 31, 2), 16, 10)
            .cast("int")
            .alias("b"),
        )
    )
    bucket = tok.groupBy("b").agg(
        F.count(F.lit(1)).alias("na"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("nt"),
    )
    tot = bucket.agg(
        F.sum("na").alias("na_tot"),
        F.sum("nt").alias("nt_tot"),
    )
    terms = (
        bucket.crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("nt"), F.lit(0)) + 1).cast("double")
                        * (F.col("na_tot") + 256)
                    )
                    / (
                        (F.col("na") + 1).cast("double")
                        * (F.col("nt_tot") + 256)
                    )
                ),
                8,
            )
            .cast("decimal(18,8)")
            .alias("term"),
        )
    )
    return (
        tok.join(F.broadcast(terms), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("term").cast("double").alias("log_weight"),
        )
    )


@query(
    "docs_incremental_dedup",
    oracle="""
    WITH ex AS (
      SELECT doc_id, source, md5(lower(trim(text))) AS fp FROM documents
    ),
    batch AS (
      SELECT doc_id + (SELECT COUNT(*) FROM documents) AS doc_id,
             source,
             md5(lower(trim(CASE WHEN doc_id % 2 = 0 THEN text
                                 ELSE text || ' v2' END))) AS fp
      FROM documents
    ),
    vs_ex AS (
      SELECT b.*, EXISTS (SELECT 1 FROM ex WHERE ex.fp = b.fp) AS dup_ex
      FROM batch b
    ),
    keep AS (
      SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM vs_ex WHERE NOT dup_ex
    )
    SELECT source,
           (SELECT COUNT(*) FROM batch b2 WHERE b2.source = v.source)
             AS n_batch,
           CAST(COALESCE(SUM(CASE WHEN dup_ex THEN 1 END), 0) AS BIGINT)
             AS n_dropped_vs_existing,
           CAST((SELECT COUNT(*) FROM keep k
                 WHERE k.source = v.source AND k.rn > 1) AS BIGINT)
             AS n_dropped_within_batch,
           CAST((SELECT COUNT(*) FROM keep k
                 WHERE k.source = v.source AND k.rn = 1) AS BIGINT)
             AS n_loaded
    FROM vs_ex v
    GROUP BY source
    """,
)
def docs_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup (the production shape: dedup each NEW
    batch against the ALREADY-LOADED corpus, then within itself,
    without ever re-deduplicating history): the batch is a declared
    construction over the documents table (even doc_ids re-arrive
    verbatim = cross-batch duplicates; odd doc_ids arrive with
    appended content = genuinely new), replayed verbatim in the
    oracle. Per source: batch size, dropped-vs-existing
    (anti-join on the 16-byte fingerprint), dropped-within-batch
    (first-wins on doc_id), and loaded count.

    Scale: this is the pattern that keeps dedup cost INCREMENTAL at
    100 TB — the existing corpus contributes only its fingerprint
    column (16-byte shuffle key, or a pre-built fingerprint index
    table), never its text; the batch-side work is proportional to
    the batch, not history. left_anti + first-wins are both one
    shuffle on the fingerprint.
    """
    docs = load_table(spark, sf_dir, "documents")
    # the batch-id offset (corpus row count) stays IN the plan as a
    # broadcast 1-row aggregate — no fixture-side count() job before
    # the query (this was the catalog's only pre-query side job)
    cnt = docs.agg(F.count(F.lit(1)).alias("_n"))
    # both fingerprint tables feed multiple joins below (ex: semi +
    # anti; batch: size agg + semi + anti/window) — shared() so each
    # md5-fingerprint pass over the text runs once, not 2-3 times (r11)
    ex = shared(docs.select(X.fingerprint(F.col("text")).alias("fp")))
    batch = shared(
        docs.crossJoin(F.broadcast(cnt)).select(
            (F.col("doc_id") + F.col("_n")).alias("doc_id"),
            "source",
            X.fingerprint(
                F.when(F.col("doc_id") % 2 == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" v2"))
                )
            ).alias("fp"),
        )
    )
    n_batch = batch.groupBy("source").agg(F.count(F.lit(1)).alias("n_batch"))
    survivors = batch.join(ex, "fp", "left_anti")
    n_dropped_ex = batch.join(ex, "fp", "left_semi").groupBy("source").agg(
        F.count(F.lit(1)).alias("n_dropped_vs_existing")
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy("fp").orderBy("doc_id"))
    ranked = survivors.withColumn("_rn", rn)
    n_within = ranked.filter(F.col("_rn") > 1).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_dropped_within_batch")
    )
    n_loaded = ranked.filter(F.col("_rn") == 1).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_loaded")
    )
    return (
        n_batch.join(n_dropped_ex, "source", "left")
        .join(n_within, "source", "left")
        .join(n_loaded, "source", "left")
        .select(
            "source",
            "n_batch",
            F.coalesce(F.col("n_dropped_vs_existing"), F.lit(0)).alias(
                "n_dropped_vs_existing"
            ),
            F.coalesce(F.col("n_dropped_within_batch"), F.lit(0)).alias(
                "n_dropped_within_batch"
            ),
            F.coalesce(F.col("n_loaded"), F.lit(0)).alias("n_loaded"),
        )
    )


@query(
    "docs_bigram_nll",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    big AS (
      SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
      FROM t, LATERAL unnest(generate_series(1, len(toks) - 1)) AS u(i)
    ),
    v AS (
      SELECT COUNT(DISTINCT tk) AS vsz
      FROM (SELECT unnest(toks) AS tk FROM t)
    ),
    cb AS (SELECT w1, w2, COUNT(*) AS nb FROM big GROUP BY 1, 2),
    ctx AS (SELECT w1, COUNT(*) AS nc FROM big GROUP BY 1),
    nll AS (
      SELECT cb.w1, cb.w2,
             CAST(ROUND(LN(CAST(ctx.nc + v.vsz AS DOUBLE) / (cb.nb + 1)), 6)
                  AS DECIMAL(18,6)) AS q
      FROM cb JOIN ctx USING (w1), v
    )
    SELECT big.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(nll.q) AS DOUBLE) / COUNT(*) AS avg_nll
    FROM big JOIN nll ON big.w1 = nll.w1 AND big.w2 = nll.w2
    GROUP BY big.doc_id
    """,
)
def docs_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score (the step past ``docs_unigram_nll``
    toward the KenLM-style perplexity filter): per document, the mean
    negative log-likelihood of its token bigrams under corpus
    conditional probabilities P(w2|w1) = (C(w1,w2)+1) / (Cctx(w1)+V)
    (add-one smoothing, context counts from the bigram stream, V =
    corpus unigram vocabulary). Documents with fewer than two tokens
    have no bigrams and are omitted — in both engines the empty
    position range produces no rows, no special-casing.

    Cross-engine determinism: per-bigram NLL is ONE double division of
    exact integer counts + one ln, quantized to DECIMAL(18,6) before
    the order-free per-doc sum (the unigram_nll pattern); final mean
    is one double division.

    Scale: bigram stats are map-side-combinable counts; the stats
    table is vocabulary-sized (broadcastable for natural language —
    same argument as the unigram vocab, one power of Zipf up); the
    per-doc agg is one shuffle on doc_id.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", X.tokens(F.col("text")).alias("tk"))
    pairs = toks.filter(F.size("tk") >= 2).select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("tk"), 1, F.size("tk") - 1).alias("w1"),
                F.slice(F.col("tk"), 2, F.size("tk") - 1).alias("w2"),
            )
        ).alias("z"),
    )
    # the bigram stream feeds the bigram counts, the context counts,
    # AND the final per-doc join — shared() so the tokenize+explode
    # pass runs once instead of three times (r11; entry-local cache,
    # released when the next entry builds)
    big = shared(
        pairs.select(
            "doc_id", F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2")
        )
    )
    v = toks.select(F.explode("tk").alias("_t")).agg(
        F.count_distinct("_t").alias("vsz")
    )
    cb = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("nb"))
    ctx = big.groupBy("w1").agg(F.count(F.lit(1)).alias("nc"))
    nll = (
        cb.join(ctx, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("nc") + F.col("vsz")).cast("double")
                    / (F.col("nb") + 1)
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("q"),
        )
    )
    return (
        big.join(nll, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum("q").cast("double") / F.count(F.lit(1))).alias("avg_nll"),
        )
    )


@query(
    "docs_quality_funnel",
    oracle=f"""
    WITH s AS (
      SELECT len(toks) AS n_toks,
             CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
               / len(toks) AS mean_len,
             len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is','it')))
               AS n_stop,
             len(list_distinct(toks)) AS n_uniq
      FROM (SELECT text, {TOKS_SQL} AS toks FROM documents)
    ),
    r AS (
      SELECT COALESCE(n_toks >= 50 AND n_toks <= 100000, FALSE) AS r1,
             COALESCE(mean_len >= 3.0 AND mean_len <= 10.0, FALSE) AS r2,
             COALESCE(n_stop >= 2, FALSE) AS r3,
             COALESCE(CAST(n_uniq AS DOUBLE) / n_toks > 0.2, FALSE) AS r4
      FROM s
    ),
    agg AS (
      SELECT COUNT(*) AS n0,
             CAST(SUM(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
             CAST(SUM(CASE WHEN r1 AND r2 THEN 1 ELSE 0 END) AS BIGINT) AS k2,
             CAST(SUM(CASE WHEN r1 AND r2 AND r3 THEN 1 ELSE 0 END) AS BIGINT) AS k3,
             CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 THEN 1 ELSE 0 END) AS BIGINT) AS k4
      FROM r
    )
    SELECT * FROM (
      SELECT 1 AS stage_idx, 'word_count' AS stage, n0 AS n_in, k1 AS n_kept,
             CAST(n0 - k1 AS DOUBLE) / NULLIF(n0, 0) AS drop_frac FROM agg
      UNION ALL
      SELECT 2, 'word_len', k1, k2, CAST(k1 - k2 AS DOUBLE) / NULLIF(k1, 0) FROM agg
      UNION ALL
      SELECT 3, 'stopwords', k2, k3, CAST(k2 - k3 AS DOUBLE) / NULLIF(k2, 0) FROM agg
      UNION ALL
      SELECT 4, 'diversity', k3, k4, CAST(k3 - k4 AS DOUBLE) / NULLIF(k3, 0) FROM agg
    )
    """,
)
def docs_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-cascade audit: the Gopher rules applied IN SEQUENCE
    (word-count → word-length → stopwords → diversity), reporting
    per-stage input count, survivor count, and drop fraction — the
    observability table a 100 TB curation run publishes so data
    engineers can see WHICH rule is eating the corpus (the funnel
    complement of docs_gopher_rules' independent per-rule failures).

    Scale: one corpus scan; all four predicates and the four nested
    conditional sums run in a single map-side-combinable aggregate
    producing ONE row, then a 4-row unpivot (stack) on the driver-side
    result — no second scan per stage, which is the naive
    implementation's trap (k scans for k stages).
    """
    docs = load_table(spark, sf_dir, "documents")
    flags = X.with_gopher_flags(docs)
    s1 = F.col("r_word_count")
    s2 = s1 & F.col("r_word_len")
    s3 = s2 & F.col("r_stopwords")
    s4 = s3 & F.col("r_diversity")
    cnt = lambda c: F.sum(c.cast("long"))  # noqa: E731
    agg = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        cnt(s1).alias("k1"),
        cnt(s2).alias("k2"),
        cnt(s3).alias("k3"),
        cnt(s4).alias("k4"),
    )
    return agg.select(
        F.expr(
            "stack(4, "
            "1, 'word_count', n0, k1, "
            "2, 'word_len',   k1, k2, "
            "3, 'stopwords',  k2, k3, "
            "4, 'diversity',  k3, k4) AS (stage_idx, stage, n_in, n_kept)"
        )
    ).select(
        "stage_idx",
        "stage",
        "n_in",
        "n_kept",
        # nullif: an upstream stage that kills the whole corpus makes
        # the next stage's denominator 0 — Spark would emit NaN where
        # DuckDB emits NULL, so both engines null it explicitly
        (
            (F.col("n_in") - F.col("n_kept")).cast("double")
            / F.nullif(F.col("n_in"), F.lit(0))
        ).alias("drop_frac"),
    )


@query("docs_prefix_jaccard", oracle=JACCARD_SQL)
def docs_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard ≥ 0.8 pairs via PREFIX FILTERING (SSJoin/PPJoin,
    ``dedup.prefix_jaccard_pairs``) — the third candidate strategy
    next to the df-capped all-pairs join and MinHash-LSH. The oracle
    is the UNCAPPED exact all-pairs SQL: prefix filtering is LOSSLESS
    (two sets with J ≥ t must share a prefix shingle), so the output
    must equal the exact answer bit-for-bit — no recall bound, no
    df-cap proviso.

    Scale: only each document's rarest ~20% of shingles (by global
    document frequency) enter the join, which bounds fan-out exactly
    where the naive join explodes; the verify stage is
    candidate-bounded (the MinHash-verify shape).
    """
    docs = load_table(spark, sf_dir, "documents")
    return D.prefix_jaccard_pairs(docs, threshold=0.8)


@query(
    "docs_span_removal",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    ti AS (
      SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 31)) AS i
      FROM t WHERE len(toks) >= 32
    ),
    w AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(toks[i:i+31], ' ')) AS wfp
      FROM ti
    ),
    freq AS (
      SELECT wfp FROM (SELECT DISTINCT doc_id, wfp FROM w)
      GROUP BY wfp HAVING COUNT(*) >= 2
    ),
    covered AS (
      SELECT DISTINCT w.doc_id, w.pos + j.j AS tokidx
      FROM w JOIN freq USING (wfp),
           (SELECT unnest(generate_series(0, 31)) AS j) j
    ),
    tokrows AS (
      SELECT doc_id, i - 1 AS tokidx, toks[i] AS tok
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks))) AS i FROM t)
    ),
    kept AS (
      SELECT k.doc_id, k.tokidx, k.tok
      FROM tokrows k LEFT JOIN covered c
        ON c.doc_id = k.doc_id AND c.tokidx = k.tokidx
      WHERE c.doc_id IS NULL
    ),
    rebuilt AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY tokidx) AS clean_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    ),
    totals AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens FROM t)
    SELECT totals.doc_id, COALESCE(r.clean_text, '') AS clean_text,
           totals.n_tokens,
           CAST(totals.n_tokens - COALESCE(r.n_kept, 0) AS BIGINT)
             AS n_tokens_removed
    FROM totals LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def docs_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring REMOVAL (Lee et al. 2022,
    ``dedup.remove_duplicated_spans``): every token covered by a
    32-token window appearing in ≥2 distinct documents is edited OUT,
    returning the cleaned text with token accounting — the editing
    counterpart of the ``docs_substring_dedup`` scoring signal. The
    oracle replays the whole pipeline (positional windows, distinct
    per-doc fingerprints, covered-index explode, position-ordered
    rebuild) on md5 fingerprints, so the rebuilt text hash-checks
    byte-for-byte.

    Scale: windows shuffle as 16-byte fingerprints; the covered-index
    explode is bounded by duplication volume; the rebuild groups on
    the doc key (text touched exactly twice).
    """
    docs = load_table(spark, sf_dir, "documents")
    return D.remove_duplicated_spans(docs, width=32, min_df=2)


def _leakage_split_oracle(train: float = 0.9, val: float = 0.05) -> str:
    """Generated from the SAME cut derivation as split_assign — and
    the SAME capped-Jaccard pair SQL + recursive-CTE closure as
    docs_dedup_keep_best — so neither the draw nor the clustering can
    drift between engines."""
    t_cut, v_cut = TR.split_cuts(train, val)
    return "WITH RECURSIVE " + JACCARD_PAIR_CTES + f""",
    edges AS (SELECT da AS u, db AS v FROM pairs
              UNION SELECT db, da FROM pairs),
    reach(u, lbl) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.u = e.v
    ),
    cc AS (SELECT u, MIN(lbl) AS cluster_id FROM reach GROUP BY u),
    g AS (
      SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS split_group
      FROM documents d LEFT JOIN cc ON cc.u = d.doc_id
    ),
    s AS (
      SELECT split_group,
             CASE WHEN substr(md5(CAST(split_group AS VARCHAR)), 1, 2)
                       < '{t_cut}' THEN 'train'
                  WHEN substr(md5(CAST(split_group AS VARCHAR)), 1, 2)
                       < '{v_cut}' THEN 'val'
                  ELSE 'test' END AS split
      FROM g
    )
    SELECT split, COUNT(*) AS n_docs,
           COUNT(DISTINCT split_group) AS n_groups
    FROM s GROUP BY 1
    """


@query("docs_leakage_safe_split", oracle=_leakage_split_oracle())
def docs_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split with NEAR-DUP LEAKAGE PREVENTION
    (``training.leakage_safe_split``): the content-addressed draw
    runs on the duplicate-CLUSTER id (min member via connected
    components over the capped-Jaccard pair graph), so every member
    of a cluster lands in the same split — the eval-contamination
    guard a per-document split throws away. Reports per split the
    document count and the distinct draw-group count (n_groups <
    n_docs exactly where clusters were kept atomic).

    Scale: CC runs on the pair graph (pair-volume, not corpus); the
    corpus joins the cluster labels once; the draw is the codegen'd
    md5 bucket shared with docs_train_split.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_cached(spark, sf_dir, docs).select(
        "doc_a", "doc_b"
    )
    out = TR.leakage_safe_split(docs, pairs)
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("split_group").alias("n_groups"),
    )


@query(
    "docs_weighted_sample",
    oracle="""
    WITH w AS (
      SELECT source, doc_id,
             ln(CAST(list_sum([(strpos('0123456789abcdef',
                      substr(md5(CAST(doc_id AS VARCHAR) || ':wsample'), i, 1))
                      - 1)::BIGINT * (1::BIGINT << (4 * (13 - i)))
                 FOR i IN generate_series(1, 13)]) AS DOUBLE)
              / 4503599627370496e0 + 1.1102230246251565e-16)
             / CAST(n_chars AS DOUBLE) AS key
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT source, doc_id, sample_rank FROM (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY key DESC, doc_id) AS sample_rank
      FROM w
    ) WHERE sample_rank <= 5
    """,
)
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis, ``training.weighted_sample``): 5 documents
    per source, selection probability proportional to ``n_chars``,
    via the content-addressed exponential-sort key log(u)/w with
    u = md5(doc_id:salt) mapped onto double's full 52-bit mantissa.
    The oracle replays the hex→uniform fold digit-by-digit (the
    SimHash strpos pattern), so membership AND rank hash-match —
    the sample is a pure function of content, not of engine RNG.

    Determinism note: u and the /2^52 + 2^-53 map are exact IEEE in
    both engines; ln() may differ in the last ulp, which cannot
    reorder keys whose gaps are ~1e-2 — and no float column is
    emitted. Scale: per-task k-row heaps (WindowGroupLimit) before
    the one stratum shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    return TR.weighted_sample(
        docs, weight_col="n_chars", k=5, strata_col="source"
    ).select("source", "doc_id", "sample_rank")


@query(
    "docs_temperature_mixture",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n_rows FROM documents GROUP BY 1),
    p AS (
      SELECT source, n_rows,
             CAST(ROUND(POW(CAST(n_rows AS DOUBLE), 3e-1), 6)
                  AS DECIMAL(28,6)) AS pq
      FROM c
    ),
    t AS (SELECT CAST(SUM(pq) AS DOUBLE) AS tp, SUM(n_rows) AS tn FROM p)
    SELECT source, n_rows,
           n_rows / tn AS natural_share,
           CAST(pq AS DOUBLE) / tp AS sample_prob,
           CAST(pq AS DOUBLE) / tp / n_rows AS row_weight
    FROM p, t
    """,
)
def docs_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture weights (p_i ∝ n_i^0.3, the
    multilingual-sampling formula; ``training.temperature_weights``
    on its quantized path): per source its corpus share, the
    temperature-flattened sampling probability, and the per-row
    weight that feeds ``weighted_sample`` to materialize the mixture.
    quantize=6 rounds each n^α term and sums them in DECIMAL, so the
    one order-free double sum in the formula (Σ n_i^α) is exact and
    every downstream division is a single double op on bit-identical
    operands; POW's last ulp surviving the round is the accepted
    LN-precedent gamble.

    Scale: one map-side-combinable count per group; |groups| rows
    everywhere after that.
    """
    docs = load_table(spark, sf_dir, "documents")
    return TR.temperature_weights(docs, group_col="source", alpha=0.3, quantize=6)


@query(
    "docs_triangle_stats",
    oracle="WITH " + JACCARD_PAIR_CTES + """,
    und AS (
      SELECT DISTINCT least(da, db) AS u, greatest(da, db) AS v
      FROM pairs WHERE da <> db
    ),
    deg AS (
      SELECT n, COUNT(*) AS d
      FROM (SELECT u AS n FROM und UNION ALL SELECT v FROM und)
      GROUP BY 1
    ),
    o AS (
      SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                  THEN u ELSE v END AS a,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                  THEN v ELSE u END AS b
      FROM und JOIN deg du ON du.n = und.u JOIN deg dv ON dv.n = und.v
    ),
    wed AS (
      SELECT o1.a, o1.b AS w1, o2.b AS w2
      FROM o o1 JOIN o o2 USING (a) WHERE o1.b < o2.b
    ),
    clos AS (SELECT DISTINCT least(a, b) AS w1, greatest(a, b) AS w2 FROM o),
    tri AS (
      SELECT COUNT(*) AS n_tri
      FROM wed WHERE EXISTS (
        SELECT 1 FROM clos WHERE clos.w1 = wed.w1 AND clos.w2 = wed.w2
      )
    )
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM und) AS n_edges,
           (SELECT CAST(COALESCE(SUM(d * (d - 1)), 0) / 2 AS BIGINT)
              FROM deg) AS n_wedges,
           (SELECT CAST(n_tri AS BIGINT) FROM tri) AS n_triangles,
           (SELECT CASE WHEN COALESCE(SUM(d * (d - 1)), 0) > 0
                        THEN 3e0 * (SELECT n_tri FROM tri)
                             / CAST(COALESCE(SUM(d * (d - 1)), 0) / 2
                                    AS BIGINT) END
              FROM deg) AS clustering_coeff
    """,
)
def docs_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the near-dup
    pair graph (``clustering.triangle_stats``, degree-oriented wedge
    counting per Suri & Vassilvitskii 2011): the density diagnostic
    that says whether duplicates come in CLUSTERS (high coefficient —
    transitive closure will collapse far more than the pair count
    suggests) or scattered pairs. The oracle replays the capped
    Jaccard pairs and the exact orientation/wedge/closing pipeline.

    Scale: wedge generation is bounded by oriented out-degree
    (≤ O(sqrt(E)) on power-law hubs); three shuffles total.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_cached(spark, sf_dir, docs).select(
        "doc_a", "doc_b"
    )
    return C.triangle_stats(pairs, src_col="doc_a", dst_col="doc_b")


@query(
    "docs_pagerank",
    oracle="WITH RECURSIVE " + JACCARD_PAIR_CTES + """,
    edges AS (SELECT da AS src, db AS dst FROM pairs
              UNION ALL SELECT db, da FROM pairs),
    nodes AS (SELECT DISTINCT n
              FROM (SELECT src AS n FROM edges UNION ALL SELECT dst FROM edges)),
    nn AS (SELECT COUNT(*) AS c FROM nodes),
    outdeg AS (SELECT src AS n, COUNT(*) AS d FROM edges GROUP BY 1),
    pr(it, node, rank) AS (
      SELECT 0, n, 1e0 / nn.c FROM nodes, nn
      UNION ALL
      SELECT p.it + 1, nd.n,
             (1e0 - 8.5e-1) / nn.c + 8.5e-1 * (
               COALESCE((SELECT CAST(SUM(CAST(ROUND(p2.rank / o.d, 12)
                                              AS DECIMAL(28,12))) AS DOUBLE)
                         FROM pr p2
                         JOIN edges e ON e.dst = nd.n AND e.src = p2.node
                         JOIN outdeg o ON o.n = p2.node), 0e0)
               + COALESCE((SELECT CAST(SUM(CAST(ROUND(p3.rank, 12)
                                               AS DECIMAL(28,12))) AS DOUBLE)
                           FROM pr p3
                           WHERE p3.node NOT IN (SELECT n FROM outdeg)),
                          0e0) / nn.c
             )
      FROM (SELECT DISTINCT it FROM pr) p, nodes nd, nn
      WHERE p.it < 6
    )
    SELECT node, rank FROM pr WHERE it = 6
    """,
)
def docs_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup pair graph (symmetric edges,
    6 rounds, damping 0.85; ``clustering.pagerank`` on its quantized
    path) — the authority signal for canonical-document choice that
    complements connected components' plain grouping. quantize=12
    rounds every per-edge contribution and dangling term before an
    exact DECIMAL sum, so each iteration's ranks — and therefore the
    final doubles — are bit-identical between the checkpointed Spark
    power iteration and the oracle's recursive CTE.

    Scale: per round one edges⋈ranks shuffle + a map-side-combinable
    dst sum; the dangling aggregate is one scalar per round (zero on
    this symmetric graph, computed anyway for parity);
    localCheckpoint pins the iterative plan.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_cached(spark, sf_dir, docs).select(
        "doc_a", "doc_b"
    )
    edges = pairs.union(pairs.select(F.col("doc_b"), F.col("doc_a")))
    return C.pagerank(
        edges, n_iter=6, damping=0.85,
        src_col="doc_a", dst_col="doc_b", quantize=12,
    )


@query(
    "docs_vocab_overlap",
    oracle=f"""
    WITH tok AS (
      SELECT source AS g, unnest({TOKS_SQL}) AS tk FROM documents
    ),
    d AS (SELECT DISTINCT g, tk FROM tok),
    sz AS (SELECT g, COUNT(*) AS n FROM d GROUP BY 1),
    inter AS (
      SELECT x.g AS ga, y.g AS gb, COUNT(*) AS ni
      FROM d x JOIN d y ON x.tk = y.tk AND x.g < y.g
      GROUP BY 1, 2
    )
    SELECT sa.g AS group_a, sb.g AS group_b,
           sa.n AS exact_a, sb.n AS exact_b,
           sa.n + sb.n - COALESCE(i.ni, 0) AS exact_union,
           COALESCE(i.ni, 0) AS exact_intersection,
           TRUE AS union_in_tol, TRUE AS inter_in_tol
    FROM sz sa JOIN sz sb ON sa.g < sb.g
    LEFT JOIN inter i ON i.ga = sa.g AND i.gb = sb.g
    """,
)
def docs_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between sources via HLL sketch
    algebra (``text.vocab_overlap_sketch``), gated structurally like
    ``events_hll_rollup``: the sketch-estimated union and
    inclusion–exclusion intersection must sit within tolerance of
    the exact distinct-token join (union ±5%, intersection ±15% of
    the union — 3x the per-estimate sigma, since the intersection is
    a difference of three estimates), or the hash differs. Exact
    values ride along for the corpus-composition readout.

    Scale: the sketch path shuffles |groups| KB sketches instead of
    token data; the exact branch exists only to gate the estimate
    (at 100 TB you'd sample it or drop it — the sketch is the
    product).
    """
    docs = load_table(spark, sf_dir, "documents")
    sk = X.vocab_overlap_sketch(docs, group_col="source", lg_k=12).select(
        "group_a", "group_b", "est_a", "est_b", "est_union",
        "est_intersection",
    )
    # the distinct (group, token) table feeds the per-group sizes AND
    # both sides of the intersection self-join — shared() so the
    # tokenize+distinct pass runs once, not three times (r11)
    d = spill_checkpoint(
        docs.select(
            F.col("source").alias("g"),
            F.explode(F.array_distinct(X.tokens(F.col("text")))).alias("tk"),
        ).distinct()
    )
    sz = d.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        d.alias("x")
        .join(
            d.alias("y"),
            (F.col("x.tk") == F.col("y.tk")) & (F.col("x.g") < F.col("y.g")),
        )
        .groupBy(
            F.col("x.g").alias("ga"), F.col("y.g").alias("gb")
        )
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    sa = sz.select(F.col("g").alias("group_a"), F.col("n").alias("exact_a"))
    sb = sz.select(F.col("g").alias("group_b"), F.col("n").alias("exact_b"))
    exact = (
        sa.join(sb, F.col("group_a") < F.col("group_b"))
        .join(
            inter,
            (F.col("ga") == F.col("group_a")) & (F.col("gb") == F.col("group_b")),
            "left",
        )
        .select(
            "group_a", "group_b", "exact_a", "exact_b",
            (
                F.col("exact_a") + F.col("exact_b")
                - F.coalesce("ni", F.lit(0))
            ).alias("exact_union"),
            F.coalesce("ni", F.lit(0)).alias("exact_intersection"),
        )
    )
    j = exact.join(sk, ["group_a", "group_b"])
    return j.select(
        "group_a", "group_b", "exact_a", "exact_b",
        "exact_union", "exact_intersection",
        (
            F.abs(F.col("est_union") - F.col("exact_union"))
            <= 0.05 * F.col("exact_union")
        ).alias("union_in_tol"),
        (
            F.abs(F.col("est_intersection") - F.col("exact_intersection"))
            <= 0.15 * F.col("exact_union")
        ).alias("inter_in_tol"),
    )


@query(
    "docs_bpe_merges",
    oracle=r"""
    WITH RECURSIVE vocab AS (
      SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
      ) WHERE length(w) > 0 GROUP BY w
    ),
    bpe(it, syms, freq, ml, mr, mf) AS (
      SELECT 0, [substr(w, i, 1) FOR i IN generate_series(1, length(w))],
             freq, NULL::VARCHAR, NULL::VARCHAR, NULL::BIGINT
      FROM vocab
      UNION ALL
      SELECT s.it + 1,
             flatten([
               CASE
                 WHEN list_contains(st.starts, i) THEN [w.l || w.r]
                 WHEN list_contains(st.starts, i - 1) THEN []
                 ELSE [s.syms[i]]
               END
               FOR i IN generate_series(1, len(s.syms))]),
             s.freq, w.l, w.r, w.f
      FROM bpe s
      JOIN (
        SELECT l, r, f FROM (
          SELECT u.pr.l AS l, u.pr.r AS r, SUM(s2.freq) AS f
          FROM bpe s2,
               unnest([{'l': s2.syms[i], 'r': s2.syms[i+1]}
                       FOR i IN generate_series(1, len(s2.syms) - 1)]) AS u(pr)
          GROUP BY 1, 2
        ) WHERE f >= 2
        ORDER BY f DESC, l, r LIMIT 1
      ) w ON true
      CROSS JOIN LATERAL (
        SELECT [i FOR i IN generate_series(1, len(s.syms) - 1)
                IF s.syms[i] = w.l AND s.syms[i+1] = w.r
                   AND (w.l <> w.r OR
                        (i - (1 + coalesce(list_max(
                           [j FOR j IN generate_series(1, i - 1)
                            IF s.syms[j] <> w.l]), 0))) % 2 = 0)] AS starts
      ) st
      WHERE s.it < 16
    )
    SELECT it AS merge_rank, ml AS lhs, mr AS rhs, mf AS pair_freq
    FROM (SELECT DISTINCT it, ml, mr, mf FROM bpe WHERE it >= 1)
    """,
)
def docs_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge training (Sennrich et al. 2016; ``text.bpe_train``,
    16 merges, min pair freq 2): the learned merge table itself,
    hash-checked rule-for-rule against a DuckDB recursive CTE that
    replays the whole induction — per-round weighted pair counts over
    the distinct-word vocab, the (freq DESC, pair ASC) winner, and
    the greedy left-to-right NON-OVERLAPPING rewrite. Overlap only
    chains when lhs == rhs (runs of one symbol), which the oracle
    resolves with the run-parity rule; for lhs ≠ rhs matches are
    provably disjoint and rewrite independently. Everything is exact
    integer/string arithmetic — no float gamble anywhere.

    Scale: the corpus collapses ONCE to the vocab table (the only
    corpus-sized shuffle — ~1e8 rows at 100 TB, executor-sized);
    each round is a vocab-table scan plus a 1-row driver fetch.
    """
    docs = load_table(spark, sf_dir, "documents")
    merges = _bpe_merges_cached(sf_dir, docs)
    return spark.createDataFrame(
        [(i, l, r, f) for i, (l, r, f) in enumerate(merges, 1)],
        "merge_rank long, lhs string, rhs string, pair_freq long",
    )


_BPE_CACHE: dict[tuple, list] = {}


def _bpe_merges_cached(sf_dir: str, docs: DataFrame) -> list:
    """bpe_train memoized by (path, mtime, size, params) — the
    _NVEC_CACHE pattern: docs_bpe_merges and docs_bpe_encode share
    one training run per corpus file, and a regenerated parquet can
    never serve stale merges."""
    import os

    path = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size, 16, 2)
    except OSError:
        key = None
    if key is not None and key in _BPE_CACHE:
        return _BPE_CACHE[key]
    merges = X.bpe_train(docs, n_merges=16, min_freq=2)
    if key is not None:
        _BPE_CACHE[key] = merges
    return merges


@query(
    "docs_bpe_encode",
    oracle=r"""
    WITH RECURSIVE vocab AS (
      SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents
      ) WHERE length(w) > 0 GROUP BY w
    ),
    bpe(it, w, syms, freq) AS (
      SELECT 0, w, [substr(w, i, 1) FOR i IN generate_series(1, length(w))],
             freq
      FROM vocab
      UNION ALL
      SELECT s.it + 1, s.w,
             flatten([
               CASE
                 WHEN list_contains(st.starts, i) THEN [wn.l || wn.r]
                 WHEN list_contains(st.starts, i - 1) THEN []
                 ELSE [s.syms[i]]
               END
               FOR i IN generate_series(1, len(s.syms))]),
             s.freq
      FROM bpe s
      JOIN (
        SELECT l, r FROM (
          SELECT u.pr.l AS l, u.pr.r AS r, SUM(s2.freq) AS f
          FROM bpe s2,
               unnest([{'l': s2.syms[i], 'r': s2.syms[i+1]}
                       FOR i IN generate_series(1, len(s2.syms) - 1)]) AS u(pr)
          GROUP BY 1, 2
        ) WHERE f >= 2
        ORDER BY f DESC, l, r LIMIT 1
      ) wn ON true
      CROSS JOIN LATERAL (
        SELECT [i FOR i IN generate_series(1, len(s.syms) - 1)
                IF s.syms[i] = wn.l AND s.syms[i+1] = wn.r
                   AND (wn.l <> wn.r OR
                        (i - (1 + coalesce(list_max(
                           [j FOR j IN generate_series(1, i - 1)
                            IF s.syms[j] <> wn.l]), 0))) % 2 = 0)] AS starts
      ) st
      WHERE s.it < 16
    ),
    final AS (
      SELECT w, len(syms) AS n_sub FROM bpe
      WHERE it = (SELECT MAX(it) FROM bpe)
    ),
    docw AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      FROM documents
    )
    SELECT doc_id,
           CAST(SUM(f.n_sub) AS BIGINT) AS n_bpe_tokens,
           COUNT(*) AS n_words
    FROM docw d JOIN final f USING (w)
    WHERE length(d.w) > 0
    GROUP BY doc_id
    """,
)
def docs_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING of the corpus with the learned merges
    (``text.bpe_encode`` over ``bpe_train``'s 16 rules): per document
    the sub-token count under the induced tokenizer — the budget
    number a packing/chunking pipeline actually consumes. The oracle
    never runs the encoder: it reuses the TRAINING CTE's final
    per-word segmentation, so the hash check IS the classical
    train/encode equivalence invariant (rank-order replay of the
    merges reproduces every training word's final segmentation); a
    divergence in the priority-based encoder would hash-mismatch.

    Scale: merges broadcast as a rank dict (KB at any corpus size);
    encoding is an embarrassingly parallel Arrow-batched scan, no
    shuffle before the per-doc count.

    Row set: documents with AT LEAST ONE word. The oracle's
    word-level join drops wordless (empty/whitespace/NULL text) docs
    structurally, so the entry filters to the same universe instead
    of emitting (0, 0) rows the oracle can never produce — pinned by
    ``test_bpe_encode_drops_wordless_docs_like_oracle``.
    """
    docs = load_table(spark, sf_dir, "documents")
    merges = _bpe_merges_cached(sf_dir, docs)
    enc = X.bpe_encode(docs, merges)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    words = F.size(F.filter(toks, lambda w: F.length(w) > 0))
    return (
        enc.select(
            "doc_id",
            F.size("bpe_tokens").cast("long").alias("n_bpe_tokens"),
            words.cast("long").alias("n_words"),
        )
        .filter(F.col("n_words") > 0)
    )


@query(
    "docs_novelty",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
    g AS (
      SELECT doc_id, md5(array_to_string(toks[i:i+7], ' ')) AS fp
      FROM t, LATERAL unnest(generate_series(1, greatest(len(toks)-7, 1)))
               AS u(i)
    ),
    d AS (SELECT DISTINCT doc_id, fp FROM g),
    f AS (SELECT fp, MIN(doc_id) AS first_doc FROM d GROUP BY fp)
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS novelty_frac
    FROM d JOIN f USING (fp)
    GROUP BY d.doc_id
    """,
)
def docs_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence novelty scoring: per document, the fraction of
    its DISTINCT 8-token shingles whose FIRST owner (min doc_id over
    the corpus) is the document itself — the directional curation
    signal ``docs_substring_dedup``'s symmetric dup_fraction cannot
    express (a duplicated shingle is novel in exactly ONE document:
    the earliest; later copies score 0 for it). The batch twin of the
    incremental "how much new content does this crawl add" question.

    Determinism: min over doc_id (unique key) and exact integer
    counts; the one division is double/double on identical operands.

    Scale: same shape as the substring scan — shingles shuffle as
    16-byte md5 keys (payloads projected away), the first-owner
    aggregate is map-side combinable, and the join back is on the
    same fp key (one exchange reused). Linear in corpus size, no pair
    expansion.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(X.shingle_array(F.col("text"), 8))
        ).alias("_s"),
    ).select("doc_id", F.md5("_s").alias("fp"))
    first = sh.groupBy("fp").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        sh.join(first, "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            novel.cast("long").alias("n_novel"),
            (novel.cast("double") / F.count(F.lit(1))).alias("novelty_frac"),
        )
    )


@query(
    "docs_source_caps",
    oracle="""
    WITH d AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC NULLS LAST,
                                         doc_id) AS rn
      FROM documents WHERE source IS NOT NULL
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN rn <= 50 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN rn > 50 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN rn <= 50 THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars
    FROM d GROUP BY source
    """,
)
def docs_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document caps (domain balancing — the RefinedWeb /
    CCNet-style guard against a single domain dominating the training
    mixture): keep the top 50 docs per source by (n_chars DESC,
    doc_id) and report per-source kept/dropped volume, so the
    assembly stage can enforce the cap with a semi-join.

    Scale: ONE window sort per source partition (row_number, rank
    cutoff) — key-parallel, no global sort. At 100 TB the hot-domain
    skew hazard is the row_number sort on a mega-source; the
    documented swap is a two-phase cap (per-source approx_percentile
    length threshold broadcast back, then filter + exact window only
    on the ~cap-sized survivors), same as the banded-quantile
    pattern. Tie-safety: the (n_chars, doc_id) order is TOTAL, so
    both engines cut the same 50.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
    )
    w = W.partitionBy("source").orderBy(
        F.col("n_chars").desc_nulls_last(), "doc_id"
    )
    r = d.select("source", "doc_id", "n_chars").withColumn(
        "_rn", F.row_number().over(w)
    )
    kept = F.when(F.col("_rn") <= 50, 1).otherwise(0)
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept).cast("long").alias("n_kept"),
        F.sum(1 - kept).cast("long").alias("n_dropped"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.col("n_chars") * kept).cast("long").alias("kept_chars"),
    )


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled peeling replay: peeling is monotone, so a fixed round
    count with rounds past the fixpoint as no-ops reproduces the
    operator's early-exit fixpoint exactly (the engine RAISES if the
    fixpoint needs more rounds than this unroll, so the two can never
    silently disagree)."""
    # AS MATERIALIZED is load-bearing: every round references the
    # previous one THREE times (FROM + two IN subqueries), and DuckDB
    # inlines plain CTEs - 12 unrolled rounds would expand 3^12 copies
    # of the pair derivation (measured as a too-many-open-files error
    # on the documents scan before anything ran)
    ctes = [
        "e0 AS MATERIALIZED (SELECT da AS u, db AS v FROM pairs "
        "UNION SELECT db, da FROM pairs)"
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"n{r} AS MATERIALIZED (SELECT u FROM e{r-1} GROUP BY u "
            f"HAVING COUNT(*) >= {k})"
        )
        ctes.append(
            f"e{r} AS MATERIALIZED (SELECT u, v FROM e{r-1} "
            f"WHERE u IN (SELECT u FROM n{r}) "
            f"AND v IN (SELECT u FROM n{r}))"
        )
    return (
        ",\n    ".join(ctes)
        + f"""
    SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM e{rounds} GROUP BY u
    """
    )


@query(
    "docs_kcore_2",
    oracle="WITH " + JACCARD_PAIR_CTES + ",\n    " + _kcore_oracle(2, 12),
)
def docs_kcore_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the near-dup pair graph (iterative peeling): drops
    every pendant A≈B pair and chain, keeping only nodes embedded in
    denser duplicate structure (cliques of 3+, overlapping template
    families) — the density filter that separates systemic
    boilerplate from incidental near-dups, run after MinHash/Jaccard
    pairing and before cluster-level dedup decisions.

    The peeling fixpoint is unique (monotone shrinking), replayed by
    the oracle as 12 unrolled rounds — rounds past the fixpoint are
    no-ops, and the engine RAISES past 12 rounds instead of returning
    a non-core superset.

    Scale: per round one map-combinable degree aggregate + two
    node-keyed semi-joins over the PAIR graph (never documents);
    round count = peel depth, bounded by graph degeneracy.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_cached(spark, sf_dir, docs).select(
        "doc_a", "doc_b"
    )
    return C.k_core(pairs, k=2, max_rounds=12)


_TAXONOMY_RULES: list[tuple[str, tuple[str, ...]]] = [
    ("joins", ("join", "merge", "hash", "key")),
    ("scan_io", ("scan", "filter", "column", "batch")),
    ("streaming", ("stream", "window")),
    ("sort_agg", ("sort", "order", "group", "agg")),
]


@query(
    "docs_taxonomy_classify",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, source, n_chars,
        len(list_filter(string_split(text, ' '),
            x -> x IN ('join','merge','hash','key'))) AS c1,
        len(list_filter(string_split(text, ' '),
            x -> x IN ('scan','filter','column','batch'))) AS c2,
        len(list_filter(string_split(text, ' '),
            x -> x IN ('stream','window'))) AS c3,
        len(list_filter(string_split(text, ' '),
            x -> x IN ('sort','order','group','agg'))) AS c4
      FROM documents
    ),
    t AS (
      SELECT *, CASE
        WHEN c1 >= c2 AND c1 >= c3 AND c1 >= c4 THEN 'joins'
        WHEN c2 >= c3 AND c2 >= c4 THEN 'scan_io'
        WHEN c3 >= c4 THEN 'streaming'
        ELSE 'sort_agg' END AS topic
      FROM d
    ),
    g AS (
      SELECT topic, COUNT(*) AS n_docs,
             COUNT(DISTINCT lang) AS n_langs,
             COUNT(DISTINCT source) AS n_sources,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM t GROUP BY topic
    )
    SELECT topic, n_docs, n_langs, n_sources, total_chars,
           CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS doc_share
    FROM g
    """,
)
def docs_taxonomy_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-taxonomy topic routing + mixture profile (the
    domain-classification step a training-mix pipeline runs before
    setting per-domain weights — RefinedWeb/Dolma-style coarse
    routing, deterministic so the mixture is reproducible): every
    document scores one point per keyword hit per topic, routes to the
    argmax with declared rule priority on ties, and the profile
    reports per-topic doc counts, language/source spread, char mass,
    and corpus share.

    Determinism: integer token counts, CASE argmax with a total
    priority order, one exact-integer double division for the share.

    Scale: ONE corpus scan with all four scores as codegen'd
    higher-order expressions (no explode — the split array never
    shuffles); the aggregate is map-combinable on ~|topics| groups,
    and the share window runs over topic-count rows, not documents.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = X.taxonomy_classify(docs, _TAXONOMY_RULES)
    g = t.groupBy("topic").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    from pyspark.sql import Window as W

    return g.withColumn(
        "doc_share",
        F.col("n_docs").cast("double")
        / F.sum("n_docs").over(W.partitionBy()).cast("double"),
    )


@query(
    "docs_source_overlap",
    oracle="WITH "
    + JACCARD_PAIR_CTES
    + """
    SELECT least(sa.source, sb.source) AS source_a,
           greatest(sa.source, sb.source) AS source_b,
           sa.source = sb.source AS within_source,
           COUNT(*) AS n_pairs
    FROM pairs
    JOIN documents sa ON sa.doc_id = pairs.da
    JOIN documents sb ON sb.doc_id = pairs.db
    GROUP BY 1, 2, 3
    """,
)
def docs_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix (the curation question behind
    RefinedWeb-style source auditing: WHICH sources copy from each
    other?): every exact-Jaccard >= 0.8 near-dup pair is attributed
    to its unordered (source, source) cell, separating within-source
    boilerplate from cross-source contamination — the signal that
    decides whether to drop a source or just dedup it.

    Eighth consumer of the shared ``_jaccard_pairs_cached``
    checkpoint (zero marginal shingle-join cost); sources attach via
    two doc_id joins against a 2-column projection of the corpus.

    Scale: the joins run at PAIR volume on the doc_id key (the
    corpus side prunes to doc_id+source at the scan); output is
    |sources|^2 cells at most. The unordered normalization
    (least/greatest) keeps each cell a single group with no
    post-merge.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_cached(spark, sf_dir, docs).select(
        "doc_a", "doc_b"
    )
    src = docs.select("doc_id", "source")
    j = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("doc_a"),
                F.col("source").alias("_sa"),
            ),
            "doc_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"),
                F.col("source").alias("_sb"),
            ),
            "doc_b",
        )
    )
    return (
        j.groupBy(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
            (F.col("_sa") == F.col("_sb")).alias("within_source"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "docs_curriculum_order",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_uniq_tokens,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents)
    ),
    st AS (
      SELECT doc_id, n_tokens, h,
             CASE WHEN NOT (n_tokens >= 20 AND n_tokens <= 1000
                            AND CAST(n_uniq_tokens AS DOUBLE) / n_tokens > 0.2)
                  THEN 0
                  WHEN n_tokens < 100 THEN 1
                  WHEN n_tokens <= 400 THEN 2
                  ELSE 3 END AS stage
      FROM s
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY stage
                                   ORDER BY h, doc_id) AS rank
      FROM st
    )
    SELECT stage,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(CASE WHEN rank = 1 THEN doc_id END) AS first_doc_id,
           MAX_BY(doc_id, rank) AS last_doc_id,
           CAST(CAST(SUM(CAST(rank AS DECIMAL(19,0))
                         * CAST(h % 1000003 AS DECIMAL(7,0)))
                     AS DECIMAL(38,0)) AS VARCHAR) AS order_checksum
    FROM r GROUP BY 1
    """,
)
def docs_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordering manifest (training-data assembly): stage the
    corpus easy -> hard (declared length bands over quality-gated docs;
    'low'-quality docs land in stage 0, held out) and pin each stage's
    exact content-addressed training order with a permutation checksum.
    See ``TR.curriculum_manifest`` for the full determinism and
    100-TB ordering story (fixed bands instead of quantile stages; the
    two-level (stage, shard) order swap for hot stages).
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = X.with_quality_score(docs)
    return TR.curriculum_manifest(scored, key_col="doc_id")


def _pii_redact_oracle() -> str:
    """Generated from the SAME pattern pack as with_pii_redaction:
    the identical replace chain in the identical order, with the
    redacted text pinned by md5 so the entry is bit-exact, not just
    count-exact."""
    expr = "text"
    for name, pat in X.PII_PATTERNS.items():
        expr = f"regexp_replace({expr}, '{pat}', '<{name.upper()}>', 'g')"
    return f"""
    SELECT doc_id,
           length(text) AS orig_len,
           length({expr}) AS redacted_len,
           md5({expr}) AS redacted_md5
    FROM documents WHERE text IS NOT NULL
    """


@query("docs_pii_redact", oracle=_pii_redact_oracle())
def docs_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (the write side of ``docs_pii_scan``): every
    pattern hit replaced with its typed placeholder, in declared
    pattern-pack order, as chained codegen regexp_replace projections.
    The redacted text is pinned by md5 on both engines — bit-exact
    redaction, not just matching counts. NULL-text docs are out of
    domain on both sides. (The shipped corpora contain no PII hits,
    so at driver SF the entry pins exact pass-through; the REPLACE
    branch is pinned by the micro-fixture parity test with real
    emails/phones/IPs, ``test_pii_redact_replaces_and_matches_oracle``.)

    Scale: a pure projection — no shuffle at all before the driver's
    ordering; redacted text never needs to leave the scan stage in a
    real pipeline (the write is a partitioned sink map).
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    r = X.with_pii_redaction(docs)
    return r.select(
        "doc_id",
        F.length("text").cast("long").alias("orig_len"),
        F.length("redacted").cast("long").alias("redacted_len"),
        F.md5(F.col("redacted").cast("binary")).alias("redacted_md5"),
    )


@query(
    "docs_dedup_threshold_curve",
    oracle="WITH "
    + JACCARD_PAIR_CTES
    + """,
    taus AS (SELECT unnest([0.8, 0.9, 0.95]) AS tau)
    SELECT taus.tau AS threshold,
           CAST(COALESCE(SUM(CASE WHEN p.jaccard >= taus.tau
                                  THEN 1 END), 0) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN p.jaccard >= taus.tau
                                    THEN p.da END)
                + COUNT(DISTINCT CASE WHEN p.jaccard >= taus.tau
                                      THEN p.db END) AS BIGINT)
             AS n_doc_slots
    FROM taus LEFT JOIN pairs p ON true
    GROUP BY 1
    """,
)
def docs_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold sensitivity (the tuning table an operator reads
    before picking a near-dup cutoff): pair volume and touched-doc
    slots at tau in {0.8, 0.9, 0.95}, from ONE pass over the shared
    scored-pair checkpoint — no re-join per threshold. ``n_doc_slots``
    counts distinct docs per pair side (a-side + b-side), an upper
    bound on removable docs that needs no per-threshold clustering.
    Thresholds below the checkpoint's 0.8 build floor would need a
    pair rebuild — deliberately out of scope (the checkpoint IS the
    production artifact being tuned over).

    Determinism: jaccard is the same integer-derived double in both
    engines, compared against the same literals; counts are exact.

    Scale: the pair list is near-dup-volume; the curve is one
    explode(x3) + grouped count over it.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_cached(spark, sf_dir, docs)
    taus = F.array(F.lit(0.8), F.lit(0.9), F.lit(0.95))
    ex = pairs.select(
        "doc_a", "doc_b", "jaccard", F.explode(taus).alias("threshold")
    )
    per_tau = ex.groupBy("threshold").agg(
        F.sum(
            F.when(F.col("jaccard") >= F.col("threshold"), 1)
        ).alias("_np"),
        (
            F.count_distinct(
                F.when(
                    F.col("jaccard") >= F.col("threshold"), F.col("doc_a")
                )
            )
            + F.count_distinct(
                F.when(
                    F.col("jaccard") >= F.col("threshold"), F.col("doc_b")
                )
            )
        ).alias("n_doc_slots"),
    )
    # LEFT-join against the full tau list so a tau with zero
    # surviving pairs still emits a row (matching the oracle's
    # LEFT JOIN ... ON true shape)
    tau_df = docs.sparkSession.range(1).select(
        F.explode(taus).alias("threshold")
    )
    return tau_df.join(per_tau, "threshold", "left").select(
        "threshold",
        F.coalesce(F.col("_np"), F.lit(0)).cast("long").alias("n_pairs"),
        F.coalesce(F.col("n_doc_slots"), F.lit(0)).cast("long").alias(
            "n_doc_slots"
        ),
    )
