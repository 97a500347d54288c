"""Deduplication operators (north_star): exact, n-gram-Jaccard near-dup,
MinHash+LSH, SimHash.

Scale design (the point of each variant):

- **Exact** (`exact_dedup`): group on a 128-bit fingerprint, keep the
  min-key row. Shuffles 16-byte keys, not documents.
- **n-gram Jaccard** (`ngram_jaccard_pairs`): exact pairwise similarity
  via a shingle-equi-join. With w-token shingles (w≥8) random docs
  share almost nothing, so the join fan-out is ~|true near-dup pairs|,
  not |docs|² — this is the *verification* stage of a dedup pipeline
  and the oracle for the probabilistic variants.
- **MinHash+LSH** (`minhash_lsh_candidates`): k independent min-hashes
  per doc (one explode + groupBy, no UDF), banded into b buckets; only
  docs sharing a band-bucket meet in the join. At 100 TB the band
  buckets are the shuffle key and the candidate set is near-linear.
- **SimHash** (`simhash_fingerprints`): 64-bit weighted-projection
  fingerprint; near-dups differ in few bits. Hamming-ball join done by
  4×16-bit block keys (pigeonhole: ≤3 differing bits → ≥1 identical
  block).

All hashing uses Spark's built-in xxhash64/hash with fixed seeds —
deterministic across runs and executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wistia_data_pipeline_project_spark.ckpt import spill_checkpoint

from .text import fingerprint, shingle_array, tokens


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Keep one row per distinct text: the min-key row (deterministic
    first-wins, the engine-wide replacement for the reference's
    iteration-order dedup, SURVEY §2 A6).

    One ``min_by(struct(row), key)`` hash aggregate keyed on the
    128-bit fingerprint: a single shuffle, and — unlike the
    row_number window formulation, which must shuffle and sort EVERY
    row — the partial aggregate collapses duplicates map-side, so the
    shuffle carries ~one row per distinct fingerprint per mapper. On
    a high-duplication corpus (the regime dedup exists for) that is
    the dominant term at 100 TB. A pathological hot fingerprint
    (empty text) is harmless for the same reason: the hot key
    pre-aggregates to one row per mapper before AQE ever sees it.
    (Measured vs the window form at sf0.1: ~30% faster warm, same
    exchange count, no sort.)

    ``keep_cols`` narrows the carried row to the named columns (which
    must include ``key_col``): the min_by struct otherwise ships EVERY
    input column — including the text payload the fingerprint already
    summarizes — through the exchange (guide §2.3 shuffle keys and
    metadata, not payloads). Survivor choice is unaffected (it is
    keyed on ``key_col`` alone), so this is a projection pushed below
    the shuffle, never a semantic change.
    """
    cols = keep_cols if keep_cols is not None else df.columns
    if keep_cols is not None and key_col not in keep_cols:
        raise ValueError(f"keep_cols must include key_col {key_col!r}")
    return (
        df.withColumn("_fp", fingerprint(F.col(text_col)))
        .groupBy("_fp")
        .agg(F.min_by(F.struct(*cols), F.col(key_col)).alias("_r"))
        .select("_r.*")
    )


def shingles(text_col: str, width: int = 8) -> F.Column:
    """Distinct w-token shingles of a document as an array column."""
    return F.array_distinct(shingle_array(F.col(text_col), width))


def shingle_table(df: DataFrame, key_col: str = "doc_id", text_col: str = "text", width: int = 8) -> DataFrame:
    """(key, shingle) exploded table, one row per distinct shingle."""
    return df.select(
        F.col(key_col), F.explode(shingles(text_col, width)).alias("shingle")
    )


def _pair_intersections(
    df: DataFrame,
    key_col: str,
    text_col: str,
    width: int,
    max_doc_freq: int = 1000,
    observation=None,
) -> DataFrame:
    """Shared core of the exact pair metrics: the shingle equi-join
    frame (doc_a < doc_b, n_inter, n_a, n_b) that Jaccard and
    containment project differently. One place owns the join topology
    (tie-break, width handling, hot-shingle cap), so the two metrics
    cannot drift.

    **Hot-shingle cap** (the quadratic guard): a shingle appearing in
    k documents emits k² rows from the self-equi-join. Natural w=8
    shingles are near-unique, but at 100 TB one repeated license
    header / templated page makes a single shingle a quadratic hot
    key. Shingles with document frequency > ``max_doc_freq`` are
    therefore REMOVED — from the intersection join AND from the
    per-doc sizes — so the metric becomes exact Jaccard/containment
    over the df-capped shingle universe. That keeps the invariants
    that matter (identical docs still score 1.0; a subset doc is
    still 1.0-contained) while bounding join fan-out by
    ``max_doc_freq`` × df per shingle. Exactness proviso: a pair
    whose ONLY shared shingles are hot is not emitted — by
    construction such pairs share nothing but boilerplate.

    The hot set itself is found with one map-side-combined count per
    distinct shingle; it is structurally tiny (few shingles repeat
    across >1000 docs), so Spark's planner (AQE) executes the
    ``left_anti`` removal as a broadcast join — the corpus-sized side
    is NOT re-shuffled. A pathological corpus that makes the hot set
    itself large degrades to a shuffle anti-join, not an OOM.
    Pass an ``observation`` (``pyspark.sql.Observation``) to surface
    ``n_hot_shingles`` / ``n_dropped_shingle_rows`` / ``max_doc_freq_seen``
    after the action — the repo's no-silent-caps contract.
    """
    sh = shingle_table(df, key_col, text_col, width)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    hot = freq.filter(F.col("_df") > max_doc_freq)
    if observation is not None:
        hot = hot.observe(
            observation,
            F.count(F.lit(1)).alias("n_hot_shingles"),
            F.coalesce(F.sum("_df"), F.lit(0)).alias("n_dropped_shingle_rows"),
            F.coalesce(F.max("_df"), F.lit(0)).alias("max_doc_freq_seen"),
        )
    # materialize the capped shingle table ONCE (lazy spill
    # checkpoint, r11): it feeds BOTH self-join sides and the sizes
    # aggregate, and the un-checkpointed plan inlined the whole
    # tokenize+shingle+df-count+anti-join chain into each consumer —
    # 3 full shingle pipelines per metric (32 scans in
    # docs_containment's static plan). Shingle rows are corpus-scaled:
    # serialized, disk-evictable.
    sh = spill_checkpoint(
        sh.join(hot.select("shingle"), "shingle", "left_anti")
    )
    sizes = sh.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col(f"a.{key_col}") < F.col(f"b.{key_col}"))
        .groupBy(
            F.col(f"a.{key_col}").alias("doc_a"), F.col(f"b.{key_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(key_col).alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(key_col).alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return inter.join(sa, "doc_a").join(sb, "doc_b")


def ngram_jaccard_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    threshold: float = 0.8,
    max_doc_freq: int = 1000,
    observation=None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1
    non-hot shingle (see ``_pair_intersections`` for the
    ``max_doc_freq`` cap semantics).

    intersection via shingle equi-join; union = |A|+|B|-∩. The single
    double division keeps the value deterministic for the oracle.
    """
    j = _pair_intersections(
        df, key_col, text_col, width, max_doc_freq, observation
    ).withColumn(
        "jaccard",
        F.col("n_inter").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "n_inter", "jaccard"
    )


def containment_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    threshold: float = 0.9,
    max_doc_freq: int = 1000,
    observation=None,
) -> DataFrame:
    """Asymmetric shingle containment |A∩B| / |A| ≥ threshold — flags
    documents mostly CONTAINED in another (prefix/subset duplicates
    that symmetric Jaccard under-scores when the container is much
    longer). Emits one row per contained direction: (doc_sub ⊆
    doc_sup).

    Scale: same single shingle equi-join as ``ngram_jaccard_pairs``
    (fan-out bounded by near-unique w=8 shingles plus the
    ``max_doc_freq`` hot-shingle cap — see ``_pair_intersections``);
    the directional split is a projection over the joined counts, not
    a second join.
    """
    j = _pair_intersections(df, key_col, text_col, width, max_doc_freq, observation)
    ab = j.select(
        F.col("doc_a").alias("doc_sub"),
        F.col("doc_b").alias("doc_sup"),
        "n_inter",
        (F.col("n_inter").cast("double") / F.col("n_a")).alias("containment"),
    )
    ba = j.select(
        F.col("doc_b").alias("doc_sub"),
        F.col("doc_a").alias("doc_sup"),
        "n_inter",
        (F.col("n_inter").cast("double") / F.col("n_b")).alias("containment"),
    )
    return ab.unionByName(ba).filter(F.col("containment") >= threshold)


def minhash_signatures(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    width: int = 8,
) -> DataFrame:
    """k min-hash values per document, computed JVM-side.

    Shape: explode shingles → hash once per shingle → ONE groupBy(doc)
    carrying k ``min(xxhash64(_h, seed))`` aggregate lanes assembled
    into the signature array. Each shingle row updates its doc's k
    lanes in a single hash-aggregate slot — the r11 formulation
    exploded a k-seed sequence per shingle (k× the rows, k× the
    aggregate-map lookups, a (doc, seed) shuffle of k rows per doc
    followed by a second collect_list aggregation to assemble the
    array); this one evaluates the SAME k hash expressions per shingle
    with no row blowup, shuffles ONE k-long row per doc, and needs no
    assembly pass (guide §2.3 aggregate-before-shuffle / §2.4 one
    exchange instead of two). Values are identical by construction:
    min over the same shingle set of xxhash64(_h, seed) with the same
    int seed, lane s at signature[s] in both formulations. Everything
    stays plain codegen'd expressions — deliberately NOT nested
    higher-order-function lambdas over arrays, which fall back to
    interpreted evaluation (measured 20 s vs <1 s at sf0.01 for the
    same 1.5M hash evaluations); the lane list is one parsed F.expr
    string (the aa95161 plan-build rule).
    """
    sh_tab = df.select(
        F.col(key_col), F.explode(shingles(text_col, width)).alias("_g")
    )
    hashed = sh_tab.select(key_col, F.xxhash64("_g").alias("_h"))
    lanes = ",".join(
        f"min(xxhash64(_h, {s}))" for s in range(num_hashes)
    )
    return hashed.groupBy(key_col).agg(
        F.expr(f"array({lanes})").alias("signature")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    width: int = 8,
    max_bucket: int = 1000,
    observation=None,
) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on ≥1 LSH band.

    bands=16 × rows=4 over k=64: P(candidate) = 1-(1-J^4)^16 — ≈1 for
    J≥0.8, ≈0.04 for J=0.2. The band hash is the shuffle key; no
    pairwise work outside a bucket. num_hashes must split evenly into
    bands — a remainder would silently discard the trailing hashes
    (paid for, never banded).

    Pairs are emitted bucket-locally via groupBy(band, bucket) +
    collect_list, NOT a self-join: a self-join would inline the whole
    signature expression tree into both sides (measured 39 s vs 0.4 s
    at sf0.01 from plan/codegen blowup alone) and at scale would scan
    and hash the corpus twice. Bucket membership lists are tiny by
    construction (only near-dups collide); a pathological hot bucket
    (a stop-shingle band) degrades to linear star pairing instead of
    a quadratic task — see ``bucket_pairs``.
    """
    if num_hashes % bands:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands})"
        )
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, key_col, text_col, num_hashes, width)
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sigs.select(
        key_col,
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(key_col, "bb.band", "bb.bucket")
    return bucket_pairs(
        banded, key_col, ["band", "bucket"], max_bucket, observation
    )


def bucket_pairs(
    df: DataFrame,
    key_col: str,
    bucket_cols: list[str],
    max_bucket: int = 1000,
    observation=None,
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs of keys sharing a bucket.

    groupBy + collect_list + array-comprehension pair expansion — one
    pass over the input, bucket as the only shuffle key.

    Buckets over ``max_bucket`` members switch from all-pairs to STAR
    pairing — every member paired with the bucket's min key — instead
    of being dropped: output stays linear in the bucket size (no
    quadratic task skew from a degenerate hot key, e.g. a stop-shingle
    band), and every member still reaches downstream verify at least
    once through the anchor. Scope of the guarantee: ON THE EMITTED
    CANDIDATE GRAPH the overflowed bucket is one connected component
    (star through the anchor); after a similarity VERIFY filter,
    member-member pairs the star never emitted cannot be recovered, so
    direct-pair recall inside an overflowed bucket is partial and
    verify-filtered clusters can split — a graceful degradation
    (vs. the previous total drop), not losslessness. Pass an
    ``observation`` (``pyspark.sql.Observation``) to surface
    ``n_overflow_buckets`` / ``max_bucket_members`` after the action —
    the executor-side equivalent of a warning log — and treat a
    nonzero count as the signal to re-band/re-block or raise the cap.
    """
    buckets = (
        df.groupBy(*bucket_cols)
        .agg(F.collect_list(key_col).alias("_members"))
        .filter(F.size("_members") > 1)
    )
    if observation is not None:
        buckets = buckets.observe(
            observation,
            F.sum((F.size("_members") > max_bucket).cast("long")).alias(
                "n_overflow_buckets"
            ),
            F.max(F.size("_members")).alias("max_bucket_members"),
        )
    all_pairs = F.filter(
        F.flatten(
            F.transform(
                F.col("_members"),
                lambda x: F.transform(
                    F.col("_members"),
                    lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                ),
            )
        ),
        lambda p: p["doc_a"] < p["doc_b"],
    )
    anchor = F.array_min("_members")
    star = F.filter(
        F.transform(
            F.col("_members"),
            lambda y: F.struct(anchor.alias("doc_a"), y.alias("doc_b")),
        ),
        lambda p: p["doc_a"] < p["doc_b"],
    )
    pairs = F.when(F.size("_members") <= max_bucket, all_pairs).otherwise(star)
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    width: int = 8,
    observation=None,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify.

    Output equals exact all-pairs Jaccard≥threshold (up to LSH recall,
    ≈1-(1-t^4)^16 ≥ 0.9996 at t=0.8), at candidate-set cost.

    The verify stage touches ONLY candidate docs: doc ids appearing in
    some candidate pair are semi-joined against the corpus first, then
    each candidate pair is joined to the two docs' distinct-shingle
    ARRAYS and the intersection is computed in place with
    ``array_intersect`` (whole-stage codegen) — no shingle-exploded
    self-join anywhere. At 100 TB the pre-LSH verify cost is therefore
    O(|candidate docs|) rows shuffled, not O(|corpus shingles|²)
    join fan-in: LSH actually bounds the verify cost instead of just
    filtering its output.
    """
    cands = minhash_lsh_candidates(
        df, key_col, text_col, num_hashes, bands, width, observation=observation
    )
    cand_ids = (
        cands.select(F.col("doc_a").alias(key_col))
        .union(cands.select(F.col("doc_b").alias(key_col)))
        .distinct()
    )
    # distinct shingles per candidate doc, as an array (no explode)
    dws = (
        df.join(cand_ids, key_col, "left_semi")
        .select(F.col(key_col), shingles(text_col, width).alias("_sh"))
        .withColumn("_n", F.size("_sh"))
    )
    a = dws.select(
        F.col(key_col).alias("doc_a"), F.col("_sh").alias("_sh_a"), F.col("_n").alias("n_a")
    )
    b = dws.select(
        F.col(key_col).alias("doc_b"), F.col("_sh").alias("_sh_b"), F.col("_n").alias("n_b")
    )
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("_sh_a", "_sh_b")).cast("long"))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )


# Lane-packing capacity: 4 per-bit counters share one long in 16-bit
# lanes; beyond this token count a lane can carry into its neighbor
# and silently corrupt the fingerprint, so the regime is ENFORCED.
SIMHASH_MAX_TOKENS = 32767


def _token_hash64(col: F.Column, hash_fn: str) -> F.Column:
    """64-bit token hash. ``"xxhash64"`` (default everywhere) stays on
    Spark's native hash — fastest, but not reproducible outside Spark.
    ``"md5_64"`` takes the first 16 hex chars of md5 as a big-endian
    64-bit pattern — md5 is identical in every engine, so a DuckDB
    oracle can replay the ENTIRE SimHash pipeline bit-for-bit (the
    catalog uses it to hash-check the near-dup pair listing that was
    previously a rows-only entry). Built from two 32-bit halves
    because ``conv`` returns an unsigned decimal string that
    overflows a signed long cast above 2^63."""
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5_64":
        h = F.md5(col)
        hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
        return F.shiftleft(hi, 32).bitwiseOR(lo)
    raise ValueError(f"hash_fn must be 'xxhash64' or 'md5_64', got {hash_fn!r}")


def simhash_fingerprints(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    oversize: str = "error",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash per document from token hashes.

    bit_i(doc) = sign(Σ_tokens ±1 on hash bit i). Computed by
    exploding tokens, hashing once per token, and running 64 plain
    conditional-sum aggregates per doc — all whole-stage codegen with
    map-side partial aggregation, so the shuffle carries 64 ints per
    doc. (The per-array ``F.aggregate`` HOF formulation evaluates
    interpreted and was ~10× slower.) ``explode_outer`` keeps empty
    docs (simhash 0), matching aggregate-over-empty-array semantics.

    Docs beyond ``SIMHASH_MAX_TOKENS`` would overflow the packed
    lanes; ``oversize`` picks the policy: ``"error"`` (default) fails
    the job naming the doc, ``"skip"`` drops such docs from the
    output (callers should pre-chunk them instead).
    """
    if oversize not in ("error", "skip"):
        raise ValueError(f"oversize must be 'error' or 'skip', got {oversize!r}")
    # the guard must run BEFORE the aggregate (an oversized doc can
    # overflow a packed lane inside the sum itself), so it gates on the
    # token-array size in the scan projection — no extra pass
    toks = df.select(F.col(key_col), tokens(F.col(text_col)).alias("_toks"))
    over = F.size("_toks") > SIMHASH_MAX_TOKENS
    if oversize == "skip":
        toks = toks.filter(~over)
    else:
        toks = toks.withColumn(
            "_toks",
            F.when(
                over,
                F.raise_error(
                    F.format_string(
                        "simhash lane-packing limit exceeded: doc %s has %s "
                        "tokens (max 32767); pre-chunk it or pass "
                        "oversize='skip'",
                        F.col(key_col).cast("string"),
                        F.size("_toks").cast("string"),
                    )
                ).cast("array<string>"),
            ).otherwise(F.col("_toks")),
        )
    tok = toks.select(F.col(key_col), F.explode_outer("_toks").alias("_t"))
    hashed = tok.select(
        key_col,
        F.when(F.col("_t").isNotNull(), _token_hash64(F.col("_t"), hash_fn)).alias(
            "_h"
        ),
    )
    # sign(Σ ±1) > 0  ⇔  2·(count of 1-bits) > n. Per-bit counts are
    # LANE-PACKED: each of 16 sum-aggregates carries 4 counts in
    # 16-bit lanes of one long (valid while a doc has ≤ 32767 tokens —
    # the top lane sits at bit 48 and must not carry into the sign
    # bit; at larger docs, pre-chunk — the corpus regime is hundreds
    # of tokens). 17 agg buffers instead of 65 cuts the
    # generated hash-agg code ~4× (measured: ~7 s of per-session
    # Janino compile down to ~2 s) with identical semantics.
    # both the 16 packed aggregates and the 64-branch assembly are
    # built as PARSED SQL strings: the Column-operator form cost ~650
    # py4j round trips (~1.5-2 s of pure plan-build latency billed to
    # every build of every simhash entry — r11 optimization); the
    # strings parse to the identical expression trees
    def packed(j: int):
        lanes = " + ".join(
            f"shiftleft(shiftrightunsigned(_h, {4 * j + lane}) & 1, "
            f"{16 * lane})"
            for lane in range(4)
        )
        return F.expr(f"sum({lanes})").alias(f"_p{j}")

    votes = hashed.groupBy(key_col).agg(
        F.count("_h").alias("_n"), *[packed(j) for j in range(16)]
    )
    parts = ["CAST(0 AS BIGINT)"]
    for i in range(64):
        j, lane = divmod(i, 4)
        # 1<<63 overflows signed long; its bit pattern is long MIN_VALUE
        mask = (1 << i) if i < 63 else -(1 << 63)
        parts.append(
            f"CASE WHEN (shiftrightunsigned(_p{j}, {16 * lane}) & 65535)"
            f" * 2 > _n THEN CAST({mask} AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        )
    simhash = F.expr(" | ".join(parts))
    return votes.select(F.col(key_col), simhash.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 1000,
    observation=None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Pigeonhole blocking: split the 64-bit fingerprint into 4×16-bit
    blocks; pairs within distance 3 share at least one block, so the
    bucket key is (block_idx, block_value) — linear candidate
    generation, then exact popcount verify. Pair expansion happens
    bucket-locally (collect_list of (key, simhash) structs, see
    ``bucket_pairs`` rationale) so the fingerprint expression is
    evaluated once per doc and no self-join duplicates the plan.
    """
    fps = simhash_fingerprints(df, key_col, text_col, hash_fn=hash_fn)
    blocks = fps.select(
        F.struct(F.col(key_col).alias("key"), F.col("simhash").alias("sh")).alias(
            "_member"
        ),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("block_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("_member", "b.block_idx", "b.block_val")
    buckets = (
        blocks.groupBy("block_idx", "block_val")
        .agg(F.collect_list("_member").alias("_members"))
        .filter(F.size("_members") > 1)
    )
    if observation is not None:
        buckets = buckets.observe(
            observation,
            F.sum((F.size("_members") > max_bucket).cast("long")).alias(
                "n_overflow_buckets"
            ),
            F.max(F.size("_members")).alias("max_bucket_members"),
        )
    all_pairs = F.filter(
        F.flatten(
            F.transform(
                F.col("_members"),
                lambda x: F.transform(
                    F.col("_members"),
                    lambda y: F.struct(
                        x["key"].alias("doc_a"),
                        y["key"].alias("doc_b"),
                        x["sh"].alias("sh_a"),
                        y["sh"].alias("sh_b"),
                    ),
                ),
            )
        ),
        lambda p: p["doc_a"] < p["doc_b"],
    )
    # oversized bucket (degenerate block value, e.g. simhash 0 from a
    # sea of empty docs): linear star expansion around the min-key
    # member instead of a quadratic task — same policy, scope, and
    # monitoring contract as ``bucket_pairs``
    anchor = F.array_min("_members")
    star = F.filter(
        F.transform(
            F.col("_members"),
            lambda y: F.struct(
                anchor["key"].alias("doc_a"),
                y["key"].alias("doc_b"),
                anchor["sh"].alias("sh_a"),
                y["sh"].alias("sh_b"),
            ),
        ),
        lambda p: p["doc_a"] < p["doc_b"],
    )
    pairs = F.when(F.size("_members") <= max_bucket, all_pairs).otherwise(star)
    cand = (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.sh_a", "p.sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def remove_duplicated_spans(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    width: int = 32,
    min_df: int = 2,
) -> DataFrame:
    """Surgical substring dedup (Lee et al. 2022, *Deduplicating
    Training Data Makes Language Models Better*): REMOVE every token
    covered by a ``width``-token window that appears in ≥ ``min_df``
    distinct documents — the editing counterpart of the
    ``docs_substring_dedup`` scoring signal. Returns (key,
    clean_text, n_tokens, n_tokens_removed).

    Construction (all equi-joins, no pair expansion):

    1. windows with POSITIONS (posexplode of the shingle array — the
       same window twice in one doc removes both occurrences);
    2. corpus document frequency per window fingerprint (distinct
       (doc, fp) first, so within-doc repeats don't inflate df);
    3. duplicated-window hits explode to covered token indices
       (pos..pos+width-1 — fan-out ≤ width × duplicated-window
       count, linear);
    4. the kept tokens rebuild via a deterministic position-sorted
       ``array_sort(collect_list(struct(idx, tok)))`` per doc.

    Scale: windows shuffle as 16-byte md5 fingerprints; the covered-
    index explode is bounded by duplication volume, not corpus size;
    the rebuild groups on the doc key (text payload touched exactly
    twice: the scan and the rebuild). A fully-duplicated document
    comes back as the empty string — the caller's drop policy, not
    silently missing.
    """
    # tokens()/shingle_array() are the module's single-source
    # tokenization (text.py) — re-inlining them here could drift.
    # NULL text normalizes to "" so accounting reports (\"\", 0, 0),
    # same as the empty-string path, never NULL counts.
    txt = F.coalesce(F.col(text_col), F.lit(""))
    t = df.select(F.col(key_col), tokens(txt).alias("_toks"))
    n = F.size("_toks")
    # materialized once (lazy spill checkpoint, r11): the window
    # stream feeds BOTH the document-frequency aggregate and the
    # covered-index join, and the un-checkpointed plan inlined the
    # tokenize+shingle+md5 pipeline into each consumer. 16-byte
    # fingerprints + positions — compact, serialized, disk-evictable.
    wins = spill_checkpoint(
        df.select(
            F.col(key_col),
            tokens(txt).alias("_toks"),
            F.posexplode(
                F.transform(shingle_array(txt, width), F.md5)
            ).alias("pos", "wfp"),
        ).filter(F.size("_toks") >= width).select(key_col, "pos", "wfp")
    )
    docfreq = (
        wins.select(key_col, "wfp")
        .distinct()
        .groupBy("wfp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("wfp")
    )
    covered = (
        wins.join(docfreq, "wfp")
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + width - 1)
            ).alias("tokidx"),
        )
        .distinct()
    )
    tok_rows = t.select(
        key_col, F.posexplode("_toks").alias("tokidx", "tok")
    )
    kept = tok_rows.join(covered, [key_col, "tokidx"], "left_anti")
    rebuilt = kept.groupBy(key_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tokidx", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = t.select(key_col, n.alias("n_tokens"))
    return (
        totals.join(rebuilt, key_col, "left")
        .select(
            key_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("_n_kept", F.lit(0))).alias(
                "n_tokens_removed"
            ),
        )
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    width: int = 8,
) -> DataFrame:
    """Exact Jaccard pairs via PREFIX FILTERING (SSJoin/PPJoin family
    — Chaudhuri et al. 2006, Xiao et al. 2008): the third candidate
    strategy next to the df-capped all-pairs join
    (``ngram_jaccard_pairs``) and MinHash-LSH. Deterministic and
    LOSSLESS at any threshold: two sets with J ≥ t MUST share a
    shingle within each other's prefix, so candidates ⊇ true pairs
    and the exact verify makes output = true pairs — no LSH recall
    bound, no df-cap exactness proviso.

    Per document the distinct shingles sort by GLOBAL rarity
    (document frequency asc, shingle asc — rarest first); only the
    first ``|d| − ceil(t·|d|) + 1`` shingles join. At t=0.8 that's
    ~20% of each document's shingles, and they are by construction
    the RAREST 20% — the frequent shingles that make the naive join
    quadratic never enter the join at all (the same hot keys the
    df-cap drops, handled here without losing exactness).

    Scale: one df-count shuffle, one doc-key shuffle to rebuild
    sorted sets, the prefix equi-join (fan-out per shingle ≤ its
    rarity rank — bounded exactly where the naive join explodes),
    and the candidate-bounded array_intersect verify shared with the
    MinHash path. Join cost grows with threshold⁻¹; below t≈0.5 the
    prefixes dominate the sets and LSH wins — documented trade.
    """
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    sh = shingle_table(df, key_col, text_col, width)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    ranked = sh.join(freq, "shingle").groupBy(key_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("_df", "shingle"))
            ),
            lambda s: s["shingle"],
        ).alias("_sorted"),
        F.count(F.lit(1)).alias("_n"),
    )
    p_len = (
        F.col("_n")
        - F.ceil(F.lit(float(threshold)) * F.col("_n")).cast("long")
        + 1
    )
    # materialize the ranked prefix table ONCE (lazy spill checkpoint,
    # r11): it feeds BOTH sides of the prefix self-join, and the
    # un-checkpointed plan inlined the whole shingle+df-count+sort
    # chain into each side (and again under the verify's semi-join) —
    # 44 parquet scans / 126 exchanges in the static plan at sf0.1.
    # Prefix rows are ~20% of shingle volume, serialized-disk-evictable.
    pre = spill_checkpoint(
        ranked.select(
            F.col(key_col),
            F.col("_n"),
            F.posexplode(F.slice("_sorted", 1, p_len)).alias("_pos", "shingle"),
        )
    )
    a = pre.select(
        F.col(key_col).alias("doc_a"),
        "shingle",
        F.col("_pos").alias("_pa"),
        F.col("_n").alias("_na"),
    )
    b = pre.select(
        F.col(key_col).alias("doc_b"),
        "shingle",
        F.col("_pos").alias("_pb"),
        F.col("_n").alias("_nb"),
    )
    # PPJoin+ candidate-time bounds (round 9 — Xiao et al. 2008 §3):
    # both prune BEFORE the distinct, both conservative by one token
    # of slack so no float-boundary discrepancy with the verify's
    # double-divided ``jaccard >= threshold`` can ever drop a true
    # pair (the verify stays the exactness decision-maker; these
    # filters only shrink its input):
    # - LENGTH: J >= t forces min(|a|,|b|) >= t*max(|a|,|b|).
    # - POSITIONAL: a match at 0-based prefix positions (pa, pb)
    #   bounds the overlap by min(pa,pb) common tokens before it + 1
    #   + min remaining after it (both docs sort shingles in the SAME
    #   global rarity order); a pair survives if ANY shared prefix
    #   token admits overlap >= the J>=t minimum
    #   alpha = ceil(t/(1+t)*(|a|+|b|)) — every common prefix token
    #   of a true pair does (its bound >= the true overlap >= alpha),
    #   so any-match-passes keeps exactly the lossless candidate set.
    t = float(threshold)
    alpha = (
        F.ceil(F.lit(t / (1.0 + t)) * (F.col("_na") + F.col("_nb"))) - 1
    )
    ubound = (
        F.least(F.col("_pa"), F.col("_pb"))
        + 1
        + F.least(
            F.col("_na") - F.col("_pa") - 1, F.col("_nb") - F.col("_pb") - 1
        )
    )
    # candidate list consumed three times (both verify sides' semi-join
    # and the final pair join) — pair-volume, checkpoint it too (r11)
    cands = spill_checkpoint(
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.least("_na", "_nb").cast("double")
            >= F.lit(t) * F.greatest("_na", "_nb") - F.lit(1.0)
        )
        .filter(ubound >= alpha)
        .select("doc_a", "doc_b")
        .distinct()
    )
    # exact verify on candidate docs only (the minhash-verify shape)
    cand_ids = (
        cands.select(F.col("doc_a").alias(key_col))
        .union(cands.select(F.col("doc_b").alias(key_col)))
        .distinct()
    )
    dws = (
        df.join(cand_ids, key_col, "left_semi")
        .select(F.col(key_col), shingles(text_col, width).alias("_sh"))
        .withColumn("_n", F.size("_sh"))
    )
    av = dws.select(
        F.col(key_col).alias("doc_a"),
        F.col("_sh").alias("_sh_a"),
        F.col("_n").alias("n_a"),
    )
    bv = dws.select(
        F.col(key_col).alias("doc_b"),
        F.col("_sh").alias("_sh_b"),
        F.col("_n").alias("n_b"),
    )
    return (
        cands.join(av, "doc_a")
        .join(bv, "doc_b")
        .withColumn(
            "n_inter", F.size(F.array_intersect("_sh_a", "_sh_b")).cast("long")
        )
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )
