"""Training-data assembly operators (north_star extension, beyond the
reference's surface): deterministic dataset splitting, token-budget
packing, and benchmark-contamination detection — the ops that sit
between "deduped corpus" and "training shards" in an LLM data
pipeline.

All three are pure DataFrame compositions (no UDFs) with exact DuckDB
oracles:

- **split_assign**: md5-bucketed train/val/test assignment. The hash
  is content-addressed on the KEY, so membership is stable across
  runs, cluster sizes, and partitionings — re-ingesting the corpus
  never migrates a doc between splits (the property random() splits
  lack). 256 lexicographic hex buckets give 1/256 granularity.
- **pack_documents**: offset-based packing of docs into fixed token
  budgets, per source shard. A doc belongs to the pack where its
  cumulative token offset starts; packing is windowed WITHIN each
  source so the sort parallelizes across shards (a global order would
  serialize into one partition at 100 TB — deliberately avoided).
- **contamination**: train docs sharing ≥1 w-token shingle with any
  benchmark doc. Shingle equi-join (same bounded fan-out argument as
  n-gram Jaccard dedup: width-8 shingles are near-unique outside real
  overlap) + two semi-joins; no pairwise expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .dedup import shingle_table
from .text import tokens


def split_cuts(train: float = 0.9, val: float = 0.05) -> tuple[str, str]:
    """The two hex bucket cut points for (train, val) fractions — the
    single source of truth shared by ``split_assign`` and the SQL
    oracle generator. A cut of 256 (train+val == 1.0) must compare
    above every 2-char hex bucket: format(256,'02x') is the 3-char
    '100', which sorts BELOW 'e6' lexicographically and would dump val
    into test (and leak low buckets into val) — a sentinel above 'ff'
    instead."""
    if not (0 < train < 1 and 0 <= val < 1 and train + val <= 1):
        raise ValueError(f"bad split fractions: train={train}, val={val}")

    def fmt(cut: int) -> str:
        return "zz" if cut >= 256 else format(cut, "02x")

    return fmt(int(train * 256)), fmt(int((train + val) * 256))


def split_assign(
    df: DataFrame,
    key_col: str = "doc_id",
    train: float = 0.9,
    val: float = 0.05,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic content-addressed split: bucket = first 2 hex
    chars of md5(key) (256 buckets, compared lexicographically — hex
    order == numeric order), thresholds at ``int(frac*256)``. The
    identical expression runs in any SQL engine, so split membership
    is portable across the whole stack."""
    t_cut, v_cut = split_cuts(train, val)
    bucket = F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)
    return df.withColumn(
        split_col,
        F.when(bucket < F.lit(t_cut), F.lit("train"))
        .when(bucket < F.lit(v_cut), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def pack_documents(
    df: DataFrame,
    budget: int = 2048,
    shard_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each doc to a token-budget pack within its shard.

    ``pack_id = floor(tokens_before_this_doc / budget)`` under
    (shard, key) order — offset packing: a doc straddling a boundary
    belongs to the pack where it STARTS, and a doc longer than the
    budget still gets exactly one pack. One shuffle on the shard key;
    the running sum is a per-shard window, map-parallel across shards.
    """
    w = (
        W.partitionBy(shard_col)
        .orderBy(key_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    n_tok = F.size(tokens(F.col(text_col)))
    prev = F.coalesce(F.sum(n_tok).over(w), F.lit(0))
    return df.select(
        F.col(shard_col),
        F.col(key_col),
        n_tok.alias("n_tokens"),
        F.floor(prev / budget).cast("long").alias("pack_id"),
    )


def contamination(
    df: DataFrame,
    bench: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
) -> DataFrame:
    """Train docs whose text shares at least one ``width``-token
    shingle with any benchmark doc (the standard n-gram decontamination
    test). ``bench`` holds the benchmark keys (one column, same name).

    Plan: shingle both sides once, semi-join train shingles against
    the (distinct) benchmark shingle set, distinct on the train key.
    The benchmark side is typically tiny → its distinct shingle set
    broadcasts; the train side never self-joins or pair-expands.
    """
    bench_keys = bench.select(key_col)
    sh = shingle_table(df, key_col, text_col, width)
    bench_sh = (
        sh.join(bench_keys, key_col, "left_semi").select("shingle").distinct()
    )
    return (
        sh.join(bench_keys, key_col, "left_anti")
        .join(bench_sh, "shingle", "left_semi")
        .select(key_col)
        .distinct()
    )


def chunk_documents(
    df: DataFrame,
    budget: int = 512,
    overlap: int = 64,
    key_col: str = "doc_id",
    text_col: str = "text",
    with_text: bool = False,
) -> DataFrame:
    """Split documents into fixed token windows with overlap — the
    context-window chunking step between packing and tokenization in a
    training pipeline. Chunk i covers tokens [i·stride, i·stride +
    budget) with stride = budget − overlap; every doc yields ≥ 1
    chunk (short and empty docs produce one, possibly short/empty).

    Pure narrow generate (sequence + posexplode + slice): no shuffle,
    fan-out bounded by corpus_tokens / stride. The chunk text is
    emitted as an md5 so downstream comparisons/dedup ship 16 bytes,
    not the text; callers re-slice when they need the payload, or pass
    ``with_text=True`` to also emit the joined ``chunk_text`` column
    (used by chunk-level dedup/clustering, which re-shingles it).
    """
    if not 0 <= overlap < budget:
        raise ValueError(f"need 0 <= overlap < budget, got {overlap}/{budget}")
    stride = budget - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(float(stride))).cast("int"), F.lit(1)
    )
    t = df.select(F.col(key_col), toks.alias("_toks"), n_chunks.alias("_nc"))
    ex = t.select(
        key_col,
        "_toks",
        F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_idx"),
    )
    chunk = F.slice(
        F.col("_toks"), F.col("chunk_idx") * stride + 1, F.lit(budget)
    )
    out = [
        F.col(key_col),
        F.col("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    ]
    if with_text:
        out.append(F.array_join(chunk, " ").alias("chunk_text"))
    return ex.select(*out)


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    k: int = 20,
    key_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows within each
    stratum by md5(key:salt) (a portable uniform permutation — same
    trick as ``split_assign``) and keep the k lowest. Content-
    addressed like the split: membership is stable across runs,
    engines, and partitionings, and changing ``salt`` redraws the
    sample without touching anything else.

    Scale: the rank-filter compiles to WindowGroupLimit (Spark ≥3.5):
    each task keeps a k-row heap per stratum BEFORE the shuffle, so
    the exchange carries ~k rows per stratum per mapper — not the
    corpus. This is the reservoir-sampling shape, but deterministic
    and rerunnable.
    """
    order = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{salt}")))
    rk = F.row_number().over(
        W.partitionBy(strata_col).orderBy(order, F.col(key_col))
    )
    return (
        df.withColumn("sample_rank", rk)
        .filter(F.col("sample_rank") <= k)
        .withColumn("sample_rank", F.col("sample_rank").cast("long"))
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic mixture/curriculum downsampling: each source is
    kept at its configured rate via a content-addressed hex-threshold
    draw (no RNG, no sampleBy non-determinism) — rerunnable, portable,
    and stable under repartitioning.

    Keep rule: first 8 hex chars of md5(key:salt) sort below the
    source's threshold hex ``format(int(w * 16^8), '08x')`` — the same
    content-addressed uniform draw as ``split_assign``, portable to
    any engine with md5. Sources absent from ``weights`` (or with
    w ≥ 1.0) are kept unconditionally: a 9-char threshold like
    '100000000' would sort BELOW 'a…' lexicographically (same trap as
    ``split_cuts``), so full weight short-circuits to TRUE.

    Scale: pure codegen'd filter in the scan projection — no shuffle,
    no state; the weights fold into a literal CASE. This is the
    pretraining mixture-reweighting primitive (e.g. upweight curated
    sources, downsample crawl).
    """
    sub = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{salt}"))), 1, 8
    )
    keep = F.lit(False)
    covered = F.lit(False)
    for src, w in weights.items():
        thresh = format(int(float(w) * 16**8), "08x")
        src_match = F.col(source_col) == src
        src_keep = F.lit(True) if float(w) >= 1.0 else (sub < F.lit(thresh))
        keep = F.when(src_match, src_keep).otherwise(keep)
        covered = covered | src_match
    return df.filter(F.when(covered, keep).otherwise(F.lit(True)))


def shard_assign(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Content-addressed shard id: first 8 hex chars of md5(key:salt)
    mod n_shards — uniform, RNG-free, stable under repartitioning and
    engine-portable (same arithmetic in SQL: ``CAST(('0x' || hex8) AS
    BIGINT) % n``). The companion of ``split_assign`` for the EXPORT
    side of the pipeline."""
    hex8 = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{salt}"))), 1, 8
    )
    sid = F.conv(hex8, 16, 10).cast("long") % n_shards
    return df.withColumn("shard_id", sid)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Export a corpus as n deterministic training shards: parquet
    partitioned by content-addressed ``shard_id``, rows sorted by key
    WITHIN each shard file, plus a returned manifest (one row per
    shard: count + order-invariant content fingerprint) the consumer
    can verify against.

    Scale: ``repartition(shard_id)`` is the one shuffle — each output
    file is written by the task owning that shard, so file count ==
    shard count regardless of input layout (no small-file explosion);
    the within-shard sort is per-partition (no global sort). The
    manifest fingerprint is xor-free: md5s summed as decimal(38,0) mod
    2^127 is commutative → order-invariant, map-side combinable, and
    reproducible in SQL.
    """
    sharded = shard_assign(df, n_shards, key_col, salt)
    (
        sharded.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", key_col)
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
    fp = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    return sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(fp).alias("content_sum"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int = 20,
    strata_col: str | None = None,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis 2006): each row draws a content-addressed
    uniform u ∈ (0,1) from md5(key:salt) and is ranked by the
    exponential-sort key u^(1/w) — the top-k by that key are a
    weight-proportional sample, globally or per stratum. The
    importance-sampling executor for ``docs_dsir_weights``-style
    scores: rows with twice the weight are (exactly, not
    asymptotically) twice as likely to beat any given rival.

    Rank key math in log space (``log(u)/w`` — monotone transform of
    u^(1/w), avoids pow underflow at tiny weights); u derives from
    the first 13 md5 hex chars (52 bits — exactly double's mantissa,
    portable to any engine with md5; +2^-53 keeps log(0) out).
    Non-positive/NULL weights are EXCLUDED before ranking (never
    returned, even when a stratum has fewer than k eligible rows).

    Scale: same WindowGroupLimit shape as ``stratified_sample`` —
    per-task k-row heaps before the one shuffle, ~k rows per stratum
    per mapper on the wire, corpus never sorted. Changing ``salt``
    redraws; membership is stable across runs/partitionings/engines.
    """
    hx = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{salt}"))), 1, 13
    )
    u = F.conv(hx, 16, 10).cast("double") / F.lit(float(16**13)) + F.lit(2.0**-53)
    w = F.col(weight_col).cast("double")
    part = W.partitionBy(strata_col) if strata_col else W.partitionBy()
    rk = F.row_number().over(
        part.orderBy(F.desc_nulls_last("_ws_key"), F.col(key_col))
    )
    return (
        # probability-zero rows are EXCLUDED, not merely outranked: a
        # stratum with fewer than k positive-weight rows must return a
        # short sample, never pad it with weight-0/NULL members
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("_ws_key", F.log(u) / w)
        .withColumn("sample_rank", rk)
        .filter(F.col("sample_rank") <= k)
        .drop("_ws_key")
        .withColumn("sample_rank", F.col("sample_rank").cast("long"))
    )


def temperature_weights(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.3,
    quantize: int | None = None,
) -> DataFrame:
    """Temperature-based mixture weights (the multilingual-sampling
    formula, e.g. mBERT/XLM-R: p_i ∝ n_i^α): per group, its corpus
    share, the temperature-flattened sampling probability, and the
    per-ROW weight (prob_i / n_i — feed straight into
    ``weighted_sample``'s weight column to materialize the mixture).
    α=1 keeps natural proportions, α→0 approaches uniform over
    groups — the knob that stops high-resource groups from drowning
    the tail.

    Determinism: shares and probabilities divide exact integer counts
    only after the Σ n_i^α reduction, which sums ≤|groups| doubles in
    a groupBy — at most one double-sum whose order Spark doesn't pin,
    so the output is stable to ~1e-15 relative (document, don't
    hash-gate). Scale: one map-side-combinable count per group;
    |groups| rows everywhere after that.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows"))
    p = F.pow(F.col("n_rows").cast("double"), F.lit(float(alpha)))
    if quantize is not None:
        # hash-gated path: quantized n^alpha terms, exact decimal
        # Σ n_i^alpha (the one order-free double sum in the docstring
        # caveat), single double divisions at the end
        p = F.round(p, quantize).cast(f"decimal(28,{quantize})")
    powed = counts.withColumn("_p", p)
    tot = powed.agg(
        F.sum("_p").cast("double").alias("_tp"),
        F.sum("n_rows").alias("_tn"),
    )
    pd_ = F.col("_p").cast("double")
    return powed.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_rows",
        (F.col("n_rows") / F.col("_tn")).alias("natural_share"),
        (pd_ / F.col("_tp")).alias("sample_prob"),
        ((pd_ / F.col("_tp")) / F.col("n_rows")).alias("row_weight"),
    )


def leakage_safe_split(
    df: DataFrame,
    dup_pairs: DataFrame,
    key_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
    train: float = 0.9,
    val: float = 0.05,
) -> DataFrame:
    """Train/val/test split with NEAR-DUP LEAKAGE PREVENTION: every
    member of a duplicate cluster lands in the SAME split, because
    the content-addressed draw runs on the CLUSTER id (its min
    member), not the document id. A plain per-document split leaks a
    near-copy of a test document into train with probability
    1-Σfrac² per cluster — exactly the eval contamination near-dup
    detection exists to prevent, thrown away at the last step.

    ``dup_pairs`` is any pair list from the dedup family (exact
    Jaccard, MinHash-verified, SimHash, prefix-filter); the
    transitive closure (``clustering.dup_clusters``) groups them.
    Singletons keep their own key as the cluster id, so for a
    pair-free corpus this degrades to exactly ``split_assign``.
    Output: input columns + ``split_group`` (the id the draw used) +
    ``split``.

    Scale: one CC run over the pair graph (pair-volume, not corpus),
    one broadcast-or-shuffle left join of the corpus against the
    cluster labels (clustered docs are a small fraction), then the
    same codegen'd md5 draw as ``split_assign``.
    """
    from .clustering import connected_components

    cc = connected_components(dup_pairs, pair_a, pair_b).select(
        F.col("node").alias(key_col), F.col("component").alias("_grp")
    )
    joined = df.join(cc, key_col, "left").withColumn(
        "split_group", F.coalesce(F.col("_grp"), F.col(key_col))
    )
    return split_assign(
        joined.drop("_grp"), key_col="split_group", train=train, val=val
    )


def curriculum_manifest(
    df: DataFrame,
    key_col: str = "doc_id",
    easy_max: int = 100,
    medium_max: int = 400,
) -> DataFrame:
    """Curriculum ordering manifest: stage documents easy -> hard and
    pin the exact training order per stage — the step between "filtered
    corpus" and "dataloader" when training uses a curriculum (Bengio et
    al. 2009; length-based staging is the standard model-free
    difficulty proxy).

    Stages (declared bands, NOT quantiles — quantile stages need a
    global sort/percentile pass; fixed bands assign map-side):
      0 = quality_flag 'low' (held out of the curriculum),
      1 = easy  (n_tokens <  easy_max),
      2 = medium(easy_max <= n_tokens <= medium_max),
      3 = hard  (n_tokens >  medium_max).

    Within a stage the training order is the content-addressed shuffle
    ``order by (h60, key)`` where h60 is the 60-bit md5 prefix of the
    key — stable across runs, cluster sizes and partitionings (the
    split_assign property). The manifest pins the PERMUTATION, not
    just membership: order_checksum = sum(rank * (h60 mod 1000003))
    changes if any doc moves position. Exact integer sum in
    decimal(38,0) (rank * residue < 2^63 per term), emitted as a
    digit string so no engine ever casts it to a double.

    Scale: stage assignment and hashing are codegen projections; the
    only shuffle is one row_number window per stage (partition count =
    4, each internally sorted — for corpora where a per-stage sort is
    too hot, the documented swap is the two-level (stage, shard) order
    used by ``pack_documents``: sort within content-addressed shards,
    concatenate shards in index order; the checksum definition is
    unchanged because rank is still well-defined).
    """
    h60 = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    staged = df.select(
        F.col(key_col),
        F.col("n_tokens"),
        h60.alias("_h"),
        F.when(F.col("quality_flag") == "low", 0)
        .when(F.col("n_tokens") < easy_max, 1)
        .when(F.col("n_tokens") <= medium_max, 2)
        .otherwise(3)
        .alias("stage"),
    )
    w = W.partitionBy("stage").orderBy("_h", key_col)
    ranked = staged.withColumn("rank", F.row_number().over(w))
    # narrow operand types so the product stays inside decimal range:
    # rank < 10^19, residue < 10^7 -> term decimal(26,0), sum (38,0)
    term = (
        F.col("rank").cast("decimal(19,0)")
        * (F.col("_h") % F.lit(1000003)).cast("decimal(7,0)")
    )
    first_key = F.min(F.struct("rank", key_col))[key_col]
    last_key = F.max(F.struct("rank", key_col))[key_col]
    return ranked.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        first_key.alias("first_doc_id"),
        last_key.alias("last_doc_id"),
        F.sum(term).cast("decimal(38,0)").cast("string").alias(
            "order_checksum"
        ),
    )
