"""Text-analysis operators over a document corpus (BASELINE.json
north_star: token counting, quality scoring, language ID, document
fingerprinting) — all native Column expressions; language ID's profile
scoring and the shingle/trigram builders use JVM-side higher-order
functions (interpreted, not codegen'd — acceptable for per-row arrays
of hundreds of elements; rewrite as explode + groupBy aggregation if a
corpus ever makes them the hot path, per the minhash precedent).

Design for 100 TB: every function here is a narrow projection — no
shuffle, no UDF, fully pipelined inside whole-stage codegen; they
compose with any downstream groupBy/join without extra exchanges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text (empty string → [])."""
    return F.when(F.length(F.trim(text)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Stopword hits WITH multiplicity, as Σ_w (|toks| − |toks \\ w|).

    ``array_remove`` is whole-stage-codegen'd; the ``F.filter`` HOF
    lambda this replaces evaluates interpreted (CodegenFallback) — the
    10-100× per-row trap on the hot document path. |stopwords| passes
    over the array in generated code beat one interpreted pass.
    """
    toks = tokens(text)
    n = F.size(toks)
    return sum(
        (n - F.size(F.array_remove(toks, w)) for w in stopwords),
        F.lit(0),
    )


def shingle_array(text: Column, width: int) -> Column:
    """All w-token shingles of a document (WITH multiplicity; callers
    wanting the distinct set wrap in array_distinct). The single
    source of the sequence/greatest/slice construction shared by
    dedup.shingles and trigram_repetition."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - width + 1, F.lit(1)))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, width), " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of case/whitespace-
    normalized text. Exact-dedup key at any scale (128-bit, collision
    odds negligible); cheaper to shuffle than the text itself."""
    return F.md5(F.lower(F.trim(text)))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics (token counting north-star op).

    Ratios over n_tokens are NULL for empty documents (``try_divide``):
    under ANSI mode a plain ``/ 0`` would ABORT the job, and the DuckDB
    oracles yield NULL for the same rows."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_uniq_tokens": distinct_token_count(t),
            "n_stopwords": stopword_count(t),
            # total token chars / token count; single double division
            "avg_token_len": F.try_divide(
                F.length(F.regexp_replace(t, r"\s+", "")).cast("double"),
                token_count(t),
            ),
        }
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring heuristic: length band + stopword ratio +
    lexical diversity, as one codegen'd expression.

    The score components mirror published pretraining-data filters
    (length, stopword fraction, repetition) without any model call.
    """
    d = with_token_stats(df, text_col)
    stop_ratio = F.try_divide(F.col("n_stopwords").cast("double"), F.col("n_tokens"))
    diversity = F.try_divide(F.col("n_uniq_tokens").cast("double"), F.col("n_tokens"))
    good_len = (F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 1000)
    return d.withColumns(
        {
            "stopword_ratio": stop_ratio,
            "lexical_diversity": diversity,
            "quality_flag": F.when(good_len & (diversity > 0.2), "good").otherwise(
                "low"
            ),
        }
    )


def with_gopher_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style composite rule flags (published pretraining-data
    heuristics: word-count band, mean-word-length band, minimum
    stopword evidence, lexical-diversity floor), one boolean column per
    rule plus the conjunction.

    Each rule is an independent codegen'd predicate so downstream
    queries can report per-rule failure rates, not just the pass set.
    Empty documents fail every rule (NULL-safe: the mean-length
    division is ``try_divide`` and the comparisons coalesce to false).
    """
    d = with_token_stats(df, text_col)
    diversity = F.try_divide(F.col("n_uniq_tokens").cast("double"), F.col("n_tokens"))
    rules = {
        "r_word_count": (F.col("n_tokens") >= 50) & (F.col("n_tokens") <= 100000),
        "r_word_len": (F.col("avg_token_len") >= 3.0)
        & (F.col("avg_token_len") <= 10.0),
        "r_stopwords": F.col("n_stopwords") >= 2,
        "r_diversity": diversity > 0.2,
    }
    safe = {k: F.coalesce(v, F.lit(False)) for k, v in rules.items()}
    out = d.withColumns(safe)
    passed = None
    for k in safe:
        passed = F.col(k) if passed is None else (passed & F.col(k))
    return out.withColumn("r_pass", passed)


def boilerplate_stats(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    width: int = 2,
    min_docs: int = 20,
) -> DataFrame:
    """Corpus-level boilerplate detection: a w-gram is boilerplate when
    it appears in ≥ ``min_docs`` distinct documents; each document is
    scored by the fraction of its distinct w-grams that are boilerplate
    (the standard template/navigation-chrome removal signal).

    Scale: one explode + shuffle on the shingle to count document
    frequency (distinct-per-doc shingles, so the count IS the doc
    frequency — no countDistinct), one join back on the shingle, one
    re-agg on the doc key. The boilerplate set is by construction the
    heavy-hitter tail (≤ |corpus|·|shingles per doc| / min_docs
    entries); at 100 TB raise ``min_docs`` proportionally or feed the
    shingle counts through ``skew.heavy_hitters`` so the set stays
    broadcastable, and pre-aggregate counts per partition (map-side
    combine already does this for the groupBy).
    """
    sh = df.select(
        F.col(key_col),
        F.explode(F.array_distinct(shingle_array(F.col(text_col), width))).alias(
            "shingle"
        ),
    )
    boiler = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_docs)
        .select("shingle", F.lit(1).alias("is_boiler"))
    )
    marked = sh.join(boiler, "shingle", "left")
    return (
        marked.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0))).alias("n_boiler"),
        )
        .withColumn(
            "boiler_frac",
            F.col("n_boiler").cast("double") / F.col("n_shingles"),
        )
    )


# --- language identification (n-gram profile heuristic) -------------------

# Tiny character-trigram profiles for a few languages. Public-knowledge
# heuristic (Cavnar-Trenkle n-gram ranking, simplified): score = number
# of profile trigrams present in the document, normalized.
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", "ion", "ent", " th", "he ", "er ", " of", "of "),
    "es": ("de ", " de", "la ", "que", " la", "el ", "en ", "os ", " qu", "ión"),
    "fr": (" de", "de ", "le ", " le", "es ", "la ", "et ", " et", "ent", "que"),
    "de": ("en ", "er ", "ch ", "der", " de", "ein", "ung", "die", " di", "sch"),
}

# zh is SCRIPT-detected, not trigram-profiled: Chinese text is hanzi,
# which no latin trigram (or pinyin romanization) ever matches — the
# signal is the CJK-ideograph count itself.
CJK_RE = r"[\x{4e00}-\x{9fff}]"


def language_scores(text: Column) -> Column:
    """Array of (lang, hits): trigram-profile hit counts for the latin
    profiles plus the CJK-ideograph count for zh (JVM-side)."""
    low = F.lower(text)
    entries = []
    for lang, grams in _LANG_PROFILES.items():
        hits = sum(
            (F.when(low.contains(g), 1).otherwise(0) for g in grams),
            F.lit(0),
        )
        entries.append(F.struct(F.lit(lang).alias("lang"), hits.alias("hits")))
    entries.append(
        F.struct(
            F.lit("zh").alias("lang"),
            F.coalesce(F.regexp_count(text, F.lit(CJK_RE)), F.lit(0))
            .cast("int")
            .alias("hits"),
        )
    )
    return F.array(*entries)


def predicted_language(text: Column) -> Column:
    """argmax over the profile scores (ties → lexicographically LAST
    language code — array_max on (hits, lang) structs; deterministic).
    A text matching NO profile (null/empty/unknown script) is 'und',
    not an accidental argmax winner."""
    scores = language_scores(text)
    best = F.array_max(
        F.transform(
            scores,
            lambda s: F.struct(s["hits"].alias("hits"), s["lang"].alias("lang")),
        )
    )
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("predicted_lang", predicted_language(F.col(text_col)))


def trigram_repetition(text: Column) -> Column:
    """Within-document repetition score: 1 − distinct/total token
    trigrams (0 = no repetition, → 1 for highly repetitive boilerplate
    — the standard pretraining repetition filter signal). NULL for
    docs shorter than 3 tokens (no trigram exists)."""
    tris = shingle_array(text, 3)
    return F.when(
        F.size(tokens(text)) >= 3,
        1.0 - F.try_divide(F.size(F.array_distinct(tris)), F.size(tris)),
    )


# public patterns for the PII scan — deliberately simple and
# cross-engine (RE2/Java compatible): the operator's job is the
# Spark-side plumbing; production swaps in its own pattern pack.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def with_pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII pattern hit counts + a redaction-needed flag —
    one codegen'd projection per pattern (regexp_count), no UDF."""
    t = F.col(text_col)
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}", F.coalesce(F.regexp_count(t, F.lit(pat)), F.lit(0))
        )
    flag = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}") > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("pii_flag", flag)


# GPT-2-style pre-tokenizer classes: letter runs, single digits,
# punctuation runs-of-one. Deliberately restricted to constructs that
# behave identically in Java regex (Spark) and RE2 (DuckDB) so the
# SAME pattern string drives both engines.
BPE_WORD_RE = "[A-Za-z]+"
BPE_DIGIT_RE = "[0-9]"
BPE_OTHER_RE = r"[^A-Za-z0-9\s]"
BPE_TOKEN_RE = f"{BPE_WORD_RE}|{BPE_DIGIT_RE}|{BPE_OTHER_RE}"


def bpe_tokens(text: Column) -> Column:
    """BPE-ish regex pre-tokenization (north_star: token counting =
    whitespace + a BPE-ish regex). Splits letter runs, single digits,
    and punctuation — the shape a byte-pair tokenizer's pre-tokenizer
    produces, so ``size(bpe_tokens(..))`` tracks real token budgets
    far better than whitespace counts on code/punctuation-heavy text.
    Pure codegen ``regexp_extract_all`` — no UDF, no shuffle."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)


def with_bpe_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc token-budget profile: whitespace tokens vs BPE-ish
    tokens, split by class. ``bpe_per_100_ws`` (integer-scaled ratio)
    is the fertility signal — how many model tokens a whitespace
    'word' costs."""
    t = F.col(text_col)
    n_ws = token_count(t)
    n_word = F.size(F.regexp_extract_all(t, F.lit(BPE_WORD_RE), 0))
    n_digit = F.size(F.regexp_extract_all(t, F.lit(BPE_DIGIT_RE), 0))
    n_other = F.size(F.regexp_extract_all(t, F.lit(BPE_OTHER_RE), 0))
    return df.select(
        "*",
        n_ws.cast("long").alias("n_ws_tokens"),
        (n_word + n_digit + n_other).cast("long").alias("n_bpe_tokens"),
        n_word.cast("long").alias("n_word_tokens"),
        n_digit.cast("long").alias("n_digit_tokens"),
        n_other.cast("long").alias("n_other_tokens"),
        F.when(
            n_ws > 0,
            ((n_word + n_digit + n_other) * 100).cast("long") / n_ws,
        ).alias("bpe_per_100_ws"),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_freq: int = 2,
) -> list[tuple[str, str, int]]:
    """Byte-pair-encoding merge training (Sennrich et al. 2016): learn
    ``n_merges`` merge rules from the corpus — the tokenizer-induction
    step upstream of every ``docs_bpe_token_stats``-style budget
    query. Returns [(left, right, pair_freq), ...] in merge order.

    Distributed shape: the corpus collapses ONCE to the distinct-word
    frequency table (the only corpus-sized shuffle; at 100 TB the
    vocab table is ~1e8 rows — executor-sized, not driver-sized).
    Each round then runs on the vocab table only:

    1. adjacent symbol pairs via ``zip_with(slice, slice)`` + explode,
       weighted by word freq, groupBy-sum, top-1 (freq desc, pair asc
       — the deterministic tie-break a re-run must reproduce);
    2. ONE row (the winning pair) returns to the driver;
    3. the merge applies to the symbol arrays in an Arrow-batched
       ``mapInPandas`` (left-to-right greedy, standard BPE overlap
       rule) — a string-list rewrite with no vectorizable built-in,
       the sanctioned Pandas-path case;
    4. ``localCheckpoint`` each round pins the table and stops
       iterative plan growth (the ``kmeans_fit`` lesson).

    The HOF pair-builder is interpreted (CodegenFallback) but runs on
    the VOCAB table, not the corpus — the volume regime where that's
    irrelevant (cf. dot_unrolled, which exists because pair-volume
    HOFs are not).
    """
    import pandas as pd

    words = (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # split(w, "(?!^)") keeps a trailing "" (the lookahead also
    # matches the end-of-string position and Spark's default limit is
    # -1) — strip it or it becomes a phantom symbol in pair counts
    state = words.select(
        F.array_remove(F.split(F.col("w"), "(?!^)"), "").alias("syms"),
        "freq",
    ).localCheckpoint()

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        n = F.size("syms")
        pairs = state.filter(n >= 2).select(
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, n - 1),
                    F.slice("syms", 2, n - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
            "freq",
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("f"))
            .orderBy(F.desc("f"), F.asc("p.l"), F.asc("p.r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["f"] < min_freq:
            break
        left, right, f = top[0]["p"]["l"], top[0]["p"]["r"], int(top[0]["f"])
        merges.append((left, right, f))

        def apply_merge(batches, _l=left, _r=right):
            for pdf in batches:
                out = []
                for syms in pdf["syms"]:
                    res, i, m = [], 0, len(syms)
                    while i < m:
                        if i + 1 < m and syms[i] == _l and syms[i + 1] == _r:
                            res.append(_l + _r)
                            i += 2
                        else:
                            res.append(syms[i])
                            i += 1
                    out.append(res)
                yield pd.DataFrame({"syms": out, "freq": pdf["freq"]})

        state = state.mapInPandas(
            apply_merge, "syms array<string>, freq long"
        ).localCheckpoint()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    max_word_len: int = 512,
) -> DataFrame:
    """Apply learned BPE merges (``bpe_train`` output) to tokenize:
    per whitespace word, start from characters and replay merges in
    RANK ORDER (each rule greedily left-to-right — the exact inverse
    of training, so encoding a training word reproduces its final
    training segmentation). Adds ``out_col`` (array<string>).

    The merge table broadcasts as a rank dict (tokenizers are
    KB-to-MB at any corpus size); the rewrite is the same
    Arrow-batched Pandas path as the training apply — per word,
    repeatedly merge the best-ranked adjacent pair (the standard
    priority-queue-free formulation: O(merges·len) worst case,
    fine at word length).

    Scale: embarrassingly parallel single scan, no shuffle; encoding
    throughput is the Python-worker pool, the documented trade for a
    rule system no built-in expresses.

    Contract (ENFORCED, VERDICT r04 item 5): the greedy replay is
    O(n_merges × len²) per WORD — linear over a corpus of natural
    words, quadratic-pathological on whitespace-free blobs (a 1 MB
    base64 string is one "word"). Words longer than ``max_word_len``
    raise rather than silently burning executor CPU; callers with
    legitimate mega-tokens should pre-split or truncate upstream.
    """
    import pandas as pd

    ranks = {(l, r): i for i, (l, r, *_) in enumerate(merges)}
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(ranks)

    def encode(batches):
        rk = bc.value

        def word_to_tokens(w: str) -> list[str]:
            if len(w) > max_word_len:
                raise ValueError(
                    f"bpe_encode: {len(w)}-char word exceeds "
                    f"max_word_len={max_word_len} — the greedy merge "
                    "replay is quadratic per word; split or truncate "
                    "whitespace-free blobs upstream"
                )
            syms = list(w)
            while len(syms) >= 2:
                best, best_i = None, -1
                for i in range(len(syms) - 1):
                    r = rk.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best, best_i = r, i
                if best is None:
                    break
                l, r_ = syms[best_i], syms[best_i + 1]
                # merge ALL occurrences of the winning pair, greedy L->R
                res, i, m = [], 0, len(syms)
                while i < m:
                    if i + 1 < m and syms[i] == l and syms[i + 1] == r_:
                        res.append(l + r_)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            return syms

        for pdf in batches:
            toks = [
                [t for w in (txt or "").split() for t in word_to_tokens(w)]
                for txt in pdf["_txt"]
            ]
            out = pdf.drop(columns=["_txt"])
            out[out_col] = toks
            yield out

    import pyspark.sql.types as T

    schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )
    return df.withColumn("_txt", F.col(text_col)).mapInPandas(
        lambda it: encode(it), schema
    )


def vocab_overlap_sketch(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    lg_k: int = 12,
) -> DataFrame:
    """Pairwise vocabulary overlap between groups via HLL sketch
    algebra: one Datasketches HLL per group over its distinct tokens,
    then for each group pair the inclusion–exclusion estimates
    |A|, |B|, |A∪B| → |A∩B| and Jaccard — the corpus-composition
    diagnostic (which sources share a vocabulary, which crawl slice
    duplicates which) that would otherwise need a distinct-token
    self-join per pair. Emits (group_a < group_b, est_a, est_b,
    est_union, est_intersection, jaccard_est).

    Scale: tokens shuffle once into |groups| KB-sized sketches
    (map-side combinable `hll_sketch_agg`); the pair join runs on
    |groups|² sketch rows — thousands of pairs of KB blobs, never
    token data. Sketch error is ~1.04/sqrt(2^lg_k) per estimate
    (~1.6% at lg_k=12); the intersection, as a difference of
    estimates, inherits ~3× that relative error on small overlaps —
    use exact joins below ~5% Jaccard, sketches above (the
    documented trade of every inclusion–exclusion sketch).
    """
    tok = df.select(
        F.col(group_col).alias("g"),
        F.explode(tokens(F.col(text_col))).alias("tk"),
    )
    sk = tok.groupBy("g").agg(F.hll_sketch_agg("tk", F.lit(lg_k)).alias("sk"))
    a = sk.select(
        F.col("g").alias("group_a"),
        F.col("sk").alias("_ska"),
        F.hll_sketch_estimate("sk").alias("est_a"),
    )
    b = sk.select(
        F.col("g").alias("group_b"),
        F.col("sk").alias("_skb"),
        F.hll_sketch_estimate("sk").alias("est_b"),
    )
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    u = F.hll_sketch_estimate(F.hll_union("_ska", "_skb"))
    return pairs.select(
        "group_a",
        "group_b",
        "est_a",
        "est_b",
        u.alias("est_union"),
        (F.col("est_a") + F.col("est_b") - u).alias("est_intersection"),
        F.greatest(
            (F.col("est_a") + F.col("est_b") - u) / u, F.lit(0.0)
        ).alias("jaccard_est"),
    )


def unigram_nll(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    unigram LM (the CCNet perplexity-filter signal). Output:
    ``(key, n_tokens, avg_nll)``; token-less documents are omitted (no
    defined score).

    Cross-engine determinism (the ``docs_unigram_nll`` oracle replays
    this exactly): per-token NLL is quantized to DECIMAL(18,6) BEFORE
    the per-doc sum, so the order-free decimal sum is exact and only
    the final mean divides in double.

    Scale: the vocab is a map-side-combinable count; the token→NLL
    join is broadcast-able (a unigram vocab is millions of rows, not
    fact-sized); one shuffle on the key for the per-doc agg.
    """
    tok = df.select(key_col, F.explode(tokens(F.col(text_col))).alias("tk"))
    vocab = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    nll = vocab.join(F.broadcast(tot)).select(
        "tk",
        F.round(F.log(F.col("total").cast("double") / F.col("cnt")), 6)
        .cast("decimal(18,6)")
        .alias("nll_q"),
    )
    return (
        tok.join(nll, "tk")
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("nll_q").cast("double") / F.count(F.lit(1))).alias("avg_nll"),
        )
    )


def taxonomy_classify(
    df: DataFrame,
    rules: list[tuple[str, tuple[str, ...]]],
    text_col: str = "text",
) -> DataFrame:
    """Rule-based topic routing (the keyword-taxonomy classifier a
    training-mix pipeline runs before domain weighting — the
    coarse-grained cousin of model-based routers, kept deterministic
    so mixture weights are reproducible): each topic owns a keyword
    set; a document scores one point per matching token and routes to
    the highest-scoring topic, earlier rules winning ties (a declared
    priority order, not an arbitrary one).

    Adds a ``topic`` column. Scores are native higher-order-function
    expressions (``size(filter(split(...)))``) — whole-stage codegen,
    zero UDF, one corpus scan; the CASE argmax keeps the route
    decision row-local.
    """
    if not rules:
        raise ValueError("rules must not be empty")
    for topic, kws in rules:
        if not kws:
            raise ValueError(f"rule {topic!r} has an empty keyword set")
    toks = F.split(F.col(text_col), " ")
    def _member(kws):
        # OR chain instead of isin (lambda variables don't support the
        # In expression inside higher-order functions); the factory
        # returns a ONE-parameter lambda — F.filter dispatches on the
        # lambda's arity, so a bound default would flip it to the
        # (element, index) signature
        def pred(w):
            cond = w == F.lit(kws[0])
            for k in kws[1:]:
                cond = cond | (w == F.lit(k))
            return cond

        return pred

    scores = [F.size(F.filter(toks, _member(kws))) for _, kws in rules]
    # CASE chain: rule i fires when its score >= every LATER score —
    # the first index achieving the running max, i.e. argmax with
    # earliest-rule tie priority (replayed verbatim in the oracle)
    route = None
    for i in range(len(rules) - 1):
        cond = None
        for j in range(i + 1, len(rules)):
            c = scores[i] >= scores[j]
            cond = c if cond is None else (cond & c)
        route = (
            F.when(cond, F.lit(rules[i][0]))
            if route is None
            else route.when(cond, F.lit(rules[i][0]))
        )
    route = (
        route.otherwise(F.lit(rules[-1][0]))
        if route is not None
        else F.lit(rules[-1][0])
    )
    return df.withColumn("topic", route)


def with_pii_redaction(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redacted-text column: every PII pattern hit replaced with its
    typed placeholder (``<EMAIL>`` etc.) — the WRITE side of the
    scan/redact pair, one chained codegen'd ``regexp_replace`` per
    pattern, no UDF. Replacement order is the declared pattern-pack
    order (a placeholder contains no digits or '@', so later patterns
    cannot re-match inside an earlier redaction); both engines apply
    leftmost non-overlapping global replacement."""
    out = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, F.lit(pat), F.lit(f"<{name.upper()}>"))
    return df.withColumn("redacted", out)
