"""Training-shard construction: stratified sampling + sequence packing.

Beyond-reference capability (SURVEY §7 Phase 6): after dedup/quality
filtering, a pretraining pipeline (a) draws per-stratum samples for
mixture control and (b) packs documents into fixed-token-budget shards
for sequence batching. Both are deterministic (hash-ordered, never
rand()) so reruns and the DuckDB oracle agree bit-for-bit.

Scale shape:
- stratified_sample: ONE shuffle keyed by the stratum column; window
  rank + count over each stratum. Strata are few (languages, sources)
  but rows within are many — rank/count are sort-based within the
  stratum partition, so a hot stratum is bounded by sort, not memory.
  For truly-massive strata swap the exact rank for a threshold on the
  hash itself (keep h < rate * 2^60): zero window, pure filter — the
  exact-rank form here is the one the oracle can mirror row-for-row.
- sequence_packing: a GLOBAL ordered cumsum would serialize on one
  partition; instead docs are first routed to `n_bins` hash bins and
  packed within bins (window per bin). Bins pack in parallel; shard ids
  are (bin, local_shard). At 100 TB raise n_bins with the cluster —
  packing quality is unaffected (budget waste stays < one doc per
  shard boundary, per bin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from databus_spark.functions.hashes import portable_hash64, portable_hash64_sql
from databus_spark.operators.text import TOKENS_SQL, tokens_col

SAMPLE_SEED = "strat"
PACK_SEED = "pack"


def stratified_sample(
    docs: DataFrame,
    strata_col: str = "lang",
    rate: float = 0.2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact per-stratum rate sample: the ceil(rate·n) lowest-hash rows
    of each stratum. Deterministic — same rows every run, every engine."""
    h = portable_hash64(F.col(id_col).cast("string"), F.lit(SAMPLE_SEED))
    w = Window.partitionBy(strata_col).orderBy(h, id_col)
    wn = Window.partitionBy(strata_col)
    ranked = docs.select(
        id_col,
        strata_col,
        F.row_number().over(w).alias("sample_rank"),
        F.count(F.lit(1)).over(wn).alias("stratum_n"),
    )
    return ranked.where(
        F.col("sample_rank") <= F.ceil(F.lit(rate) * F.col("stratum_n"))
    )


def stratified_sample_sql(
    strata_col: str = "lang", rate: float = 0.2, id_col: str = "doc_id"
) -> str:
    h = portable_hash64_sql(id_col, f"'{SAMPLE_SEED}'")
    return f"""
        SELECT {id_col}, {strata_col}, sample_rank, stratum_n
        FROM (
            SELECT {id_col}, {strata_col},
                   row_number() OVER (PARTITION BY {strata_col}
                                      ORDER BY {h}, {id_col}) AS sample_rank,
                   count(*) OVER (PARTITION BY {strata_col}) AS stratum_n
            FROM documents
        )
        WHERE sample_rank <= ceil({rate} * stratum_n)
    """


WSAMPLE_SEED = "aes"
# hash range is [0, 2^60): u = (h + 0.5) / 2^60 is strictly inside (0,1)
# at BOTH ends. The first cut, (h+1)/(2^60+1), rounded its denominator to
# exactly 2^60 (2^60+1 is not double-representable), so the maximal hash
# mapped to u = 1.0 exactly and ln(u)/w = 0 ranked that key first
# regardless of weight (r13 ADVICE) — a 2^-60 per-row event, but it
# contradicted the A-ES inclusion-probability premise. 0.5/2^60 and
# 2^60 are both exact doubles, so u is exact and identical in both
# engines by construction.
_WSAMPLE_U_DEN = float(1 << 60)
_WSAMPLE_U_OFF = 0.5


def weighted_sample(
    docs: DataFrame,
    n: int = 100,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: str = WSAMPLE_SEED,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, A-ES): key_i = u_i^(1/w_i); the n largest keys are a weighted
    sample without replacement — inclusion probability proportional to
    weight, sequentially over the n draws. The training-data use is
    token-budget-proportional corpus draws (weight = document length):
    sampling docs uniformly under-represents long documents' tokens.

    Engine shape: computed in log space (lkey = ln(u)/w, monotone in
    the key), u derived from the seeded portable hash so both engines
    generate the SAME randomness; selection = top-n by (lkey DESC, id)
    via orderBy+limit, which Spark executes as TakeOrderedAndProject —
    a per-partition top-n then a driver merge of n*partitions rows,
    never a global sort shuffle. lkey is rounded to 9 dp BEFORE
    selection so both engines rank identical doubles (libm ln may
    differ in the last ulp between the JVM intrinsic and DuckDB's
    std::log; at 9 dp the per-row flip probability is ~1e-7 — pinned
    empirically by the oracle at three SFs). Zero-weight rows are
    excluded (their key is 0 = never sampled, and ln/w is undefined).
    """
    w = F.col(weight_col).cast("double")
    u = (
        portable_hash64(F.col(id_col).cast("string"), F.lit(seed))
        + F.lit(_WSAMPLE_U_OFF)
    ) / F.lit(_WSAMPLE_U_DEN)
    lkey = F.round(F.log(u) / w, 9)
    return (
        docs.where(w > 0)
        .select(id_col, "lang", weight_col, lkey.alias("lkey"))
        .orderBy(F.desc("lkey"), F.col(id_col))
        .limit(n)
    )


def weighted_sample_sql(
    n: int = 100,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: str = WSAMPLE_SEED,
) -> str:
    h = portable_hash64_sql(f"CAST({id_col} AS VARCHAR)", f"'{seed}'")
    return f"""
        SELECT {id_col}, lang, {weight_col},
               round(ln(({h} + {_WSAMPLE_U_OFF!r}) / {_WSAMPLE_U_DEN!r}) /
                     CAST({weight_col} AS DOUBLE), 9) AS lkey
        FROM documents
        WHERE CAST({weight_col} AS DOUBLE) > 0
        ORDER BY lkey DESC, {id_col}
        LIMIT {n}
    """


def sequence_packing(
    docs: DataFrame,
    n_tokens: Column,
    budget: int = 512,
    n_bins: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk packing with document boundaries: docs stream in
    hash order through each bin; a doc's shard is where its first token
    lands (exclusive-prefix-sum // budget). A shard overruns the budget
    by at most the last doc's tail — the standard packing approximation,
    fully expressible as one window sum (no iterative bin-packing)."""
    h = portable_hash64(F.col(id_col).cast("string"), F.lit(PACK_SEED))
    binned = docs.select(
        id_col, n_tokens.alias("n_tokens"), (h % n_bins).alias("bin"), h.alias("_h")
    )
    w = Window.partitionBy("bin").orderBy("_h", id_col)
    prefix = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_prefix")
    packed = binned.select(id_col, "n_tokens", "bin", prefix)
    return packed.select(
        id_col,
        "bin",
        F.floor(F.col("_prefix") / budget).cast("long").alias("shard_in_bin"),
        (F.col("_prefix") % budget).alias("offset_tokens"),
        "n_tokens",
    )


def sequence_packing_sql(
    n_tokens_sql: str, budget: int = 512, n_bins: int = 8, id_col: str = "doc_id"
) -> str:
    h = portable_hash64_sql(id_col, f"'{PACK_SEED}'")
    return f"""
        SELECT {id_col}, bin,
               CAST(floor(prefix / {budget}) AS BIGINT) AS shard_in_bin,
               CAST(prefix % {budget} AS BIGINT) AS offset_tokens,
               n_tokens
        FROM (
            SELECT {id_col}, bin, n_tokens,
                   CAST(sum(n_tokens) OVER (PARTITION BY bin ORDER BY h, {id_col})
                       AS BIGINT) - n_tokens AS prefix
            FROM (
                SELECT {id_col}, {n_tokens_sql} AS n_tokens,
                       {h} % {n_bins} AS bin, {h} AS h
                FROM documents
            )
        )
    """


MIX_SEED = "mix"
MIX_PPM = 1_000_000


def mixture_temperature_sample(
    docs: DataFrame,
    group_col: str = "lang",
    base_rate: float = 0.1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted mixture sampling — the standard LLM data-mixing
    op: small groups (languages/sources) are UPsampled relative to their
    share so the mixture flattens toward uniform. Group g with count c_g
    keeps rate min(1, base_rate * sqrt(c_max / c_g)) — the alpha=0.5
    temperature rebalancing (multilingual-pretraining convention), with
    no cross-group normalization sum so every arithmetic step (integer
    ratio, IEEE sqrt, one multiply, floor to ppm) is correctly rounded
    and bit-identical in DuckDB.

    Scale shape: one map-side-combinable count per group (groups are
    few), group rates broadcast back, membership is a pure hash-threshold
    filter (h % 1e6 < rate_ppm) — no window, no per-row state; the big
    side never shuffles.
    """
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_group"))
    w_all = Window.partitionBy()  # counts is tiny (one row per group)
    rates = counts.select(
        group_col,
        "n_group",
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(base_rate)
                * F.sqrt(F.max("n_group").over(w_all) / F.col("n_group")),
            )
            * MIX_PPM
        )
        .cast("long")
        .alias("rate_ppm"),
    )
    h = F.pmod(portable_hash64(F.col(id_col).cast("string"), F.lit(MIX_SEED)), F.lit(MIX_PPM))
    return (
        docs.select(id_col, group_col)
        .join(F.broadcast(rates), group_col)
        .where(h < F.col("rate_ppm"))
        .select(id_col, group_col, "n_group", "rate_ppm")
    )


def mixture_temperature_sample_sql(
    group_col: str = "lang", base_rate: float = 0.1, id_col: str = "doc_id"
) -> str:
    h = portable_hash64_sql(id_col, f"'{MIX_SEED}'")
    return f"""
        SELECT {id_col}, {group_col}, n_group, rate_ppm
        FROM documents
        JOIN (
            SELECT {group_col}, n_group,
                   CAST(floor(least(1.0,
                       {base_rate} * sqrt(CAST(max(n_group) OVER () AS DOUBLE)
                                          / n_group)) * {MIX_PPM}) AS BIGINT)
                       AS rate_ppm
            FROM (SELECT {group_col}, count(*) AS n_group
                  FROM documents GROUP BY 1)
        ) USING ({group_col})
        WHERE {h} % {MIX_PPM} < rate_ppm
    """


def chunk_documents(
    docs: DataFrame, max_tokens: int = 64, overlap: int = 8, text_col: str = "text"
) -> DataFrame:
    """Sliding-window document chunking for context-length-bounded training.

    Each doc becomes 1 + ceil(max(0, n_tokens - max_tokens)/stride)
    chunks of <= max_tokens whitespace tokens, consecutive chunks
    sharing `overlap` tokens (stride = max_tokens - overlap). Pure
    per-row plan — transform over a chunk-index sequence, then one
    explode; no shuffle, no UDF, linear in corpus bytes. The step
    between curation and sequence_packing in a pretraining pipeline.
    """
    from databus_spark.plans.hints import widen_scan

    assert 0 <= overlap < max_tokens
    docs = widen_scan(docs)  # tokenize + chunk transform are per-row CPU
    stride = max_tokens - overlap
    toks = tokens_col(text_col)
    n = F.size(toks)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - max_tokens, F.lit(0)) / F.lit(stride)
    ).cast("int")
    chunk = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, max_tokens)).alias(
                "chunk_text"
            ),
            F.least(n - i * stride, F.lit(max_tokens)).alias("n_chunk_tokens"),
        ),
    )
    return docs.select("doc_id", F.explode(chunk).alias("c")).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.n_chunk_tokens").cast("int").alias("n_chunk_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def chunk_documents_sql(
    from_sql: str, max_tokens: int = 64, overlap: int = 8
) -> str:
    stride = max_tokens - overlap
    return f"""
        SELECT doc_id,
               CAST(i AS INT) AS chunk_id,
               CAST(least(len(toks) - i*{stride}, {max_tokens}) AS INT) AS n_chunk_tokens,
               array_to_string(toks[i*{stride}+1 : i*{stride}+{max_tokens}], ' ') AS chunk_text
        FROM (
            SELECT doc_id, toks,
                   unnest(range(0, 1 + CAST(ceil(greatest(len(toks) - {max_tokens}, 0) / {stride}.0) AS INT))) AS i
            FROM (SELECT doc_id, {TOKENS_SQL.format(col='text')} AS toks FROM ({from_sql}))
        )
    """


QUOTA_SEED = "quota"


def per_group_quota(
    docs: DataFrame,
    group_col: str = "source",
    max_per_group: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Absolute per-group cap — the per-domain quota of crawl curation:
    at most max_per_group docs survive per group, chosen as the
    lowest-hash rows (deterministic, engine-reproducible; a fair random
    sample for any non-adversarial id distribution).

    Complements stratified_sample (a RATE) and mixture sampling (a
    rebalance): quotas bound the damage any single domain can do to the
    mixture regardless of its size. One shuffle on the group column;
    rank is sort-based within each group partition, so a hot group costs
    a sort, not memory.
    """
    h = portable_hash64(F.col(id_col).cast("string"), F.lit(QUOTA_SEED))
    w = Window.partitionBy(group_col).orderBy(h, id_col)
    return (
        docs.select(id_col, group_col, F.row_number().over(w).alias("quota_rank"))
        .where(F.col("quota_rank") <= max_per_group)
    )


def per_group_quota_sql(
    from_sql: str,
    group_col: str = "source",
    max_per_group: int = 50,
    id_col: str = "doc_id",
) -> str:
    h = portable_hash64_sql(id_col, f"'{QUOTA_SEED}'")
    return f"""
        SELECT {id_col}, {group_col}, quota_rank FROM (
            SELECT {id_col}, {group_col},
                   row_number() OVER (PARTITION BY {group_col}
                                      ORDER BY {h}, {id_col}) AS quota_rank
            FROM ({from_sql})
        ) WHERE quota_rank <= {max_per_group}
    """


# ---------------------------------------------------------------------------
# Salted two-phase grouped top-k (hot-group-safe best-of selection)
# ---------------------------------------------------------------------------
# per_group_quota and stratified_sample rank within a single window per
# group: correct, but a group holding 1% of a 100 TB corpus sorts ~1 TB
# on one reducer. When only the TOP-K per group survives (k << group),
# the standard fix is two-phase: phase 1 ranks within (group, salt) —
# bounding any single sort partition to |group| / n_salts — phase 2
# re-ranks the surviving k * n_salts finalists per group (tiny). Any row
# in the true global top-k is also in its salt slice's top-k, so the
# result is IDENTICAL to the one-window form (which is what the oracle
# runs) as long as the ordering is a total order — here (order DESC,
# id ASC) with unique ids.

TOPK_SALT_SEED = "topk"
N_TOPK_SALTS = 8


def grouped_topk(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    id_col: str = "doc_id",
    n_salts: int = N_TOPK_SALTS,
) -> DataFrame:
    """Top-k rows per group by (order_col DESC, id_col ASC), computed as
    a salted two-phase rank so no reducer ever sorts a whole hot group.
    Output: input columns + `topk_rank` (1-based within the group)."""
    salt = F.pmod(
        portable_hash64(F.col(id_col).cast("string"), F.lit(TOPK_SALT_SEED)),
        F.lit(n_salts),
    )
    w1 = Window.partitionBy(group_col, "_salt").orderBy(
        F.desc(order_col), F.asc(id_col)
    )
    finalists = (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_r1")
    )
    w2 = Window.partitionBy(group_col).orderBy(F.desc(order_col), F.asc(id_col))
    return (
        finalists.drop("_salt")
        .withColumn("topk_rank", F.row_number().over(w2))
        .where(F.col("topk_rank") <= k)
    )


def grouped_topk_sql(
    from_sql: str,
    cols: list[str],
    group_col: str,
    order_col: str,
    k: int,
    id_col: str = "doc_id",
) -> str:
    """Oracle: the plain single-window form — the two-phase plan must
    reproduce it exactly. `cols` = the input columns to carry through."""
    col_list = ", ".join(cols)
    return f"""
        SELECT {col_list}, CAST(rn AS INT) AS topk_rank FROM (
            SELECT {col_list}, row_number() OVER (
                       PARTITION BY {group_col}
                       ORDER BY {order_col} DESC, {id_col} ASC) AS rn
            FROM ({from_sql})
        ) t WHERE rn <= {k}
    """


# ---------------------------------------------------------------------------
# Deterministic, leakage-safe train/val/test split
# ---------------------------------------------------------------------------
# Splitting by row position (or Spark's randomSplit) is unstable under
# corpus growth and reshuffling, and puts byte-identical documents on
# both sides of the train/test fence. Hashing the CONTENT digest fixes
# both: the assignment of a document never changes as the corpus grows,
# and exact duplicates always land in the same split — the cheap
# train-test-leakage guard that should precede the expensive near-dup
# decontamination pass. Map-side pure expressions; zero shuffle.

SPLIT_SEED = "split"
SPLIT_PCT = (("train", 80), ("val", 90), ("test", 100))


def split_assign(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, split_bucket, split): hash-of-content percentile split.
    bucket = portable_hash(md5(text)) % 100; train < 80 <= val < 90 <= test."""
    h = portable_hash64(F.md5(F.col(text_col)), F.lit(SPLIT_SEED))
    bucket = F.pmod(h, F.lit(100))
    split = F.when(bucket < SPLIT_PCT[0][1], SPLIT_PCT[0][0]).when(
        bucket < SPLIT_PCT[1][1], SPLIT_PCT[1][0]
    ).otherwise(SPLIT_PCT[2][0])
    return docs.select(
        id_col, bucket.cast("int").alias("split_bucket"), split.alias("split")
    )


def split_assign_sql(from_sql: str, id_col: str = "doc_id") -> str:
    h = portable_hash64_sql("md5(text)", f"'{SPLIT_SEED}'")
    return f"""
        SELECT {id_col},
               CAST(({h}) % 100 AS INT) AS split_bucket,
               CASE WHEN ({h}) % 100 < {SPLIT_PCT[0][1]} THEN '{SPLIT_PCT[0][0]}'
                    WHEN ({h}) % 100 < {SPLIT_PCT[1][1]} THEN '{SPLIT_PCT[1][0]}'
                    ELSE '{SPLIT_PCT[2][0]}' END AS split
        FROM ({from_sql})
    """


# ---------------------------------------------------------------------------
# DSIR-style importance-weighted data selection (arXiv:2302.03169)
# ---------------------------------------------------------------------------
# Data Selection with Importance Resampling: score every raw document by
# how target-like its hashed n-gram feature distribution is, then keep
# the top-scoring slice. Restated integer-exact for cross-engine
# reproducibility: the paper's log-likelihood-ratio sum becomes a sum of
# smoothed likelihood RATIOS in micro-units (one bigint floor-division
# per feature — log replaced by the ratio keeps every step exact in
# both engines; ranking quality is the same monotone signal family, and
# the deterministic top-k replaces the paper's Gumbel resampling).
#
# Scale (100 TB): one token explode (map-side hash to DSIR_BUCKETS
# buckets), ONE partial-agg shuffle builds the whole feature table
# (DSIR_BUCKETS rows — counts for target and corpus in the same pass),
# weights broadcast back onto the token stream, one per-doc sum. No
# driver state; the feature table is O(buckets), never O(vocab).
# Overflow bound: the weight numerator (c_t+1)*(t_r+B)*1e6 is computed
# in DECIMAL(38,0) (DuckDB: HUGEINT) — 35 digits at 2.5e13 corpus
# tokens; the final weight fits BIGINT while the target is >= ~1e-9
# of the corpus.

DSIR_BUCKETS = 256
DSIR_SEED = "dsir"
DSIR_TARGET_LANG = "en"  # the fixture's "target domain sample"
DSIR_TOPK = 100


def _dsir_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, f): one row per FEATURE instance — the paper's
    hashed n-gram features are unigrams ++ bigrams (arXiv:2302.03169
    §2.3) — hashed to its bucket. localCheckpointed: feeds BOTH the
    feature-count agg and the per-doc scoring join.

    The doc stream is rebalanced BEFORE the explode when the corpus is
    big and under-partitioned: tokenize+hash is the dominant per-row
    compute and a 32-file x100 corpus ran it as one 32-task wave whose
    stragglers held the wall (r13 verdict next-#7; measured at x100:
    85.8 s at 32 input partitions -> 41.1 s at 128 -> 35.1 s at 256,
    the full-text round-robin shuffle included in those walls). The
    width is sized from the INPUT BYTES (~256 KB of COMPRESSED parquet
    per task — snappy on text is ~10x, so that is a few MB of tokens;
    a first cut at 2 MB/task skipped the rebalance on the 56 MB-
    compressed x100 corpus entirely), capped at 8x cores, and the
    exchange only engages when that target is at least two waves — a
    small corpus keeps its original plan (an unconditional 256-way
    rebalance cost the sf0.1 suite row ~2 s of scheduling/
    materialization overhead for nothing)."""
    from databus_spark.operators.text import _ngrams

    try:
        import os as _o

        nbytes = sum(
            _o.stat(f[7:] if f.startswith("file://") else f).st_size
            for f in docs.inputFiles()
        )
    except Exception:
        nbytes = 0  # non-file source: keep the plan as-is
    sc = docs.sparkSession.sparkContext
    target = min(sc.defaultParallelism * 8, nbytes // (256 << 10))
    if target >= sc.defaultParallelism * 2 and target > docs.rdd.getNumPartitions():
        docs = docs.repartition(int(target))
    else:
        # r14: the byte-sized rebalance above is the x100 lever and
        # deliberately skips small corpora — but a SINGLE-SPLIT small
        # corpus still runs the dominant tokenize+hash serial (stage
        # metrics at sf0.1: one 2.0 CPU-s 1-task stage per run).
        # widen_scan is the floor: min(cores, 8) wide, no-op when the
        # input already has that many splits.
        from databus_spark.plans.hints import widen_scan

        docs = widen_scan(docs)
    toks = tokens_col("text")
    feats = F.concat(toks, _ngrams(toks, 2))
    return (
        docs.select("doc_id", "lang", F.explode(feats).alias("tok"))
        .select(
            "doc_id",
            "lang",
            (portable_hash64(F.col("tok"), seed=F.lit(DSIR_SEED)) % DSIR_BUCKETS)
            .alias("f"),
        )
        .localCheckpoint(eager=False)
    )


_DSIR_W_EXPR = (
    "CAST(((CAST(c_t AS DECIMAL(20,0)) + 1) * (t_r + {B}) * 1000000)"
    " div ((CAST(c_r AS DECIMAL(20,0)) + 1) * (t_t + {B})) AS BIGINT)"
)


def _dsir_weight_table(tk: DataFrame, target_lang: str) -> DataFrame:
    """Weight table from an (already checkpointed) feature stream —
    target and corpus counts in ONE pass."""
    cnt = tk.groupBy("f").agg(
        F.count(F.lit(1)).alias("c_r"),
        F.sum((F.col("lang") == target_lang).cast("long")).alias("c_t"),
    )
    tot = cnt.agg(
        F.sum("c_r").alias("t_r"), F.sum("c_t").alias("t_t")
    )
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            F.col("f").cast("bigint").alias("f"),
            F.col("c_t").alias("c_target"),
            F.col("c_r").alias("c_corpus"),
            F.expr(_DSIR_W_EXPR.format(B=DSIR_BUCKETS)).alias("weight_micro"),
        )
    )


def dsir_feature_weights(
    docs: DataFrame, target_lang: str = DSIR_TARGET_LANG
) -> DataFrame:
    """Per-bucket smoothed likelihood ratio p_target/p_corpus in
    micro-units: (f, c_target, c_corpus, weight_micro). Laplace +1 on
    counts, +DSIR_BUCKETS on totals."""
    return _dsir_weight_table(_dsir_tokens(docs), target_lang)


def dsir_doc_scores(
    docs: DataFrame, target_lang: str = DSIR_TARGET_LANG
) -> DataFrame:
    """(doc_id, lang, n_feats, score_micro, per_feat_micro): the DSIR
    importance score — sum of per-feature-instance weights (unigrams ++
    bigrams), plus the length-normalized form selection ranks on
    (score div n_feats, another exact floor-division)."""
    tk = _dsir_tokens(docs)
    # ONE feature stream serves both the weight-table agg and the
    # scoring join (the checkpoint materializes the explode+hash once;
    # deriving the table from its own _dsir_tokens call doubled the
    # dominant map-side work and cost ~2x at sf0.1)
    w = _dsir_weight_table(tk, target_lang).select("f", "weight_micro")
    return (
        tk.join(F.broadcast(w), "f")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("weight_micro").alias("score_micro"),
        )
        .select(
            "doc_id",
            "lang",
            "n_feats",
            "score_micro",
            F.expr("score_micro div n_feats").alias("per_feat_micro"),
        )
    )


def dsir_select_topk(
    docs: DataFrame, k: int = DSIR_TOPK, target_lang: str = DSIR_TARGET_LANG
) -> DataFrame:
    """Deterministic top-k selection by length-normalized DSIR score
    (ties -> lowest doc_id). orderBy+limit is Spark's distributed
    TakeOrdered — per-partition top-k then a k-row merge, never a
    global sort; the rank window runs AFTER the limit, over k rows."""
    scored = dsir_doc_scores(docs, target_lang)
    top = scored.orderBy(F.desc("per_feat_micro"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("per_feat_micro"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "doc_id",
        "lang",
        "n_feats",
        "per_feat_micro",
    )


def _dsir_ctes(from_sql: str, target_lang: str) -> str:
    h = portable_hash64_sql("tok", f"'{DSIR_SEED}'")
    B = DSIR_BUCKETS
    w_expr = (
        f"CAST(((CAST(c_t AS HUGEINT) + 1) * (t_r + {B}) * 1000000)"
        f" // ((CAST(c_r AS HUGEINT) + 1) * (t_t + {B})) AS BIGINT)"
    )
    return f"""
        tk AS (
            SELECT doc_id, lang, ({h}) % {B} AS f
            FROM (
                SELECT doc_id, lang, unnest(feats) AS tok
                FROM (
                    SELECT doc_id, lang,
                           t || CASE WHEN len(t) >= 2 THEN list_transform(
                                    range(0, len(t) - 1),
                                    i -> array_to_string(t[i+1:i+2], ' '))
                                ELSE [] END AS feats
                    FROM (SELECT doc_id, lang,
                                 {TOKENS_SQL.format(col='text')} AS t
                          FROM ({from_sql}))
                )
            )
        ),
        cnt AS (
            SELECT f,
                   CAST(count(*) AS BIGINT) AS c_r,
                   CAST(sum(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS c_t
            FROM tk GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(c_r) AS BIGINT) AS t_r,
                   CAST(sum(c_t) AS BIGINT) AS t_t
            FROM cnt
        ),
        w AS (
            SELECT f, c_t, c_r, {w_expr} AS weight_micro
            FROM cnt, tot
        )
    """


def dsir_feature_weights_sql(
    from_sql: str, target_lang: str = DSIR_TARGET_LANG
) -> str:
    return f"""
        WITH {_dsir_ctes(from_sql, target_lang)}
        SELECT CAST(f AS BIGINT) AS f, c_t AS c_target, c_r AS c_corpus,
               weight_micro
        FROM w
    """


def _dsir_scores_sql(from_sql: str, target_lang: str) -> str:
    return f"""
        {_dsir_ctes(from_sql, target_lang)},
        scored AS (
            SELECT tk.doc_id, tk.lang,
                   CAST(count(*) AS BIGINT) AS n_feats,
                   CAST(sum(w.weight_micro) AS BIGINT) AS score_micro
            FROM tk JOIN w USING (f)
            GROUP BY 1, 2
        ),
        final AS (
            SELECT doc_id, lang, n_feats, score_micro,
                   score_micro // n_feats AS per_feat_micro
            FROM scored
        )
    """


def dsir_doc_scores_sql(from_sql: str, target_lang: str = DSIR_TARGET_LANG) -> str:
    return f"""
        WITH {_dsir_scores_sql(from_sql, target_lang)}
        SELECT doc_id, lang, n_feats, score_micro, per_feat_micro FROM final
    """


def dsir_select_topk_sql(
    from_sql: str, k: int = DSIR_TOPK, target_lang: str = DSIR_TARGET_LANG
) -> str:
    return f"""
        WITH {_dsir_scores_sql(from_sql, target_lang)}
        SELECT CAST(row_number() OVER (ORDER BY per_feat_micro DESC, doc_id ASC)
                    AS BIGINT) AS rank,
               doc_id, lang, n_feats, per_feat_micro
        FROM final
        ORDER BY per_feat_micro DESC, doc_id ASC
        LIMIT {k}
    """


# ---------------------------------------------------------------------------
# Water-filling token-budget allocation (budget-constrained data mixing)
# ---------------------------------------------------------------------------
# The complement of mixture_temperature_sample: given a TOTAL token
# budget, allocate per-source quotas by water-filling — every source
# gets min(its tokens, L) where the level L is the largest integer that
# keeps the total inside budget. Small sources are fully admitted; big
# sources are capped at one common level — the standard epoch-budgeting
# shape for pretraining mixtures.
#
# Exact integer construction (identical both engines): sort sources by
# token count asc; rank-r source is FULLY satisfied iff
# P_{r-1} + (n-r+1)*c_r <= B (giving everyone from rank r up at least
# c_r fits). k = count of satisfied ranks (monotone), then
# L = (B - P_k) div (n - k); quota = least(c, L). Everything bigint —
# (n-r+1)*c_r stays < 2^63 up to ~1e4 sources of ~1e13 tokens.
#
# Scale: one map-side-combinable token-count agg per source (sources
# are few), then all window math runs over the n-row counts frame —
# the single-partition window is over SOURCES, not rows, same bounded
# shape mixture_temperature_sample documents.

WATERFILL_BUDGET_PPM = 500_000  # budget = half the corpus token mass


def mixture_waterfill(
    docs: DataFrame,
    group_col: str = "source",
    budget_ppm: int = WATERFILL_BUDGET_PPM,
) -> DataFrame:
    """(source, n_tokens, quota_tokens, is_capped): water-filled token
    quotas under budget = total_tokens * budget_ppm / 1e6 (floored)."""
    counts = docs.groupBy(group_col).agg(
        F.sum(F.size(tokens_col("text"))).cast("long").alias("c")
    )
    w_all = Window.partitionBy()
    w_ord = Window.partitionBy().orderBy("c", group_col)
    ranked = counts.select(
        group_col,
        "c",
        F.row_number().over(w_ord).alias("r"),
        F.sum("c").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias("p"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.expr(f"sum(c) OVER () * {budget_ppm} div 1000000").alias("b"),
    )
    sat = ranked.withColumn(
        "ok", (F.col("p") - F.col("c")) + (F.col("n") - F.col("r") + 1) * F.col("c") <= F.col("b")
    )
    lvl = sat.select(
        group_col,
        "c",
        "ok",
        F.sum(F.col("ok").cast("long")).over(w_all).alias("k"),
        F.sum(F.when(F.col("ok"), F.col("c")).otherwise(0)).over(w_all).alias("pk"),
        "n",
        "b",
    ).withColumn(
        "lvl",
        F.when(
            F.col("k") < F.col("n"),
            F.expr("(b - pk) div (n - k)"),
        ).otherwise(F.col("c")),
    )
    return lvl.select(
        group_col,
        F.col("c").alias("n_tokens"),
        F.least(F.col("c"), F.col("lvl")).alias("quota_tokens"),
        (F.col("c") > F.col("lvl")).alias("is_capped"),
    )


def mixture_waterfill_sql(
    from_sql: str,
    group_col: str = "source",
    budget_ppm: int = WATERFILL_BUDGET_PPM,
) -> str:
    return f"""
        WITH counts AS (
            SELECT {group_col},
                   CAST(sum(len({TOKENS_SQL.format(col='text')})) AS BIGINT) AS c
            FROM ({from_sql}) GROUP BY 1
        ),
        ranked AS (
            SELECT {group_col}, c,
                   row_number() OVER (ORDER BY c, {group_col}) AS r,
                   sum(c) OVER (ORDER BY c, {group_col}
                                ROWS UNBOUNDED PRECEDING) AS p,
                   count(*) OVER () AS n,
                   sum(c) OVER () * {budget_ppm} // 1000000 AS b
            FROM counts
        ),
        sat AS (
            SELECT *, (p - c) + (n - r + 1) * c <= b AS ok FROM ranked
        ),
        lvl AS (
            SELECT {group_col}, c, ok,
                   sum(CASE WHEN ok THEN 1 ELSE 0 END) OVER () AS k,
                   sum(CASE WHEN ok THEN c ELSE 0 END) OVER () AS pk,
                   n, b
            FROM sat
        )
        SELECT {group_col},
               c AS n_tokens,
               CAST(least(c, CASE WHEN k < n THEN (b - pk) // (n - k) ELSE c END)
                    AS BIGINT) AS quota_tokens,
               c > CASE WHEN k < n THEN (b - pk) // (n - k) ELSE c END
                   AS is_capped
        FROM lvl
    """


def mixture_waterfill_sample(
    docs: DataFrame,
    group_col: str = "source",
    budget_ppm: int = WATERFILL_BUDGET_PPM,
) -> DataFrame:
    """The selection half of water-filling: per source, admit docs in
    deterministic hash order until the source's token quota is reached
    (a doc whose inclusive running total would overflow the quota is
    dropped — under-fill by at most one doc per source, the same
    boundary rule sequence_packing uses). Output: the admitted docs
    with their running token totals.

    Scale: quotas broadcast (n-source frame); one window per source
    (bounded like stratified_sample's strata windows — for massive
    sources swap the exact cumsum for a hash threshold on
    quota/total)."""
    quotas = mixture_waterfill(docs, group_col, budget_ppm).select(
        group_col, "quota_tokens"
    )
    h = portable_hash64(F.col("doc_id").cast("string"), F.lit("wfill"))
    base = docs.select(
        "doc_id",
        group_col,
        F.size(tokens_col("text")).cast("long").alias("n_tokens"),
        h.alias("_h"),
    )
    w = Window.partitionBy(group_col).orderBy("_h", "doc_id")
    return (
        base.join(F.broadcast(quotas), group_col)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= F.col("quota_tokens"))
        .select("doc_id", group_col, "n_tokens", "cum_tokens")
    )


def mixture_waterfill_sample_sql(
    from_sql: str,
    group_col: str = "source",
    budget_ppm: int = WATERFILL_BUDGET_PPM,
) -> str:
    h = portable_hash64_sql("doc_id", "'wfill'")
    return f"""
        WITH quotas AS (
            SELECT {group_col}, quota_tokens
            FROM ({mixture_waterfill_sql(from_sql, group_col, budget_ppm)})
        ),
        base AS (
            SELECT doc_id, {group_col},
                   CAST(len({TOKENS_SQL.format(col='text')}) AS BIGINT)
                       AS n_tokens,
                   {h} AS h
            FROM ({from_sql})
        ),
        runs AS (
            SELECT doc_id, {group_col}, n_tokens, quota_tokens,
                   CAST(sum(n_tokens) OVER (PARTITION BY {group_col}
                                            ORDER BY h, doc_id
                                            ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cum_tokens
            FROM base JOIN quotas USING ({group_col})
        )
        SELECT doc_id, {group_col}, n_tokens, cum_tokens
        FROM runs WHERE cum_tokens <= quota_tokens
    """


def dsir_incremental_scores(
    incoming: DataFrame,
    base: DataFrame,
    target_lang: str = DSIR_TARGET_LANG,
    weights: DataFrame | None = None,
) -> DataFrame:
    """Score an INCOMING batch against DSIR weights trained on the BASE
    corpus — the production ingest shape (arXiv:2302.03169 trains the
    importance estimator once on a raw+target sample, then scores the
    stream): the base is never re-tokenized when ``weights`` (the
    staged model: dsir_feature_weights output) is passed. Buckets the
    base never populated score at the unseen-bucket smoothed default
    (c_t=0, c_r=0 -> (t_r+B)*1e6 // (t_t+B)), derived from the weight
    table's own totals — no second base pass. Output: (doc_id,
    n_feats, score_micro, per_feat_micro) per incoming doc."""
    if weights is None:
        weights = dsir_feature_weights(base, target_lang)
    w = weights.select("f", "weight_micro")
    default_w = weights.agg(
        F.expr(
            f"CAST(((CAST(sum(c_corpus) AS DECIMAL(20,0)) + {DSIR_BUCKETS})"
            f" * 1000000) div (sum(c_target) + {DSIR_BUCKETS}) AS BIGINT)"
        ).alias("default_w")
    )
    tk = _dsir_tokens(incoming)
    return (
        tk.join(F.broadcast(w), "f", "left")
        .crossJoin(F.broadcast(default_w))
        .withColumn("weight_micro", F.coalesce("weight_micro", "default_w"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("weight_micro").alias("score_micro"),
        )
        .select(
            "doc_id",
            "n_feats",
            "score_micro",
            F.expr("score_micro div n_feats").alias("per_feat_micro"),
        )
    )


def dsir_incremental_scores_sql(
    incoming_from_sql: str,
    base_from_sql: str,
    target_lang: str = DSIR_TARGET_LANG,
) -> str:
    h = portable_hash64_sql("tok", f"'{DSIR_SEED}'")
    B = DSIR_BUCKETS
    return f"""
        WITH {_dsir_ctes(base_from_sql, target_lang)},
        dflt AS (
            SELECT CAST(((sum(c_r) + {B}) * 1000000) // (sum(c_t) + {B})
                        AS BIGINT) AS default_w
            FROM w
        ),
        itk AS (
            SELECT doc_id, ({h}) % {B} AS f
            FROM (
                SELECT doc_id, unnest(feats) AS tok
                FROM (
                    SELECT doc_id,
                           t || CASE WHEN len(t) >= 2 THEN list_transform(
                                    range(0, len(t) - 1),
                                    i -> array_to_string(t[i+1:i+2], ' '))
                                ELSE [] END AS feats
                    FROM (SELECT doc_id,
                                 {TOKENS_SQL.format(col='text')} AS t
                          FROM ({incoming_from_sql}))
                )
            )
        )
        SELECT itk.doc_id,
               CAST(count(*) AS BIGINT) AS n_feats,
               CAST(sum(coalesce(w.weight_micro, dflt.default_w)) AS BIGINT)
                   AS score_micro,
               CAST(sum(coalesce(w.weight_micro, dflt.default_w))
                    // count(*) AS BIGINT) AS per_feat_micro
        FROM itk
        LEFT JOIN w ON w.f = itk.f
        CROSS JOIN dflt
        GROUP BY 1
    """
