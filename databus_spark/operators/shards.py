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
    assert 0 <= overlap < max_tokens
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
