"""Hybrid lexical+vector retrieval: BM25 ∪ ANN fused by Reciprocal
Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009 — "Reciprocal
rank fusion outperforms Condorcet and individual rank learning
methods").

The serving composition every RAG-ish corpus pipeline ends up needing:
a lexical leg (exact-term recall: rare tokens, codes, names) and a
vector leg (semantic recall) answer the same query batch, and the
fused ranking is a pure function of the two LEG RANKS — no score
calibration across legs, which is what makes RRF robust and, here,
cross-engine exact: rrf = Σ_legs floor(SCALE / (K + rank)) in bigint
arithmetic, identical in Spark and DuckDB by construction.

Scale shape: each leg is already a bounded top-leg_n per query (BM25
over partition-pruned postings + broadcast query terms; cosine top-k
as TakeOrdered-style windowed selection), so the fusion input is
O(n_queries * leg_n) rows — driver-free, one small full-outer join on
(query_id, doc_id), ranks fused map-side. At 100 TB the legs serve
from their staged indexes (BM25 bucket-partitioned postings,
IVF+SQ8 cell-partitioned codes) and the fusion cost is unchanged.

The fixture's documents and embeddings tables are id-aligned
(doc_id == vec_id), so both legs share the ANN query convention
(ids < n_queries) and the lexical leg's self-hit is excluded to match
the vector leg's neighbor_id != query_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from databus_spark.operators.similarity import _cosine_sql, cosine_topk
from databus_spark.operators.text import (
    BM25_B,
    BM25_K1,
    BM25_QUERY_LEN,
    TOKENS_SQL,
    bm25_corpus_stats,
    bm25_postings,
    bm25_serve,
    tokens_col,
)

RRF_K = 60  # the paper's constant: small ranks dominate, tail still counts
RRF_SCALE = 1_000_000_000  # micro-ish units: floor(SCALE/(K+rank)) exact bigint
HYB_LEG_N = 20  # per-leg candidate depth feeding the fusion


def hybrid_query_terms(
    docs: DataFrame, n_queries: int = 10, q_len: int = BM25_QUERY_LEN
) -> DataFrame:
    """(query_id, tok): lexical query workload under the ANN id
    convention — tokens 2..q_len+1 of docs with id < n_queries (docs
    shorter than q_len+1 tokens have no lexical leg; the vector leg
    still answers them)."""
    toks = tokens_col("text")
    base = docs.select("doc_id", toks.alias("_t"))
    return (
        base.where((F.col("doc_id") < n_queries) & (F.size("_t") >= q_len + 1))
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice("_t", 2, q_len)).alias("tok"),
        )
        .distinct()
    )


def _lex_leg(
    postings: DataFrame,
    stats: DataFrame,
    qt: DataFrame,
    leg_n: int = HYB_LEG_N,
) -> DataFrame:
    """(query_id, doc_id, lex_rank): the BM25 leg over an index (inline
    or staged — bm25_serve is exact over either by the additivity the
    bm25_incremental oracle re-proves). One extra row requested so
    dropping the self-hit still leaves leg_n candidates; re-ranked
    after the exclusion (monotone in the same (score desc, doc_id)
    key bm25_serve ranked by)."""
    lex_raw = bm25_serve(postings, stats, qt, topk=leg_n + 1).where(
        F.col("doc_id") != F.col("query_id")
    )
    wl = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        lex_raw.withColumn("lex_rank", F.row_number().over(wl).cast("long"))
        .where(F.col("lex_rank") <= leg_n)
        .select("query_id", "doc_id", "lex_rank")
    )


def rrf_fuse(lex: DataFrame, vec: DataFrame, k: int = 5) -> DataFrame:
    """Fuse two (query_id, doc_id, <leg>_rank) legs: exact-bigint RRF,
    rank by (rrf desc, doc_id), top-k per query."""
    fused = lex.join(vec, ["query_id", "doc_id"], "full_outer")
    rrf = F.coalesce(
        F.expr(f"{RRF_SCALE} div ({RRF_K} + lex_rank)"), F.lit(0).cast("long")
    ) + F.coalesce(
        F.expr(f"{RRF_SCALE} div ({RRF_K} + vec_rank)"), F.lit(0).cast("long")
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micro"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rrf_micro", rrf)
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.col("rank").cast("int").alias("rank"),
            "rrf_micro",
            "lex_rank",
            "vec_rank",
        )
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    leg_n: int = HYB_LEG_N,
    q_len: int = BM25_QUERY_LEN,
) -> DataFrame:
    """(query_id, doc_id, rank, rrf_micro, lex_rank, vec_rank): top-k
    by RRF over the BM25 and exact-cosine legs. Leg ranks ride the
    output (nullable: a doc surfaced by only one leg scores only that
    leg's term), so the fused row is auditable without re-running the
    legs."""
    qt = hybrid_query_terms(docs, n_queries, q_len)
    lex = _lex_leg(bm25_postings(docs), bm25_corpus_stats(docs), qt, leg_n)
    vec = cosine_topk(emb, n_queries=n_queries, k=leg_n).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("long").alias("vec_rank"),
    )
    return rrf_fuse(lex, vec, k)


def hybrid_rrf_serve(
    spark,
    bm25_postings_df: DataFrame,
    bm25_stats_df: DataFrame,
    sq8_index_dir: str,
    docs: DataFrame,
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    leg_n: int = HYB_LEG_N,
    q_len: int = BM25_QUERY_LEN,
) -> DataFrame:
    """The DEPLOYMENT hybrid: both legs answer from their staged
    artifacts — bucket-pruned BM25 postings (bm25_serve) and the
    cell-partitioned IVF+SQ8 index (sq8_ivf_serve, path-scoped cell
    read) — so per-batch cost is query-bound on both sides and the
    corpus is never rescanned. The vector leg ranks by the quantized
    IVF-pruned sim (the serving tier's actual ranking), so this is a
    DIFFERENT — cheaper — composition than hybrid_rrf_topk's exact
    cosine leg, with its own oracle."""
    from concurrent.futures import ThreadPoolExecutor

    from databus_spark.operators.similarity import sq8_ivf_serve

    qt = hybrid_query_terms(docs, n_queries, q_len)

    def _vec_leg() -> DataFrame:
        return sq8_ivf_serve(
            spark, sq8_index_dir, emb.where(F.col("vec_id") < n_queries), k=leg_n
        ).select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").cast("long").alias("vec_rank"),
        )

    # build the legs concurrently (guide §2.6): each leg's construction
    # runs bounded driver collects (lex: the query-vocabulary bucket
    # list; vec: the probed-cell list), and those jobs are independent —
    # serially they cost two job round-trips of driver latency per serve
    # batch, overlapped they cost one. Plain threads are safe here: only
    # driver-side plan construction and small FIFO-scheduled jobs run
    # inside.
    with ThreadPoolExecutor(max_workers=2) as _ex:
        _lex_f = _ex.submit(_lex_leg, bm25_postings_df, bm25_stats_df, qt, leg_n)
        _vec_f = _ex.submit(_vec_leg)
        lex, vec = _lex_f.result(), _vec_f.result()
    return rrf_fuse(lex, vec, k)


def _hy_lex_ctes(n_queries: int, leg_n: int, q_len: int, k1: float, b: float) -> str:
    """The shared lexical-leg CTE chain (bm25_topk_sql's score pipeline
    under the ANN id convention, self-hit excluded before the leg
    rank). Used verbatim by both hybrid oracles: the staged-postings
    serve is EXACT vs this from-scratch rebuild (the additivity the
    bm25_incremental oracle re-proves every round)."""
    toks = TOKENS_SQL.format(col="text")
    return f"""hy_base AS (SELECT doc_id, {toks} AS t FROM documents),
        hy_stats AS (
            SELECT count(*) AS n_docs,
                   CAST((sum(len(t)) * 1000000) // count(*) AS DOUBLE) / 1000000.0
                       AS avgdl
            FROM hy_base),
        hy_qt AS (
            SELECT DISTINCT doc_id AS query_id, unnest(t[2:{q_len + 1}]) AS tok
            FROM hy_base
            WHERE doc_id < {n_queries} AND len(t) >= {q_len + 1}),
        hy_tf AS (
            SELECT doc_id, tok, count(*) AS tf, any_value(dl) AS dl
            FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS tok FROM hy_base)
            WHERE tok IN (SELECT tok FROM hy_qt)
            GROUP BY 1, 2),
        hy_dft AS (SELECT tok, count(*) AS df FROM hy_tf GROUP BY 1),
        hy_terms AS (
            SELECT q.query_id, f.doc_id,
                   CAST(round(
                       ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                       * (f.tf * {1.0 + k1})
                       / (f.tf + {k1} * ({1.0 - b} + {b} * f.dl / s.avgdl)),
                   6) AS DECIMAL(18,6)) AS w
            FROM hy_tf f
            JOIN hy_qt q USING (tok)
            JOIN hy_dft d USING (tok)
            CROSS JOIN hy_stats s),
        hy_sc AS (
            SELECT query_id, doc_id, sum(w) AS score
            FROM hy_terms WHERE doc_id <> query_id GROUP BY 1, 2),
        hy_lex AS (
            SELECT query_id, doc_id, lex_rank FROM (
                SELECT query_id, doc_id,
                       row_number() OVER (
                           PARTITION BY query_id ORDER BY score DESC, doc_id
                       ) AS lex_rank
                FROM hy_sc)
            WHERE lex_rank <= {leg_n})"""


def _hy_fusion_tail(k: int) -> str:
    return f"""hy_fused AS (
            SELECT query_id, doc_id,
                   coalesce({RRF_SCALE} // ({RRF_K} + lex_rank), 0)
                   + coalesce({RRF_SCALE} // ({RRF_K} + vec_rank), 0)
                       AS rrf_micro,
                   lex_rank, vec_rank
            FROM hy_lex FULL JOIN hy_vec USING (query_id, doc_id)),
        hy_rk AS (
            SELECT query_id, doc_id, rrf_micro, lex_rank, vec_rank,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id
                   ) AS rank
            FROM hy_fused)
        SELECT query_id, doc_id, CAST(rank AS INT) AS rank,
               CAST(rrf_micro AS BIGINT) AS rrf_micro,
               CAST(lex_rank AS BIGINT) AS lex_rank,
               CAST(vec_rank AS BIGINT) AS vec_rank
        FROM hy_rk WHERE rank <= {k}"""


def hybrid_rrf_serve_sql(
    n_queries: int = 10,
    k: int = 5,
    leg_n: int = HYB_LEG_N,
    q_len: int = BM25_QUERY_LEN,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin of the staged-artifact hybrid: the shared lexical
    CTEs + the IVF+SQ8 serve ranking (quantized sim over probed
    cells, the sqsv chain) as the vector leg + the identical fusion."""
    from databus_spark.functions.hashes import portable_hash64_sql
    from databus_spark.operators.similarity import (
        N_CELLS,
        SQ8_SCALE,
        SQ8IVF_ASSIGN,
        SQ8IVF_NPROBE,
    )

    h = portable_hash64_sql("vec_id", "'ivf'")
    cell_sim = _cosine_sql("v.embedding", "c.cell_vec")
    idot = (
        "list_sum(list_transform(range(1, len({a}) + 1), "
        "i -> {a}[i] * {b}[i]))"
    )
    dqc = idot.format(a="q.qv", b="c.qv")
    dqq = idot.format(a="q.qv", b="q.qv")
    dcc = idot.format(a="c.qv", b="c.qv")
    return f"""
        WITH {_hy_lex_ctes(n_queries, leg_n, q_len, k1, b)},
        hs_cent AS (
            SELECT vec_id AS cell_id, embedding AS cell_vec
            FROM embeddings ORDER BY {h}, vec_id LIMIT {N_CELLS}),
        hs_ranked AS (
            SELECT v.vec_id, c.cell_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY round({cell_sim}, 6) DESC, c.cell_id ASC
                   ) AS cell_rank
            FROM embeddings v CROSS JOIN hs_cent c),
        hs_q8 AS (
            SELECT vec_id,
                   list_transform(embedding,
                        e -> CAST(floor(e / m * {SQ8_SCALE}.0 + 0.5)
                                  AS BIGINT)) AS qv
            FROM (SELECT vec_id, embedding,
                         greatest(list_max(list_transform(embedding,
                                  e -> abs(e))), 1e-30) AS m
                  FROM embeddings)),
        hs_cand AS (
            SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
            FROM (SELECT vec_id, cell_id FROM hs_ranked
                  WHERE vec_id < {n_queries} AND cell_rank <= {SQ8IVF_NPROBE}) p
            JOIN (SELECT vec_id, cell_id FROM hs_ranked
                  WHERE cell_rank <= {SQ8IVF_ASSIGN}) a
              ON a.cell_id = p.cell_id AND a.vec_id <> p.vec_id),
        hs_scored AS (
            SELECT query_id, neighbor_id,
                   round(CAST({dqc} AS DOUBLE)
                         / (sqrt(CAST({dqq} AS DOUBLE))
                            * sqrt(CAST({dcc} AS DOUBLE))), 6) AS sim_q8
            FROM hs_cand
            JOIN hs_q8 q ON q.vec_id = query_id
            JOIN hs_q8 c ON c.vec_id = neighbor_id),
        hy_vec AS (
            SELECT query_id, doc_id, vec_rank FROM (
                SELECT query_id, neighbor_id AS doc_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY sim_q8 DESC, neighbor_id ASC
                       ) AS vec_rank
                FROM hs_scored)
            WHERE vec_rank <= {leg_n}),
        {_hy_fusion_tail(k)}
    """


def hybrid_rrf_topk_sql(
    n_queries: int = 10,
    k: int = 5,
    leg_n: int = HYB_LEG_N,
    q_len: int = BM25_QUERY_LEN,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin: the shared lexical CTEs (bm25_topk_sql score
    pipeline under the ANN id convention, self-hit excluded before the
    leg rank), the 6dp cosine ranking, and the shared bigint RRF."""
    sim = _cosine_sql("q.embedding", "c.embedding")
    return f"""
        WITH {_hy_lex_ctes(n_queries, leg_n, q_len, k1, b)},
        hy_vec AS (
            SELECT query_id, doc_id, vec_rank FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY round({sim}, 6) DESC, c.vec_id ASC
                       ) AS vec_rank
                FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
                WHERE q.vec_id < {n_queries})
            WHERE vec_rank <= {leg_n}),
        {_hy_fusion_tail(k)}
    """
