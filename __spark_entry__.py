"""Driver contract for the pgd_spark engine.

``entry(spark)``   — flagship query (full graphlet macro census on the
                     co-purchase graph at sf0.001).
``queries()``      — one callable per implemented operator (SURVEY §2 +
                     the pipeline operators); each (spark, sf_dir) →
                     DataFrame.
``oracle_sql()``   — DuckDB-runnable ANSI SQL equivalent per query
                     (omitted only for genuinely non-SQL-expressible
                     iterative/hash-seeded ops → rows-only check).

Column names/types are aligned pairwise; every float is rounded to 6
decimals on both sides so the value-hash compare is stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

SUBGRAPH_MAX_PARTKEY = 500  # bounds the exhaustive-census oracle cost


# ------------------------------------------------------------------ helpers
def _copurchase_graph(spark: SparkSession, sf_dir: str, max_partkey: int | None = None):
    from pgd_spark.sources.relational import copurchase_graph

    return copurchase_graph(spark, sf_dir, max_partkey)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# SQL building blocks shared by the graph oracles
_SQL_EDGES_FULL = """
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)"""

_SQL_EDGES_SUB = f"""
li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey <= {SUBGRAPH_MAX_PARTKEY}),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)"""

_SQL_GRAPH_COMMON = """
sym AS (SELECT src AS v, dst AS w FROM edges UNION ALL SELECT dst, src FROM edges),
deg AS (SELECT v, count(*) AS degree FROM sym GROUP BY v)"""

# degree-oriented edges + per-edge tri/cliq/cyc (the kernel oracle)
_SQL_KERNEL = """
o AS (
  SELECT CASE WHEN dd.degree < ds.degree OR (dd.degree = ds.degree AND e.dst < e.src)
              THEN e.dst ELSE e.src END AS v,
         CASE WHEN dd.degree < ds.degree OR (dd.degree = ds.degree AND e.dst < e.src)
              THEN e.src ELSE e.dst END AS u,
         LEAST(ds.degree, dd.degree)    AS deg_v_x,
         GREATEST(ds.degree, dd.degree) AS deg_u_x
  FROM edges e JOIN deg ds ON e.src = ds.v JOIN deg dd ON e.dst = dd.v
),
ori AS (SELECT v, u, deg_v_x AS deg_v, deg_u_x AS deg_u FROM o),
tri_tab AS (
  SELECT ori.v, ori.u, s1.w AS t
  FROM ori JOIN sym s1 ON s1.v = ori.v
           JOIN sym s2 ON s2.v = ori.u AND s2.w = s1.w
),
tri_cnt AS (SELECT v, u, count(*) AS tri FROM tri_tab GROUP BY v, u),
cliq_cnt AS (
  SELECT a.v, a.u, count(*) AS cliq
  FROM tri_tab a JOIN tri_tab b ON a.v = b.v AND a.u = b.u AND a.t < b.t
  JOIN edges ab ON ab.src = LEAST(a.t, b.t) AND ab.dst = GREATEST(a.t, b.t)
  GROUP BY a.v, a.u
),
wu AS (
  SELECT ori.v, ori.u, s.w
  FROM ori JOIN sym s ON s.v = ori.u
  WHERE s.w <> ori.v
    AND NOT EXISTS (SELECT 1 FROM sym x WHERE x.v = ori.v AND x.w = s.w)
),
wv AS (
  SELECT ori.v, ori.u, s.w
  FROM ori JOIN sym s ON s.v = ori.v
  WHERE s.w <> ori.u
    AND NOT EXISTS (SELECT 1 FROM sym x WHERE x.v = ori.u AND x.w = s.w)
),
cyc_cnt AS (
  SELECT a.v, a.u, count(*) AS cyc
  FROM wu a JOIN wv b ON a.v = b.v AND a.u = b.u
  JOIN edges wx ON wx.src = LEAST(a.w, b.w) AND wx.dst = GREATEST(a.w, b.w)
  GROUP BY a.v, a.u
),
kernel AS (
  SELECT ori.v, ori.u, ori.deg_v, ori.deg_u,
         COALESCE(t.tri, 0)  AS tri,
         COALESCE(c.cliq, 0) AS cliq,
         COALESCE(y.cyc, 0)  AS cyc
  FROM ori LEFT JOIN tri_cnt t ON ori.v = t.v AND ori.u = t.u
           LEFT JOIN cliq_cnt c ON ori.v = c.v AND ori.u = c.u
           LEFT JOIN cyc_cnt y ON ori.v = y.v AND ori.u = y.u
)"""


def _graph_cte(sub: bool) -> str:
    return "WITH " + (_SQL_EDGES_SUB if sub else _SQL_EDGES_FULL) + "," + _SQL_GRAPH_COMMON


def _graph_cte_mat(sub: bool) -> str:
    """Graph CTE prefix with MATERIALIZED hints — required by the
    unrolled iterative oracles (kcore/LPA/pagerank), where ``sym`` is
    referenced once per round and DuckDB would otherwise re-derive the
    whole co-purchase self-join each time (measured: 400s → <1s)."""
    cte = _graph_cte(sub)
    for name in ("li AS (", "edges AS (", "sym AS (", "deg AS ("):
        cte = cte.replace(name, name.replace("AS (", "AS MATERIALIZED ("))
    return cte


# ------------------------------------------------------------------ queries
def q_g_edges(spark, sf_dir):
    return _copurchase_graph(spark, sf_dir).edges.select("src", "dst")


def q_g_degrees(spark, sf_dir):
    return _copurchase_graph(spark, sf_dir).degrees().select("v", F.col("degree"))


def q_g_degree_stats(spark, sf_dir):
    from pgd_spark.operators.stats import degree_stats

    d = degree_stats(_copurchase_graph(spark, sf_dir))
    return spark.createDataFrame(
        [(d["n_vertices"], d["n_edges"], d["max_degree"],
          round(d["avg_degree_exact"], 6), round(d["density"], 6))],
        "n_vertices long, n_edges long, max_degree long, avg_degree double, density double",
    )


def q_g_triangles_per_edge(spark, sf_dir):
    from pgd_spark.operators.graphlets import edge_graphlet_counts

    g = _copurchase_graph(spark, sf_dir)
    c = edge_graphlet_counts(g, strategy="broadcast")
    return c.select(
        F.least("v", "u").alias("src"), F.greatest("v", "u").alias("dst"), F.col("tri")
    )


def q_g_triangle_stats(spark, sf_dir):
    from pgd_spark.operators.graphlets import macro_counts

    t = macro_counts(_copurchase_graph(spark, sf_dir), strategy="broadcast")
    return spark.createDataFrame(
        [(t["total_3_tris"], t["total_2_star"], t["total_wedges"], round(t["global_cc"], 6))],
        "triangles long, two_stars long, wedges long, global_cc double",
    )


def q_g_assortativity(spark, sf_dir):
    from pgd_spark.operators.stats import assortativity

    r = assortativity(_copurchase_graph(spark, sf_dir))
    return spark.createDataFrame([(round(r, 6),)], "r double")


def q_g_macro_counts(spark, sf_dir):
    from pgd_spark.operators.graphlets import MACRO_KEYS, macro_counts

    t = macro_counts(
        _copurchase_graph(spark, sf_dir, SUBGRAPH_MAX_PARTKEY), strategy="broadcast"
    )
    schema = ", ".join(f"{k} long" for k in MACRO_KEYS) + ", total_wedges long, global_cc double"
    row = tuple(int(t[k]) for k in MACRO_KEYS) + (int(t["total_wedges"]), round(t["global_cc"], 6))
    return spark.createDataFrame([row], schema)


def q_g_micro_counts(spark, sf_dir):
    from pgd_spark.operators.graphlets import micro_counts

    g = _copurchase_graph(spark, sf_dir, SUBGRAPH_MAX_PARTKEY)
    return micro_counts(g, strategy="broadcast", pgd_quirk=True)


def q_g_kcore(spark, sf_dir):
    from pgd_spark.operators.kcore import kcore

    return kcore(_copurchase_graph(spark, sf_dir, SUBGRAPH_MAX_PARTKEY)).select("v", "core")


PAGERANK_ITERS = 20  # fixed horizon so the DuckDB oracle can unroll it


def q_g_pagerank(spark, sf_dir):
    from pgd_spark.operators.pregel import pagerank

    g = _copurchase_graph(spark, sf_dir, SUBGRAPH_MAX_PARTKEY)
    return pagerank(g, tol=0.0, max_iter=PAGERANK_ITERS).select(
        "v", F.round("rank", 6).alias("rank")
    )


def q_g_connected_components(spark, sf_dir):
    from pgd_spark.operators.pregel import connected_components

    g = _copurchase_graph(spark, sf_dir, SUBGRAPH_MAX_PARTKEY)
    return connected_components(g).select("v", "component")


def q_g_connected_components_two_phase(spark, sf_dir):
    from pgd_spark.operators.pregel import connected_components

    g = _copurchase_graph(spark, sf_dir, SUBGRAPH_MAX_PARTKEY)
    return connected_components(g, algorithm="two_phase").select("v", "component")


def q_g_gfd(spark, sf_dir):
    from pgd_spark.operators.graphlets import (
        compute_connected_gfd,
        compute_disconnected_gfd,
        macro_counts,
    )

    t = macro_counts(
        _copurchase_graph(spark, sf_dir, SUBGRAPH_MAX_PARTKEY), strategy="broadcast"
    )
    con = compute_connected_gfd(t)
    dis = compute_disconnected_gfd(t)
    names = ["clique4", "chordal4", "tailed4", "cycle4", "star3", "path4"]
    dnames = ["tri4", "star2_4", "edge2_4", "edge1_4", "indep4"]
    row = tuple(round(x, 6) for x in con) + tuple(round(x, 6) for x in dis)
    schema = ", ".join(f"gfd_{n} double" for n in names) + ", " + ", ".join(
        f"gfd_{n} double" for n in dnames
    )
    return spark.createDataFrame([row], schema)


def q_g_label_propagation(spark, sf_dir):
    from pgd_spark.operators.pregel import label_propagation

    g = _copurchase_graph(spark, sf_dir, SUBGRAPH_MAX_PARTKEY)
    return label_propagation(g, max_iter=4).select("v", "label")


def q_g_triangle_per_vertex(spark, sf_dir):
    from pgd_spark.operators.pregel import triangle_count_per_vertex

    g = _copurchase_graph(spark, sf_dir)
    return triangle_count_per_vertex(g).select("v", "triangles")


def q_g_vertex_micro(spark, sf_dir):
    from pgd_spark.operators.vertex_micro import vertex_micro_counts

    g = _copurchase_graph(spark, sf_dir, SUBGRAPH_MAX_PARTKEY)
    return vertex_micro_counts(g, strategy="broadcast")


def q_g_edge_ordering(spark, sf_dir):
    from pgd_spark.operators.ordering import edge_ordering

    g = _copurchase_graph(spark, sf_dir, SUBGRAPH_MAX_PARTKEY)
    return edge_ordering(g, "degree").select("src", "dst", "order_value")


def q_g_approx_census(spark, sf_dir):
    from pgd_spark.operators.approximate import approximate_macro_counts

    g = _copurchase_graph(spark, sf_dir, SUBGRAPH_MAX_PARTKEY)
    t = approximate_macro_counts(g, fraction=0.5, seed=7, strategy="broadcast")
    return spark.createDataFrame(
        [(t["total_3_tris"], t["total_4_clique"], t["total_2_1edge"])],
        "total_3_tris long, total_4_clique long, total_2_1edge long",
    )


def q_events_graph_edges(spark, sf_dir):
    from pgd_spark.sources.relational import events_session_graph

    return events_session_graph(spark, sf_dir).edges.select("src", "dst")


def q_doc_token_count(spark, sf_dir):
    from pgd_spark.functions.textstats import token_count

    return token_count(_docs(spark, sf_dir)).select("doc_id", "n_words", "n_chars", "n_tokens_est")


def q_doc_quality(spark, sf_dir):
    from pgd_spark.functions.textstats import quality_score

    return quality_score(_docs(spark, sf_dir))


def q_doc_langid(spark, sf_dir):
    from pgd_spark.functions.textstats import langid

    return langid(_docs(spark, sf_dir))


def q_doc_fingerprint(spark, sf_dir):
    from pgd_spark.functions.textstats import fingerprint

    return fingerprint(_docs(spark, sf_dir)).select("doc_id", "fp_md5")


def q_doc_exact_dedup(spark, sf_dir):
    from pgd_spark.functions.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir))


def q_doc_ngram_jaccard(spark, sf_dir):
    from pgd_spark.functions.dedup import ngram_jaccard_pairs

    # max_postings bounds the inverted-index self-join fan-out on
    # stopword shingles at corpus scale; 10k exceeds every posting list
    # at sf<=0.1 (<=5k docs total) so the small-sf result stays exact.
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), n=3, threshold=0.55, max_postings=10_000
    )


def q_doc_minhash_dedup(spark, sf_dir):
    from pgd_spark.functions.dedup import minhash_dedup

    return minhash_dedup(_docs(spark, sf_dir), n=3, threshold=0.7)


def q_doc_simhash(spark, sf_dir):
    from pgd_spark.functions.dedup import simhash_dedup

    return simhash_dedup(_docs(spark, sf_dir), max_hamming=8)


def q_emb_cosine_topk(spark, sf_dir):
    from pgd_spark.functions.similarity import cosine_topk

    embs = _embs(spark, sf_dir)
    queries = (
        embs.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    return cosine_topk(embs, queries, k=5).select("query_id", "vec_id", "rank")


def q_emb_lsh_topk(spark, sf_dir):
    from pgd_spark.functions.similarity import lsh_cosine_topk

    embs = _embs(spark, sf_dir)
    queries = (
        embs.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    # dim passed explicitly (testdata embeddings are 64-wide) so the
    # operator skips its driver-side first() fallback
    return lsh_cosine_topk(embs, queries, k=5, bits=8, tables=6, dim=64).select(
        "query_id", "vec_id", "rank"
    )


def q_emb_ivf_topk(spark, sf_dir):
    """IVF-flat ANN (pgd_spark.functions.similarity.ivf_cosine_topk):
    hash-min-sampled centroids, nearest-centroid assignment, nprobe
    probing, exact re-score — every stage portable arithmetic so the
    DuckDB oracle replays it value-for-value."""
    from pgd_spark.functions.similarity import ivf_cosine_topk

    embs = _embs(spark, sf_dir)
    queries = (
        embs.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    return ivf_cosine_topk(embs, queries, k=5, n_centroids=32, nprobe=8).select(
        "query_id", "vec_id", "rank"
    )


def q_emb_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs
    (pgd_spark.functions.similarity.embedding_neardup_pairs): sign-LSH
    bucket self-join candidates + exact cosine re-score, oracle replays
    the same seeded planes.  The testdata embeddings are unclustered
    Gaussians (max pairwise cosine ≈0.51), so the demo threshold is
    0.45 with low-bit tables; real near-dup corpora run the 0.9+/8-bit
    defaults."""
    from pgd_spark.functions.similarity import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _embs(spark, sf_dir), threshold=0.45, bits=4, tables=8, dim=64, max_bucket=400
    )


def q_doc_dedup_clusters(spark, sf_dir):
    """Pair list → duplicate clusters → canonical keep-set
    (pgd_spark.functions.dedup.dup_clusters): connected components of
    the minhash near-dup graph via the engine's own Pregel CC; the
    oracle closes the same pairs with a recursive CTE."""
    from pgd_spark.functions.dedup import dup_clusters, minhash_dedup

    docs = _docs(spark, sf_dir)
    return dup_clusters(minhash_dedup(docs, n=3, threshold=0.7), docs=docs)


def q_multimodal_meta(spark, sf_dir):
    from pgd_spark.functions.multimodal import attach_fake_payload, decode_image_meta

    return decode_image_meta(attach_fake_payload(_docs(spark, sf_dir)))


def q_transcript_graph_census(spark, sf_dir):
    """Transcript pipeline end-to-end: synthesize (deterministic, scale
    tied to sf via lineitem rowcount), derive edges, census."""
    from pgd_spark.operators.graphlets import MACRO_KEYS, macro_counts
    from pgd_spark.sources.transcripts import edges_from_transcripts, generate_transcripts

    tr = generate_transcripts(spark, 2000)
    g, _ = edges_from_transcripts(tr)
    t = macro_counts(g, strategy="broadcast")
    schema = ", ".join(f"{k} long" for k in MACRO_KEYS)
    return spark.createDataFrame([tuple(int(t[k]) for k in MACRO_KEYS)], schema)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full macro graphlet census of the sf0.001 co-purchase
    graph (all 17 totals, one row)."""
    return q_g_macro_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "g_edges": q_g_edges,
        "g_degrees": q_g_degrees,
        "g_degree_stats": q_g_degree_stats,
        "g_triangles_per_edge": q_g_triangles_per_edge,
        "g_triangle_stats": q_g_triangle_stats,
        "g_assortativity": q_g_assortativity,
        "g_macro_counts": q_g_macro_counts,
        "g_micro_counts": q_g_micro_counts,
        "g_kcore": q_g_kcore,
        "g_pagerank": q_g_pagerank,
        "g_connected_components": q_g_connected_components,
        "g_connected_components_two_phase": q_g_connected_components_two_phase,
        "g_gfd": q_g_gfd,
        "g_label_propagation": q_g_label_propagation,
        "g_triangle_per_vertex": q_g_triangle_per_vertex,
        "g_vertex_micro": q_g_vertex_micro,
        "g_edge_ordering": q_g_edge_ordering,
        "g_approx_census": q_g_approx_census,
        "events_graph_edges": q_events_graph_edges,
        "doc_token_count": q_doc_token_count,
        "doc_quality": q_doc_quality,
        "doc_langid": q_doc_langid,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_exact_dedup": q_doc_exact_dedup,
        "doc_ngram_jaccard": q_doc_ngram_jaccard,
        "doc_minhash_dedup": q_doc_minhash_dedup,
        "doc_simhash": q_doc_simhash,
        "emb_cosine_topk": q_emb_cosine_topk,
        "emb_lsh_topk": q_emb_lsh_topk,
        "emb_ivf_topk": q_emb_ivf_topk,
        "emb_neardup": q_emb_neardup,
        "doc_dedup_clusters": q_doc_dedup_clusters,
        "multimodal_meta": q_multimodal_meta,
        "transcript_graph_census": q_transcript_graph_census,
    }


# --------------------------------------------------------------- oracle SQL
def _kcore_sql(rounds: int = 16) -> str:
    """h-index fixpoint (Lü et al. 2016) unrolled: c(v) ← H({c(u):
    u∈N(v)}) is non-increasing and exact at convergence, so any unroll
    count ≥ the convergence round count (measured: 10 at sf0.01 —
    margin to 16) yields the fixpoint; extra rounds are no-ops."""
    parts = [_graph_cte_mat(sub=True), ", lab0 AS (SELECT v, degree AS core FROM deg)"]
    for i in range(rounds):
        parts.append(
            f""",
h{i} AS (
  SELECT v, max(least(rn, nbr_core)) AS h FROM (
    SELECT s.w AS v, l.core AS nbr_core,
           row_number() OVER (PARTITION BY s.w ORDER BY l.core DESC) AS rn
    FROM lab{i} l JOIN sym s ON l.v = s.v
  ) GROUP BY v
),
lab{i + 1} AS MATERIALIZED (
  SELECT l.v, least(l.core, COALESCE(h.h, 0)) AS core
  FROM lab{i} l LEFT JOIN h{i} h ON l.v = h.v
)"""
        )
    parts.append(f" SELECT v, CAST(core AS BIGINT) AS core FROM lab{rounds}")
    return "".join(parts)


def _lpa_sql(rounds: int = 4) -> str:
    """Synchronous LPA, deterministic ties (most-frequent neighbor
    label, smallest label wins), unrolled to the SAME fixed round count
    the Spark query uses."""
    parts = [_graph_cte_mat(sub=True), ", lab0 AS (SELECT v, v AS label FROM deg)"]
    for i in range(rounds):
        parts.append(
            f""",
best{i} AS (
  SELECT v, label FROM (
    SELECT s.w AS v, l.label, count(*) AS cnt,
           row_number() OVER (PARTITION BY s.w ORDER BY count(*) DESC, l.label ASC) AS rn
    FROM lab{i} l JOIN sym s ON l.v = s.v
    GROUP BY s.w, l.label
  ) WHERE rn = 1
),
lab{i + 1} AS MATERIALIZED (
  SELECT l.v, COALESCE(b.label, l.label) AS label
  FROM lab{i} l LEFT JOIN best{i} b ON l.v = b.v
)"""
        )
    parts.append(f" SELECT v, label FROM lab{rounds}")
    return "".join(parts)


def _pagerank_sql(iters: int = PAGERANK_ITERS, alpha: float = 0.85) -> str:
    """Power iteration on the symmetrized simple graph (every vertex
    has degree ≥ 1, no dangling mass), fixed ``iters`` like the Spark
    query; rounded to 6 dp on both sides."""
    parts = [
        _graph_cte_mat(sub=True),
        """, scal2 AS (SELECT count(*) AS n FROM deg),
pr0 AS (SELECT v, 1.0 / (SELECT n FROM scal2) AS rank FROM deg)""",
    ]
    for i in range(iters):
        parts.append(
            f""",
pr{i + 1} AS MATERIALIZED (
  SELECT d.v,
         ({1.0 - alpha} / (SELECT n FROM scal2)) + {alpha} * COALESCE(c.in_sum, 0.0) AS rank
  FROM deg d LEFT JOIN (
    SELECT s.w AS v, sum(p.rank / dd.degree) AS in_sum
    FROM pr{i} p JOIN sym s ON p.v = s.v JOIN deg dd ON p.v = dd.v
    GROUP BY s.w
  ) c ON d.v = c.v
)"""
        )
    parts.append(f" SELECT v, round(rank, 6) AS rank FROM pr{iters}")
    return "".join(parts)


def _micro_sql() -> str:
    return (
        "WITH "
        + _SQL_EDGES_SUB
        + ","
        + _SQL_GRAPH_COMMON
        + ","
        + _SQL_KERNEL
        + """
SELECT LEAST(v, u) AS src, GREATEST(v, u) AS dst,
       tri AS triangle,
       (deg_v - tri - 1) + (deg_u - tri - 1) AS two_star,
       cliq AS clique4,
       tri * (tri - 1) // 2 - cliq AS chordal_cycle4,
       CAST(0 AS BIGINT) AS tailed_tri4,
       cyc AS cycle4,
       (deg_v - tri - 1) * (deg_v - tri - 2) // 2
         + (deg_u - tri - 1) * (deg_u - tri - 2) // 2 AS star3,
       (deg_v - tri - 1) * (deg_u - tri - 1) - cyc AS path4
FROM kernel"""
    )


def _macro_sql(edges_cte: str | None = None, include_cc: bool = True) -> str:
    """Full 17-total macro census SQL over an ``edges`` CTE (default:
    the co-purchase subgraph); ``include_cc`` appends wedges/global_cc."""
    tail = (
        """,
       CAST(3 * tris + star2 AS BIGINT) AS total_wedges,
       round(3.0 * tris / (3 * tris + star2), 6) AS global_cc
FROM closure3"""
        if include_cc
        else "\nFROM closure3"
    )
    return (
        "WITH "
        + (edges_cte if edges_cte is not None else _SQL_EDGES_SUB)
        + ","
        + _SQL_GRAPH_COMMON
        + ","
        + _SQL_KERNEL
        + """,
scal AS (SELECT (SELECT count(*) FROM deg) AS n, (SELECT count(*) FROM edges) AS m),
terms AS (
  SELECT k.tri, k.cliq, k.cyc,
         (k.deg_v - k.tri - 1) + (k.deg_u - k.tri - 1) AS star,
         s.n - ((k.deg_v - k.tri - 1) + (k.deg_u - k.tri - 1) + k.tri) - 2 AS disc,
         k.deg_v - k.tri - 1 AS rv, k.deg_u - k.tri - 1 AS ru,
         s.m - k.deg_v - k.deg_u + 1 AS n7_term
  FROM kernel k CROSS JOIN scal s
),
sums AS (
  SELECT sum(tri) AS s_tri, sum(star) AS s_star, sum(disc) AS s_disc,
         sum(cliq) AS s_cliq, sum(cyc) AS s_cyc,
         sum((tri + star) * (tri + star - 1) // 2) AS n1,
         sum(star * (star - 1) // 2) AS n2,
         sum(tri * (tri - 1) // 2) AS n3,
         sum(tri * star) AS n4,
         sum(rv * ru) AS n5,
         sum(rv * (rv - 1) // 2 + ru * (ru - 1) // 2) AS n6,
         sum(n7_term) AS n7,
         sum(disc * (disc - 1) // 2) AS n8,
         sum(star * disc) AS n9,
         sum(tri * disc) AS n10
  FROM terms
),
base AS (
  SELECT s.n, s.m,
         CAST(q.s_tri // 3 AS BIGINT) AS tris,
         CAST(q.s_star // 2 AS BIGINT) AS star2,
         CAST(q.s_disc AS BIGINT) AS e31,
         CAST(q.s_cliq // 6 AS BIGINT) AS cl4,
         CAST(q.n3 - 6 * (q.s_cliq // 6) AS BIGINT) AS cc4,
         CAST(q.s_cyc // 4 AS BIGINT) AS cy4,
         q.* FROM sums q CROSS JOIN scal s
),
closure AS (
  SELECT n, m, tris, star2, e31, cl4, cc4, cy4,
         n5 - 4 * cy4 AS p4,
         (n4 - 4 * cc4) // 2 AS tt4,
         n1, n2, n3, n4, n5, n6, n7, n8, n9, n10
  FROM base
),
closure2 AS (
  SELECT *,
         (n6 - tt4) // 3 AS st3,
         (n7 - 6 * cl4 - 4 * cy4 - 4 * cc4 - 2 * p4 - 2 * tt4) // 2 AS e42
  FROM closure
),
closure3 AS (
  SELECT *,
         n8 - 2 * e42 AS e41,
         (n9 - 2 * p4) // 2 AS s42,
         (n10 - tt4) // 3 AS t4
  FROM closure2
)
SELECT CAST(m AS BIGINT) AS total_2_1edge,
       CAST(n * (n - 1) // 2 - m AS BIGINT) AS total_2_indep,
       CAST(tris AS BIGINT) AS total_3_tris,
       CAST(star2 AS BIGINT) AS total_2_star,
       CAST(e31 AS BIGINT) AS total_3_1edge,
       CAST(n * (n - 1) * (n - 2) // 6 - (tris + star2 + e31) AS BIGINT) AS total_3_indep,
       CAST(cl4 AS BIGINT) AS total_4_clique,
       CAST(cc4 AS BIGINT) AS total_4_chordcycle,
       CAST(tt4 AS BIGINT) AS total_4_tailed_tris,
       CAST(cy4 AS BIGINT) AS total_4_cycle,
       CAST(st3 AS BIGINT) AS total_3_star,
       CAST(p4 AS BIGINT) AS total_4_path,
       CAST(e41 AS BIGINT) AS total_4_1edge,
       CAST(e42 AS BIGINT) AS total_4_2edge,
       CAST(s42 AS BIGINT) AS total_4_2star,
       CAST(t4 AS BIGINT) AS total_4_tri,
       CAST(n * (n - 1) * (n - 2) * (n - 3) // 24
            - (cl4 + cc4 + tt4 + cy4 + st3 + p4 + e41 + e42 + s42 + t4) AS BIGINT) AS total_4_indep"""
        + tail
    )


_DOC_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"

_SQL_SHINGLES = f"""
norm AS (SELECT doc_id AS id, {_DOC_NORM} AS t FROM documents),
sh AS (
  SELECT DISTINCT id, substr(t, i, 3) AS shingle
  FROM (SELECT id, t, unnest(generate_series(1, greatest(length(t) - 2, 1))) AS i FROM norm)
  WHERE length(substr(t, i, 3)) > 0
),
sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id)"""


def oracle_sql() -> dict[str, str]:
    full = _graph_cte(sub=False)
    sub = _graph_cte(sub=True)
    o: dict[str, str] = {}
    o["g_edges"] = full + " SELECT src, dst FROM edges"
    o["g_degrees"] = full + " SELECT v, degree FROM deg"
    o["g_degree_stats"] = (
        full
        + """
SELECT (SELECT count(*) FROM deg) AS n_vertices,
       (SELECT count(*) FROM edges) AS n_edges,
       (SELECT max(degree) FROM deg) AS max_degree,
       round((SELECT avg(degree) FROM deg), 6) AS avg_degree,
       round(2.0 * (SELECT count(*) FROM edges)
             / ((SELECT count(*) FROM deg) * ((SELECT count(*) FROM deg) - 1.0)), 6) AS density"""
    )
    o["g_triangles_per_edge"] = (
        full
        + """,
tri AS (
  SELECT e.src, e.dst, count(*) AS c
  FROM edges e JOIN sym s1 ON s1.v = e.src JOIN sym s2 ON s2.v = e.dst AND s2.w = s1.w
  GROUP BY e.src, e.dst
)
SELECT e.src, e.dst, COALESCE(t.c, 0) AS tri
FROM edges e LEFT JOIN tri t ON e.src = t.src AND e.dst = t.dst"""
    )
    o["g_triangle_stats"] = (
        full
        + """,
tri AS (
  SELECT e.src, e.dst, count(*) AS c
  FROM edges e JOIN sym s1 ON s1.v = e.src JOIN sym s2 ON s2.v = e.dst AND s2.w = s1.w
  GROUP BY e.src, e.dst
),
agg AS (
  SELECT COALESCE(sum(c), 0) // 3 AS triangles,
         (SELECT sum(degree * (degree - 1) // 2) FROM deg) - COALESCE(sum(c), 0) AS two_stars
  FROM tri
)
SELECT CAST(triangles AS BIGINT) AS triangles,
       CAST(two_stars AS BIGINT) AS two_stars,
       CAST(3 * triangles + two_stars AS BIGINT) AS wedges,
       round(3.0 * triangles / (3 * triangles + two_stars), 6) AS global_cc
FROM agg"""
    )
    o["g_assortativity"] = (
        full
        + """,
j AS (
  SELECT ds.degree AS dv, dd.degree AS du
  FROM edges e JOIN deg ds ON e.src = ds.v JOIN deg dd ON e.dst = dd.v
),
s AS (
  SELECT sum(CAST(dv AS DOUBLE) * du) AS mu,
         sum((dv + du) / 2.0) AS jd,
         sum((CAST(dv AS DOUBLE) * dv + CAST(du AS DOUBLE) * du) / 2.0) AS psi,
         count(*) AS m
  FROM j
)
SELECT round(CASE
  WHEN m = 0 THEN 0.0
  WHEN (psi / m - (jd / m) * (jd / m)) = 0 THEN 1.0
  WHEN ((mu / m - (jd / m) * (jd / m)) / (psi / m - (jd / m) * (jd / m))) < -1
    OR ((mu / m - (jd / m) * (jd / m)) / (psi / m - (jd / m) * (jd / m))) > 1 THEN 1.0
  ELSE (mu / m - (jd / m) * (jd / m)) / (psi / m - (jd / m) * (jd / m))
END, 6) AS r
FROM s"""
    )
    o["g_macro_counts"] = _macro_sql()
    o["g_micro_counts"] = _micro_sql()
    # approximate census: per-edge kernel restricted to the portable
    # hash-sampled edge set, HT-scaled by the realized inclusion rate,
    # same floor(x+0.5) rounding as the engine (approximate.py)
    from pgd_spark.operators.approximate import SAMPLE_A1, SAMPLE_A2, SAMPLE_MOD

    _lim = int(0.5 * 1_000_003)
    o["g_approx_census"] = (
        _graph_cte_mat(sub=True)
        + ","
        + _SQL_KERNEL
        + f""",
mstat AS (SELECT count(*) AS m FROM edges),
samp AS (
  SELECT * FROM kernel
  WHERE ((((LEAST(v, u) % {SAMPLE_MOD}) * {SAMPLE_A1}) % {SAMPLE_MOD}
        + ((GREATEST(v, u) % {SAMPLE_MOD}) * {SAMPLE_A2}) % {SAMPLE_MOD}
        + 7) % {SAMPLE_MOD}) % 1000003 < {_lim}
),
agg AS (SELECT count(*) AS sc, sum(tri) AS s_tri, sum(cliq) AS s_cliq FROM samp)
SELECT CAST(floor((s_tri * (CAST(m AS DOUBLE) / sc)) / 3 + 0.5) AS BIGINT) AS total_3_tris,
       CAST(floor((s_cliq * (CAST(m AS DOUBLE) / sc)) / 6 + 0.5) AS BIGINT) AS total_4_clique,
       m AS total_2_1edge
FROM agg, mstat"""
    )
    o["g_kcore"] = _kcore_sql()
    o["g_label_propagation"] = _lpa_sql()
    o["g_pagerank"] = _pagerank_sql()
    o["g_vertex_micro"] = (
        "WITH "
        + _SQL_EDGES_SUB
        + ","
        + _SQL_GRAPH_COMMON
        + ","
        + _SQL_KERNEL
        + """,
pere AS (
  SELECT v, u, tri, cliq, cyc, deg_v, deg_u,
         tri * (tri - 1) // 2 - cliq AS chordal,
         (deg_v - tri - 1) * (deg_u - tri - 1) - cyc AS path4,
         tri * (tri - 1) // 2 AS tri_pairs
  FROM kernel
),
ends AS (
  SELECT v AS x, tri, cliq, cyc, chordal, path4, tri_pairs, deg_u - 1 - tri AS leaf FROM pere
  UNION ALL
  SELECT u, tri, cliq, cyc, chordal, path4, tri_pairs, deg_v - 1 - tri FROM pere
),
vagg AS (
  SELECT x AS v,
         CAST(sum(tri) // 2 AS BIGINT) AS tri_cont,
         CAST(sum(cliq) // 3 AS BIGINT) AS clique4_cont,
         CAST(sum(cyc) // 2 AS BIGINT) AS cycle4_cont,
         CAST(sum(chordal) AS BIGINT) AS chordal_chord,
         CAST(sum(path4) AS BIGINT) AS path4_mid_end,
         CAST(sum(tri_pairs) AS BIGINT) AS tp,
         CAST(sum(leaf) AS BIGINT) AS star2_leaf
  FROM ends GROUP BY x
)
SELECT d.v, a.tri_cont, a.clique4_cont, a.cycle4_cont,
       CAST(d.degree * (d.degree - 1) // 2 - a.tri_cont AS BIGINT) AS star2_center,
       a.star2_leaf,
       CAST(d.degree * (d.degree - 1) * (d.degree - 2) // 6
            - a.tri_cont * (d.degree - 2) + a.tp - a.clique4_cont AS BIGINT) AS star3_center,
       a.chordal_chord, a.path4_mid_end
FROM deg d JOIN vagg a ON d.v = a.v"""
    )
    o["g_edge_ordering"] = (
        sub
        + """
SELECT e.src, e.dst, CAST(ds.degree + dd.degree AS DOUBLE) AS order_value
FROM edges e JOIN deg ds ON e.src = ds.v JOIN deg dd ON e.dst = dd.v"""
    )
    o["g_triangle_per_vertex"] = (
        full
        + """,
tri AS (
  SELECT e.src, e.dst, count(*) AS c
  FROM edges e JOIN sym s1 ON s1.v = e.src JOIN sym s2 ON s2.v = e.dst AND s2.w = s1.w
  GROUP BY e.src, e.dst
),
etri AS (
  SELECT e.src, e.dst, COALESCE(t.c, 0) AS tri
  FROM edges e LEFT JOIN tri t ON e.src = t.src AND e.dst = t.dst
),
ends AS (
  SELECT src AS v, tri FROM etri UNION ALL SELECT dst, tri FROM etri
)
SELECT d.v, CAST(COALESCE(sum(e.tri), 0) // 2 AS BIGINT) AS triangles
FROM deg d LEFT JOIN ends e ON d.v = e.v GROUP BY d.v"""
    )
    o["g_connected_components"] = (
        sub
        + """,
reach AS (
  SELECT src AS v, dst AS w FROM edges UNION
  SELECT dst, src FROM edges UNION
  SELECT v, v FROM deg
),
cc AS (
  WITH RECURSIVE r(v, w) AS (
    SELECT v, w FROM reach
    UNION
    SELECT r.v, e.w FROM r JOIN reach e ON r.w = e.v
  )
  SELECT v, min(w) AS component FROM r GROUP BY v
)
SELECT v, component FROM cc"""
    )
    o["g_connected_components_two_phase"] = o["g_connected_components"]
    o["g_gfd"] = (
        "WITH mac AS (" + _macro_sql() + """)
SELECT
  round(CAST(total_4_clique AS DOUBLE) / cs, 6) AS gfd_clique4,
  round(CAST(total_4_chordcycle AS DOUBLE) / cs, 6) AS gfd_chordal4,
  round(CAST(total_4_tailed_tris AS DOUBLE) / cs, 6) AS gfd_tailed4,
  round(CAST(total_4_cycle AS DOUBLE) / cs, 6) AS gfd_cycle4,
  round(CAST(total_3_star AS DOUBLE) / cs, 6) AS gfd_star3,
  round(CAST(total_4_path AS DOUBLE) / cs, 6) AS gfd_path4,
  round(CAST(total_4_tri AS DOUBLE) / ds, 6) AS gfd_tri4,
  round(CAST(total_4_2star AS DOUBLE) / ds, 6) AS gfd_star2_4,
  round(CAST(total_4_2edge AS DOUBLE) / ds, 6) AS gfd_edge2_4,
  round(CAST(total_4_1edge AS DOUBLE) / ds, 6) AS gfd_edge1_4,
  round(1.0 - (CAST(total_4_tri AS DOUBLE) / ds
             + CAST(total_4_2star AS DOUBLE) / ds
             + CAST(total_4_2edge AS DOUBLE) / ds
             + CAST(total_4_1edge AS DOUBLE) / ds), 6) AS gfd_indep4
FROM (
  SELECT m.*,
         CAST(total_4_clique + total_4_chordcycle + total_4_tailed_tris
              + total_4_cycle + total_3_star + total_4_path AS DOUBLE) AS cs,
         CAST(total_4_tri + total_4_2star + total_4_2edge
              + total_4_1edge + total_4_indep AS DOUBLE) AS ds
  FROM mac m
)"""
    )
    o["events_graph_edges"] = """
WITH typed AS (
  SELECT user_id, event_type, ts, event_id,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
),
tids AS (
  SELECT event_type, 1000000000 + dense_rank() OVER (ORDER BY event_type) AS tid
  FROM (SELECT DISTINCT event_type FROM events)
),
a AS (
  SELECT t1.tid AS x, t2.tid AS y
  FROM typed JOIN tids t1 ON typed.event_type = t1.event_type
             JOIN tids t2 ON typed.next_type = t2.event_type
  WHERE typed.next_type IS NOT NULL
),
b AS (
  SELECT typed.user_id AS x, t1.tid AS y
  FROM typed JOIN tids t1 ON typed.event_type = t1.event_type
),
allp AS (SELECT x, y FROM a UNION ALL SELECT x, y FROM b)
SELECT DISTINCT LEAST(x, y) AS src, GREATEST(x, y) AS dst
FROM allp WHERE x <> y"""
    o["doc_token_count"] = f"""
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_words,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(greatest(
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END,
         CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS n_tokens_est
FROM documents"""
    o["doc_quality"] = """
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS chars,
         greatest(CAST(length(text) AS DOUBLE), 1.0) AS nz,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct_n,
         length(regexp_replace(text, '[^A-Z]', '', 'g')) AS upper_n,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS digit_n
  FROM documents
)
SELECT doc_id,
       round(least(chars / 500.0, 1.0), 6) AS len_score,
       round(punct_n / nz, 6) AS punct_ratio,
       round(upper_n / nz, 6) AS upper_ratio,
       round(digit_n / nz, 6) AS digit_ratio,
       round(least(greatest(0.0, least(chars / 500.0, 1.0) - (punct_n / nz) * 2.0
             - greatest(upper_n / nz - 0.3, 0.0) - digit_n / nz), 1.0), 6) AS quality
FROM t"""
    # langid: marker counting — same formula in SQL
    lang_exprs = []
    for lang, markers in {
        "en": [" the ", " and ", " of ", " to ", " is "],
        "de": [" der ", " die ", " und ", " ist ", " das "],
        "fr": [" le ", " la ", " et ", " est ", " les "],
        "es": [" el ", " la ", " que ", " los ", " es "],
    }.items():
        parts = [
            f"(length(p) - length(replace(p, '{m}', ''))) / {len(m)}" for m in markers
        ]
        lang_exprs.append(f"CAST({' + '.join(parts)} AS BIGINT) AS hits_{lang}")
    o["doc_langid"] = f"""
WITH padded AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents),
h AS (SELECT doc_id, {', '.join(lang_exprs)} FROM padded),
b AS (SELECT doc_id, hits_en, hits_de, hits_fr, hits_es,
             greatest(hits_en, hits_de, hits_fr, hits_es) AS best FROM h)
SELECT doc_id,
       CASE WHEN best = 0 THEN 'und'
            WHEN hits_en = best THEN 'en'
            WHEN hits_de = best THEN 'de'
            WHEN hits_fr = best THEN 'fr'
            ELSE 'es' END AS lang_guess,
       best AS lang_hits
FROM b"""
    o["doc_fingerprint"] = f"SELECT doc_id, md5({_DOC_NORM}) AS fp_md5 FROM documents"
    # multimodal fake-decode: payload = hex(sha256('image'||id)) bytes,
    # meta bytes = sha256(payload); byte k = hex pair 2k+1 of the digest
    o["multimodal_meta"] = """
WITH t AS (
  SELECT doc_id, sha256(sha256('image' || CAST(doc_id AS VARCHAR))) AS hh
  FROM documents
)
SELECT doc_id,
       CAST(64 + CAST('0x' || substr(hh, 1, 2) AS INT) * 8 AS INT) AS width,
       CAST(64 + CAST('0x' || substr(hh, 3, 2) AS INT) * 8 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST('0x' || substr(hh, 5, 2) AS INT) / 255.0 AS mean_luma,
       ['jpeg', 'png', 'webp'][1 + CAST('0x' || substr(hh, 7, 2) AS INT) % 3] AS format
FROM t"""
    o["doc_exact_dedup"] = f"""
WITH k AS (SELECT doc_id, md5({_DOC_NORM}) AS k FROM documents),
keep AS (SELECT k, min(doc_id) AS keep_id FROM k GROUP BY k)
SELECT k.doc_id, keep.keep_id, k.doc_id <> keep.keep_id AS is_dup
FROM k JOIN keep ON k.k = keep.k"""
    o["doc_ngram_jaccard"] = (
        "WITH "
        + _SQL_SHINGLES
        + """,
common AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT c.id_a, c.id_b,
       round(CAST(c.inter AS DOUBLE) / (sa.sz + sb.sz - c.inter), 6) AS jaccard
FROM common c JOIN sizes sa ON c.id_a = sa.id JOIN sizes sb ON c.id_b = sb.id
WHERE CAST(c.inter AS DOUBLE) / (sa.sz + sb.sz - c.inter) >= 0.55"""
    )
    # ---- transcript pipeline end-to-end: the generator is pure
    # portable integer/float arithmetic (transcripts.py), so the SQL
    # oracle replays generation → axis A+B derivation → vertex map →
    # normalization → full macro census, value-for-value
    from pgd_spark.sources.transcripts import N_TOOLS, ZIPF_S, _zipf_cdf

    cdf_lits = ", ".join(repr(x) for x in _zipf_cdf(N_TOOLS, ZIPF_S))
    u_expr = "((i * 2654435761 + turn_idx * 1103515245 + 12345) % 1000003) / 1000003.0"
    transcript_edges_cte = f"""conv AS (
  SELECT i, (i * 2654435761) % 28 + 5 AS n_turns FROM range(2000) t(i)
),
turns AS (
  SELECT i, unnest(generate_series(0, n_turns - 1)) AS turn_idx FROM conv
),
t2 AS (
  SELECT i, turn_idx,
         CASE WHEN turn_idx % 7 = 6 THEN 'agent' || CAST(i % 5 AS VARCHAR)
              WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN turn_idx % 3 = 1 THEN
           'tool' || lpad(CAST(len(list_filter([{cdf_lits}], p -> p < {u_expr})) AS VARCHAR), 2, '0')
         END AS tool
  FROM turns
),
ld AS (
  SELECT i, turn_idx, role, tool,
         lead(role) OVER (PARTITION BY i ORDER BY turn_idx) AS next_role
  FROM t2
),
pairs AS (
  SELECT 'r' AS k1, role AS n1, 'r' AS k2, next_role AS n2 FROM ld WHERE next_role IS NOT NULL
  UNION ALL
  SELECT 'r', role, 't', tool FROM ld WHERE tool IS NOT NULL
),
verts AS (
  SELECT DISTINCT kind, name FROM (
    SELECT 'r' AS kind, role AS name FROM t2
    UNION ALL
    SELECT 't', tool FROM t2 WHERE tool IS NOT NULL
  )
),
vmap AS (SELECT kind, name, row_number() OVER (ORDER BY kind, name) - 1 AS vid FROM verts),
raw_edges AS (
  SELECT v1.vid AS a, v2.vid AS b
  FROM pairs p
  JOIN vmap v1 ON v1.kind = p.k1 AND v1.name = p.n1
  JOIN vmap v2 ON v2.kind = p.k2 AND v2.name = p.n2
),
edges AS (
  SELECT DISTINCT least(a, b) AS src, greatest(a, b) AS dst FROM raw_edges WHERE a <> b
)"""
    o["transcript_graph_census"] = _macro_sql(edges_cte=transcript_edges_cte, include_cc=False)

    # ---- minhash / simhash: the engine's hash family is PORTABLE by
    # design (rolling hash mod 2^31-1 + seeded affine maps, see
    # pgd_spark.functions.dedup) — the oracle regenerates the identical
    # constants and replays the same arithmetic in SQL.
    from pgd_spark.functions.dedup import HASH_BASE, HASH_MOD, hash_family

    def _rh_sql(col: str) -> str:
        return (
            f"list_reduce(list_prepend(0::BIGINT, list_transform("
            f"string_split_regex({col}, ''), c -> unicode(c)::BIGINT)), "
            f"(a, b) -> (a * {HASH_BASE} + b) % {HASH_MOD})"
        )

    fam = hash_family(128, seed=42)
    min_exprs = ",\n       ".join(
        f"min(({a} * rh + {b}) % {HASH_MOD}) AS h{i}" for i, (a, b) in enumerate(fam)
    )
    band_selects = "\n  UNION ALL ".join(
        "SELECT id, {bi} AS band, concat_ws(',', {cols}) AS bucket FROM sig".format(
            bi=bi, cols=", ".join(f"h{bi * 8 + r}" for r in range(8))
        )
        for bi in range(16)
    )
    minhash_sql = (
        "WITH "
        + _SQL_SHINGLES
        + f""",
rh AS (SELECT id, {_rh_sql('shingle')} AS rh FROM sh),
sig AS (SELECT id,
       {min_exprs}
FROM rh GROUP BY id),
banded AS (
  {band_selects}
),
okb AS (SELECT band, bucket FROM banded GROUP BY band, bucket HAVING count(*) <= 1000),
banded2 AS (SELECT banded.* FROM banded JOIN okb USING (band, bucket)),
cand AS (
  SELECT DISTINCT x.id AS id_a, y.id AS id_b
  FROM banded2 x JOIN banded2 y ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.id = c.id_a
  JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       round(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i JOIN sizes sa ON i.id_a = sa.id JOIN sizes sb ON i.id_b = sb.id
WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= 0.7"""
    )
    o["doc_minhash_dedup"] = minhash_sql

    # ---- dup clusters: transitive closure of the SAME minhash pairs
    # via a recursive CTE (the engine side closes them with its Pregel
    # connected-components operator); canonical = component min, every
    # doc appears (singletons keep themselves)
    o["doc_dedup_clusters"] = f"""
WITH RECURSIVE mh_pairs AS (
  SELECT id_a, id_b FROM ({minhash_sql}) mh
),
e AS (
  SELECT id_a AS a, id_b AS b FROM mh_pairs
  UNION
  SELECT id_b, id_a FROM mh_pairs
),
r(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.a, e.b FROM r JOIN e ON r.b = e.a
),
comp AS (SELECT a AS doc_id, least(a, min(b)) AS canonical_id FROM r GROUP BY a)
SELECT d.doc_id,
       coalesce(c.canonical_id, d.doc_id) AS canonical_id,
       CASE WHEN coalesce(c.canonical_id, d.doc_id) = d.doc_id THEN 1 ELSE 0 END AS keep
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN comp c ON c.doc_id = d.doc_id"""

    sfam = hash_family(64, seed=42)
    bit_sums = ",\n       ".join(
        f"sum(CASE WHEN (({a} * rh + {c}) % {HASH_MOD}) % 2 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b, (a, c) in enumerate(sfam)
    )
    # unsigned 64-bit signature as HUGEINT; quarters by integer div/mod
    # (the engine packs into a signed long and shift-masks — same bits)
    uh = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN 1 ELSE 0 END)::HUGEINT * {1 << b}::HUGEINT"
        for b in range(64)
    )
    qcols = ", ".join(
        f"CAST((uh // {1 << (q * 16)}::HUGEINT) % 65536 AS BIGINT) AS q{q}" for q in range(4)
    )
    quarter_union = "\n  UNION ALL ".join(
        f"SELECT id, {q} AS q, q{q} AS qv, q0, q1, q2, q3 FROM quarts" for q in range(4)
    )
    o["doc_simhash"] = f"""
WITH norm AS (SELECT doc_id AS id, {_DOC_NORM} AS t FROM documents),
toks AS (
  SELECT id, tok FROM (SELECT id, unnest(string_split(t, ' ')) AS tok FROM norm)
  WHERE length(tok) > 0
),
rhs AS (SELECT id, {_rh_sql('tok')} AS rh FROM toks),
sums AS (SELECT id,
       {bit_sums}
FROM rhs GROUP BY id),
sig AS (SELECT id, {uh} AS uh FROM sums),
quarts AS (SELECT id, {qcols} FROM sig),
bq AS (
  {quarter_union}
),
cand AS (
  SELECT DISTINCT x.id AS id_a, y.id AS id_b,
         x.q0 AS xa0, x.q1 AS xa1, x.q2 AS xa2, x.q3 AS xa3,
         y.q0 AS ya0, y.q1 AS ya1, y.q2 AS ya2, y.q3 AS ya3
  FROM bq x JOIN bq y ON x.q = y.q AND x.qv = y.qv AND x.id < y.id
)
SELECT id_a, id_b,
       bit_count(xor(xa0, ya0)) + bit_count(xor(xa1, ya1))
     + bit_count(xor(xa2, ya2)) + bit_count(xor(xa3, ya3)) AS hamming
FROM cand
WHERE bit_count(xor(xa0, ya0)) + bit_count(xor(xa1, ya1))
    + bit_count(xor(xa2, ya2)) + bit_count(xor(xa3, ya3)) <= 8"""

    # ---- LSH ANN: the hyperplanes are seeded constants — regenerate
    # the identical planes and bake them into the SQL as literals; the
    # bucket join, exact re-score, and top-k replay in SQL
    from pgd_spark.functions.similarity import _hyperplanes

    def _bucket_sql(vcol: str, planes: list[list[float]]) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({vcol}, [{', '.join(repr(x) for x in p)}]) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )

    def _bucket_union(src: str, idc: str, vcol: str) -> str:
        return "\n    UNION ALL ".join(
            f"SELECT {idc}, {vcol}, {t} AS t, {_bucket_sql(vcol, _hyperplanes(64, 8, t, 42))} AS b FROM {src}"
            for t in range(6)
        )

    o["emb_lsh_topk"] = f"""
WITH it AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
qs AS (SELECT vec_id AS query_id, v AS q FROM it WHERE vec_id < 10),
ib AS (
    {_bucket_union('it', 'vec_id', 'v')}
),
qb AS (
    {_bucket_union('qs', 'query_id', 'q')}
),
cand AS (
  SELECT DISTINCT qb.query_id, ib.vec_id
  FROM ib JOIN qb ON ib.t = qb.t AND ib.b = qb.b
),
scored AS (
  SELECT c.query_id, c.vec_id, list_cosine_similarity(it.v, qs.q) AS sim
  FROM cand c JOIN it ON it.vec_id = c.vec_id JOIN qs ON qs.query_id = c.query_id
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 5"""

    # ---- embedding near-dup: same seeded planes (bits=4, tables=8),
    # bucket SELF-join + bucket-size cap + exact cosine threshold —
    # replays the operator value-for-value
    nd_union = "\n    UNION ALL ".join(
        f"SELECT {t} AS t, {_bucket_sql('v', _hyperplanes(64, 4, t, 42))} AS b, vec_id AS id FROM it"
        for t in range(8)
    )
    o["emb_neardup"] = f"""
WITH it AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
hashed AS (
    {nd_union}
),
counts AS (SELECT t, b, count(*) AS c FROM hashed GROUP BY t, b),
keyed AS (SELECT h.* FROM hashed h JOIN counts c USING (t, b) WHERE c.c <= 400),
cand AS (
  SELECT DISTINCT x.id AS id_a, y.id AS id_b
  FROM keyed x JOIN keyed y ON x.t = y.t AND x.b = y.b AND x.id < y.id
),
scored AS (
  SELECT c.id_a, c.id_b, list_cosine_similarity(a.v, b.v) AS sim
  FROM cand c JOIN it a ON a.vec_id = c.id_a JOIN it b ON b.vec_id = c.id_b
)
SELECT id_a, id_b, round(sim, 6) AS sim FROM scored WHERE sim >= 0.45"""

    # ---- IVF ANN: centroid selection is a portable hash-min sample,
    # assignment/probe/re-score are plain cosine argmax — the whole
    # index build and search replay in SQL
    from pgd_spark.functions.similarity import IVF_A, IVF_MOD

    o["emb_ivf_topk"] = f"""
WITH it AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
cent AS (
  SELECT vec_id AS cid, v AS cvec FROM it
  ORDER BY ({IVF_A} * (vec_id % {IVF_MOD})) % {IVF_MOD} ASC, vec_id ASC
  LIMIT 32
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT it.vec_id, c.cid,
           row_number() OVER (PARTITION BY it.vec_id
             ORDER BY list_cosine_similarity(it.v, c.cvec) DESC, c.cid ASC) AS rn
    FROM it CROSS JOIN cent c
  ) WHERE rn = 1
),
qs AS (SELECT vec_id AS query_id, v AS q FROM it WHERE vec_id < 10),
probes AS (
  SELECT query_id, cid FROM (
    SELECT qs.query_id, c.cid,
           row_number() OVER (PARTITION BY qs.query_id
             ORDER BY list_cosine_similarity(qs.q, c.cvec) DESC, c.cid ASC) AS rn
    FROM qs CROSS JOIN cent c
  ) WHERE rn <= 8
),
scored AS (
  SELECT p.query_id, a.vec_id, list_cosine_similarity(it.v, qs.q) AS sim
  FROM probes p JOIN asg a ON a.cid = p.cid
  JOIN it ON it.vec_id = a.vec_id JOIN qs ON qs.query_id = p.query_id
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 5"""

    o["emb_cosine_topk"] = """
WITH it AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
qs AS (SELECT vec_id AS query_id, v AS q FROM it WHERE vec_id < 10),
scored AS (
  SELECT qs.query_id, it.vec_id,
         list_cosine_similarity(it.v, qs.q) AS sim
  FROM it CROSS JOIN qs
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 5"""
    return o
