"""Pregel-loop oracle tests: PageRank vs networkx (allclose 1e-6),
connected components exact, LPA vs a deterministic pure-Python
implementation, checkpoint/resume identity."""

import random

import networkx as nx
import pytest

from pgd_spark.operators.pregel import (
    connected_components,
    label_propagation,
    pagerank,
    triangle_count_per_vertex,
)
from tests.conftest import make_graph


def gnp(n, p, seed):
    rng = random.Random(seed)
    return [(i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < p]


def two_component_graph():
    e = gnp(30, 0.15, 7)
    e += [(a + 100, b + 100) for a, b in gnp(20, 0.2, 8)]
    return e


def _pagerank_oracle(edges, alpha=0.85, iters=1000):
    """numpy power iteration — the published algorithm, independent of
    the engine (scipy/nx.pagerank unavailable in this image)."""
    import numpy as np

    verts = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    deg = np.zeros(n)
    for a, b in edges:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        share = r / deg
        nxt = np.full(n, (1 - alpha) / n)
        for a, b in edges:
            nxt[idx[b]] += alpha * share[idx[a]]
            nxt[idx[a]] += alpha * share[idx[b]]
        if np.abs(nxt - r).sum() < 1e-12 * n:
            r = nxt
            break
        r = nxt
    return {v: r[idx[v]] for v in verts}


def test_pagerank_vs_oracle(spark):
    edges = two_component_graph()
    g = make_graph(spark, edges)
    got = {r["v"]: r["rank"] for r in pagerank(g, tol=1e-9).collect()}
    want = _pagerank_oracle(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_connected_components_exact(spark):
    edges = two_component_graph()
    g = make_graph(spark, edges)
    got = {r["v"]: r["component"] for r in connected_components(g).collect()}
    G = nx.Graph(edges)
    for comp in nx.connected_components(G):
        labels = {got[v] for v in comp}
        assert len(labels) == 1
        assert labels == {min(comp)}


def _lpa_oracle(edges, max_iter):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(max_iter):
        new = {}
        for v in adj:
            counts = {}
            for w in adj[v]:
                counts[labels[w]] = counts.get(labels[w], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        if new == labels:
            break
        labels = new
    return labels


@pytest.mark.parametrize("iters", [1, 3, 5])
def test_lpa_matches_oracle(spark, iters):
    edges = two_component_graph()
    g = make_graph(spark, edges)
    got = {r["v"]: r["label"] for r in label_propagation(g, max_iter=iters).collect()}
    want = _lpa_oracle(edges, iters)
    assert got == want


def test_pagerank_resume_from_checkpoint(spark, tmp_path):
    edges = gnp(25, 0.2, 11)
    g = make_graph(spark, edges)
    ckpt = str(tmp_path / "ck")
    # phase 1: stop early (simulates a killed run); tol=0 = fixed-iter
    # mode so resume identity isn't coupled to where the k-batched
    # convergence check happens to land
    pagerank(g, max_iter=3, checkpoint_dir=ckpt, tol=0.0)
    # phase 2: resume to the same fixed horizon as a fresh run
    resumed = {
        r["v"]: r["rank"]
        for r in pagerank(g, max_iter=10, tol=0.0, checkpoint_dir=ckpt).collect()
    }
    fresh = {r["v"]: r["rank"] for r in pagerank(g, max_iter=10, tol=0.0).collect()}
    for v in fresh:
        assert resumed[v] == pytest.approx(fresh[v], abs=1e-9)


def test_triangle_count_per_vertex(spark):
    edges = gnp(30, 0.25, 13)
    g = make_graph(spark, edges)
    got = {r["v"]: r["triangles"] for r in triangle_count_per_vertex(g).collect()}
    want = nx.triangles(nx.Graph(edges))
    want = {v: c for v, c in want.items() if v in got}
    assert got == want


def test_pagerank_hub_chunking(spark):
    """A celebrity vertex's adjacency row is split over ceil(deg/chunk)
    rows by pagerank_prepare(chunk=...); ranks must be bit-equal to the
    unchunked run (the groupBy re-sums all chunk contributions)."""
    from pgd_spark.operators.pregel import pagerank_prepare

    edges = [(0, i) for i in range(1, 201)] + [(1, 2), (3, 4), (5, 6), (2, 3)]
    g = make_graph(spark, edges)
    adj = pagerank_prepare(g, chunk=16)  # hub row -> 13 chunk rows
    try:
        nchunk = adj.count()
        nvert = g.num_vertices()
        assert nchunk > nvert  # the hub actually got split
        r_chunked = {r["v"]: r["rank"] for r in pagerank(g, tol=0.0, max_iter=15, adj=adj).collect()}
        r_plain = {r["v"]: r["rank"] for r in pagerank(g, tol=0.0, max_iter=15).collect()}
    finally:
        adj.unpersist()
    assert set(r_chunked) == set(r_plain)
    for v in r_plain:
        assert abs(r_chunked[v] - r_plain[v]) < 1e-12
