"""Two-phase (large-star/small-star) connected components vs hash-min
and networkx; high-diameter graph shows the O(log n) round count."""

import random

import networkx as nx

from pgd_spark.operators.pregel import IterationLog, connected_components
from tests.conftest import make_graph


def gnp(n, p, seed):
    rng = random.Random(seed)
    return [(i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < p]


def _labels(df):
    return {r["v"]: r["component"] for r in df.collect()}


def test_two_phase_matches_hashmin(spark):
    edges = gnp(40, 0.08, 3) + [(a + 500, b + 500) for a, b in gnp(25, 0.15, 4)]
    g = make_graph(spark, edges)
    a = _labels(connected_components(g, algorithm="hashmin"))
    b = _labels(connected_components(g, algorithm="two_phase"))
    assert a == b
    G = nx.Graph(edges)
    for comp in nx.connected_components(G):
        assert {b[v] for v in comp} == {min(comp)}


def test_two_phase_high_diameter_logn_rounds(spark):
    # path graph of 300 vertices: diameter 299 — hash-min needs ~300
    # rounds; two-phase converges in O(log n)
    edges = [(i, i + 1) for i in range(300)]
    g = make_graph(spark, edges)
    log = IterationLog()
    out = _labels(connected_components(g, algorithm="two_phase", log=log, max_iter=30))
    assert set(out.values()) == {0}
    assert len(log.entries) <= 12, len(log.entries)


def test_two_phase_resume(spark, tmp_path):
    edges = gnp(30, 0.1, 9)
    g = make_graph(spark, edges)
    ck = str(tmp_path / "cc2")
    full = _labels(connected_components(g, algorithm="two_phase"))
    # interrupted run then resume — identical result
    connected_components(g, algorithm="two_phase", checkpoint_dir=ck, max_iter=1)
    resumed = _labels(connected_components(g, algorithm="two_phase", checkpoint_dir=ck))
    assert resumed == full
