"""Edge orderings (parity feature) and the edge-sampled approximate census."""

import random

import pytest

from pgd_spark.operators.approximate import approximate_macro_counts
from pgd_spark.operators.graphlets import macro_counts
from pgd_spark.operators.ordering import edge_ordering
from tests.conftest import make_graph


def gnp(n, p, seed):
    rng = random.Random(seed)
    return [(i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < p]


@pytest.mark.parametrize("strategy", ["natural", "rand", "degree", "degree_vol", "kcore", "kcore_degree"])
def test_orderings_cover_all_edges(spark, strategy):
    edges = gnp(20, 0.3, 5)
    g = make_graph(spark, edges)
    rows = edge_ordering(g, strategy).collect()
    assert len(rows) == g.num_edges()
    assert {(r["src"], r["dst"]) for r in rows} == {tuple(sorted(e)) for e in edges}


def test_ordering_direction(spark):
    edges = [(0, i) for i in range(1, 10)] + [(10, 11)]
    g = make_graph(spark, edges)
    desc = edge_ordering(g, "degree").collect()
    asc = edge_ordering(g, "degree", s2l=True).collect()
    assert desc[0]["order_value"] >= desc[-1]["order_value"]
    assert asc[0]["order_value"] <= asc[-1]["order_value"]


def test_approximate_full_fraction_is_exact(spark):
    edges = gnp(30, 0.2, 9)
    g = make_graph(spark, edges)
    exact = macro_counts(g)
    approx = approximate_macro_counts(g, fraction=1.0)
    for k in exact:
        if not k.startswith("_"):
            assert approx[k] == exact[k], k


def test_approximate_reasonable_at_half(spark):
    edges = gnp(60, 0.25, 10)
    g = make_graph(spark, edges)
    exact = macro_counts(g)
    approx = approximate_macro_counts(g, fraction=0.5, seed=1)
    # unbiased estimator; with ~50% of edges the big counts should land
    # within a loose relative band
    for k in ["total_3_tris", "total_2_star", "total_4_clique"]:
        if exact[k] >= 50:
            rel = abs(approx[k] - exact[k]) / exact[k]
            assert rel < 0.35, (k, approx[k], exact[k])
    assert approx["total_2_1edge"] == exact["total_2_1edge"]  # m stays exact
