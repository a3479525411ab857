import random

import networkx as nx
import pytest

from pgd_spark.operators.kcore import kcore, max_core
from tests.conftest import make_graph


def gnp(n, p, seed):
    rng = random.Random(seed)
    return [(i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < p]


@pytest.mark.parametrize("n,p,seed", [(30, 0.15, 1), (40, 0.25, 2), (60, 0.08, 3)])
def test_kcore_vs_networkx(spark, n, p, seed):
    edges = gnp(n, p, seed)
    g = make_graph(spark, edges)
    got = {r["v"]: r["core"] for r in kcore(g).collect()}
    want = nx.core_number(nx.Graph(edges))
    assert got == want


def test_max_core_chain_plus_clique(spark):
    # chain (core 1) + K5 (core 4)
    edges = [(i, i + 1) for i in range(10)]
    edges += [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]
    g = make_graph(spark, edges)
    assert max_core(g) == 4
    got = {r["v"]: r["core"] for r in kcore(g).collect()}
    assert got[0] == 1 and got[100] == 4
