"""Property tests: engine vs exhaustive brute-force census on random
graphs, plus the reference's ten ΣN_i identities (cpp:1275-1305)."""

import random

import pytest

from pgd_spark.operators.graphlets import (
    check_identities,
    macro_counts,
    micro_counts,
)
from tests.conftest import make_graph
from tests.oracle import census, micro


def gnp(n, p, seed):
    rng = random.Random(seed)
    return [(i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < p]


CASES = [(12, 0.3, 1), (20, 0.25, 2), (30, 0.15, 3), (25, 0.5, 4), (40, 0.1, 5)]


@pytest.mark.parametrize("n,p,seed", CASES)
@pytest.mark.parametrize("strategy", ["broadcast", "distributed"])
def test_macro_vs_bruteforce(spark, n, p, seed, strategy):
    edges = gnp(n, p, seed)
    if not edges:
        pytest.skip("empty graph")
    g = make_graph(spark, edges)
    got = macro_counts(g, strategy=strategy)
    want = census(edges)
    for k, v in want.items():
        if k == "global_cc":
            assert got[k] == pytest.approx(v)
        else:
            assert got[k] == v, (k, got[k], v)
    assert all(check_identities(got).values())


@pytest.mark.parametrize("n,p,seed", CASES[:3])
@pytest.mark.parametrize("quirk", [True, False])
def test_micro_vs_bruteforce(spark, n, p, seed, quirk):
    edges = gnp(n, p, seed)
    g = make_graph(spark, edges)
    rows = micro_counts(g, strategy="broadcast", pgd_quirk=quirk).collect()
    got = {
        (r["src"], r["dst"]): (
            r["triangle"], r["two_star"], r["clique4"], r["chordal_cycle4"],
            r["tailed_tri4"], r["cycle4"], r["star3"], r["path4"],
        )
        for r in rows
    }
    assert got == micro(edges, pgd_quirk=quirk)


def test_barabasi_albert_like(spark):
    # preferential-attachment-ish graph: denser hubs exercise skew paths
    rng = random.Random(42)
    edges, targets = [], [0, 1, 2]
    for v in range(3, 60):
        for t in rng.sample(targets, 3):
            edges.append((v, t))
        targets.extend([v] * 3)
    g = make_graph(spark, edges)
    got = macro_counts(g, strategy="distributed")
    want = census(edges)
    for k in want:
        if k != "global_cc":
            assert got[k] == want[k], k
