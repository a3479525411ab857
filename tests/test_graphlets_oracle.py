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


def test_corrected_tailed_hub_skew(spark):
    """micro_counts(pgd_quirk=False) on a hub graph: the corrected
    tailed pass now routes hub wedge vertices through edge-key pair
    probes (hot path) instead of funneling every hub row into one
    adjacency-intersect reducer — values must equal the brute-force
    oracle regardless of which physical route each vertex takes, with
    the hub far past the hot threshold."""
    rng = random.Random(9)
    hub_deg = 600  # >> max(256, 8*avg_deg): the hub takes the hot path
    edges = {(0, i) for i in range(1, hub_deg + 1)}
    # ring + chords among the spokes so W-sets have adjacent pairs
    for i in range(1, hub_deg, 2):
        edges.add((i, i % hub_deg + 1))
    edges |= {tuple(sorted(rng.sample(range(1, hub_deg + 1), 2))) for _ in range(400)}
    # a few pendant tails hanging off spokes (pure tailed-tri fodder)
    edges |= {(i, 10_000 + i) for i in range(1, 40)}
    edges = sorted(edges)
    g = make_graph(spark, edges)
    rows = micro_counts(g, strategy="distributed", pgd_quirk=False).collect()
    got = {
        (r["src"], r["dst"]): (
            r["triangle"], r["two_star"], r["clique4"], r["chordal_cycle4"],
            r["tailed_tri4"], r["cycle4"], r["star3"], r["path4"],
        )
        for r in rows
    }
    assert got == micro(edges, pgd_quirk=False)
    # and the per-edge tailed counts close against the macro total:
    # every induced tailed-triangle has exactly one tail edge
    total_tailed = sum(v[4] for v in got.values())
    from pgd_spark.operators.graphlets import macro_counts as _mc

    assert total_tailed == _mc(g, strategy="distributed")["total_4_tailed_tris"]
