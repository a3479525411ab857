"""Golden-output tests: macro totals + per-edge micro counts on the
reference-bundled tiny graphs (FIXTURES.md §3-4), both kernel paths."""

import pytest

from pgd_spark.operators.graphlets import (
    check_identities,
    edge_graphlet_counts,
    macro_counts,
    micro_counts,
)
from tests.conftest import make_graph

K4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
DIAMOND = [(1, 2), (1, 3), (1, 4), (2, 3), (3, 4)]
K4_EDGE = K4 + [(4, 5)]

GOLDEN_MACRO = {
    "K4": dict(total_2_1edge=6, total_2_indep=0, total_3_tris=4, total_2_star=0,
               total_3_1edge=0, total_3_indep=0, total_4_clique=1, total_4_chordcycle=0,
               total_4_tailed_tris=0, total_4_cycle=0, total_3_star=0, total_4_path=0,
               total_4_1edge=0, total_4_2edge=0, total_4_2star=0, total_4_tri=0,
               total_4_indep=0, total_wedges=12, global_cc=1.0),
    "DIAMOND": dict(total_2_1edge=5, total_2_indep=1, total_3_tris=2, total_2_star=2,
                    total_3_1edge=0, total_3_indep=0, total_4_clique=0, total_4_chordcycle=1,
                    total_4_tailed_tris=0, total_4_cycle=0, total_3_star=0, total_4_path=0,
                    total_4_1edge=0, total_4_2edge=0, total_4_2star=0, total_4_tri=0,
                    total_4_indep=0, total_wedges=8, global_cc=0.75),
    "K4_EDGE": dict(total_2_1edge=7, total_2_indep=3, total_3_tris=4, total_2_star=3,
                    total_3_1edge=3, total_3_indep=0, total_4_clique=1, total_4_chordcycle=0,
                    total_4_tailed_tris=3, total_4_cycle=0, total_3_star=0, total_4_path=0,
                    total_4_1edge=0, total_4_2edge=0, total_4_2star=0, total_4_tri=1,
                    total_4_indep=0, total_wedges=15, global_cc=0.8),
}

GRAPHS = {"K4": K4, "DIAMOND": DIAMOND, "K4_EDGE": K4_EDGE}

GOLDEN_MICRO = {
    # (src,dst) -> (triangle, two_star, clique4, chordal4, tailed4, cycle4, star3, path4)
    "K4": {e: (2, 0, 1, 0, 0, 0, 0, 0) for e in K4},
    "DIAMOND": {
        (1, 2): (1, 1, 0, 0, 0, 0, 0, 0),
        (1, 3): (2, 0, 0, 1, 0, 0, 0, 0),
        (1, 4): (1, 1, 0, 0, 0, 0, 0, 0),
        (2, 3): (1, 1, 0, 0, 0, 0, 0, 0),
        (3, 4): (1, 1, 0, 0, 0, 0, 0, 0),
    },
    "K4_EDGE": {
        (1, 2): (2, 0, 1, 0, 0, 0, 0, 0),
        (1, 3): (2, 0, 1, 0, 0, 0, 0, 0),
        (2, 3): (2, 0, 1, 0, 0, 0, 0, 0),
        (1, 4): (2, 1, 1, 0, 0, 0, 0, 0),
        (2, 4): (2, 1, 1, 0, 0, 0, 0, 0),
        (3, 4): (2, 1, 1, 0, 0, 0, 0, 0),
        (4, 5): (0, 3, 0, 0, 0, 0, 3, 0),
    },
}


@pytest.mark.parametrize("name", list(GRAPHS))
@pytest.mark.parametrize("strategy", ["broadcast", "distributed"])
def test_macro_golden(spark, name, strategy):
    g = make_graph(spark, GRAPHS[name])
    got = macro_counts(g, strategy=strategy)
    want = GOLDEN_MACRO[name]
    for k, v in want.items():
        assert got[k] == pytest.approx(v) if k == "global_cc" else got[k] == v, (k, got[k], v)
    assert all(check_identities(got).values()), check_identities(got)


@pytest.mark.parametrize("name", list(GRAPHS))
@pytest.mark.parametrize("strategy", ["broadcast", "distributed"])
def test_micro_golden(spark, name, strategy):
    g = make_graph(spark, GRAPHS[name])
    rows = micro_counts(g, strategy=strategy).collect()
    got = {
        (r["src"], r["dst"]): (
            r["triangle"], r["two_star"], r["clique4"], r["chordal_cycle4"],
            r["tailed_tri4"], r["cycle4"], r["star3"], r["path4"],
        )
        for r in rows
    }
    assert got == GOLDEN_MICRO[name]


def test_strategies_agree(spark):
    g = make_graph(spark, K4_EDGE)
    a = sorted(map(tuple, edge_graphlet_counts(g, "broadcast").collect()))
    b = sorted(map(tuple, edge_graphlet_counts(g, "distributed").collect()))
    assert a == b
