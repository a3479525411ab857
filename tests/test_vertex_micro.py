"""Per-vertex micro counts vs a brute-force role-based oracle."""

import random
from itertools import combinations

import pytest

from pgd_spark.operators.vertex_micro import vertex_micro_counts
from tests.conftest import make_graph


def gnp(n, p, seed):
    rng = random.Random(seed)
    return [(i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < p]


def vertex_oracle(edges):
    verts = sorted({x for e in edges for x in e})
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    out = {
        v: dict(tri_cont=0, clique4_cont=0, cycle4_cont=0, star2_center=0,
                star2_leaf=0, star3_center=0, chordal_chord=0, path4_mid_end=0)
        for v in verts
    }
    for s3 in combinations(verts, 3):
        es = [(a, b) for a, b in combinations(s3, 2) if b in adj[a]]
        if len(es) == 3:
            for v in s3:
                out[v]["tri_cont"] += 1
        elif len(es) == 2:
            center = (set(es[0]) & set(es[1])).pop()
            for v in s3:
                if v == center:
                    out[v]["star2_center"] += 1
                else:
                    out[v]["star2_leaf"] += 1
    for s4 in combinations(verts, 4):
        es = [(a, b) for a, b in combinations(s4, 2) if b in adj[a]]
        degs = {v: sum(1 for e in es if v in e) for v in s4}
        k = len(es)
        if k == 6:
            for v in s4:
                out[v]["clique4_cont"] += 1
        elif k == 5:  # diamond: chord endpoints have deg 3
            for v in s4:
                if degs[v] == 3:
                    out[v]["chordal_chord"] += 1
        elif k == 4 and sorted(degs.values()) == [2, 2, 2, 2]:
            for v in s4:
                out[v]["cycle4_cont"] += 1
        elif k == 3:
            dvals = sorted(degs.values())
            if dvals == [1, 1, 1, 3]:
                for v in s4:
                    if degs[v] == 3:
                        out[v]["star3_center"] += 1
            elif dvals == [1, 1, 2, 2]:
                for v in s4:
                    if degs[v] == 2:
                        out[v]["path4_mid_end"] += 1
    return out


@pytest.mark.parametrize("n,p,seed", [(14, 0.35, 1), (20, 0.25, 2), (24, 0.4, 3)])
def test_vertex_micro_vs_oracle(spark, n, p, seed):
    edges = gnp(n, p, seed)
    g = make_graph(spark, edges)
    rows = vertex_micro_counts(g, strategy="broadcast").collect()
    got = {r["v"]: {k: r[k] for k in rows[0].asDict() if k != "v"} for r in rows}
    want = vertex_oracle(edges)
    assert got == want
