"""Brute-force pure-Python graphlet census oracle (exhaustive subset
enumeration) — the independent ground truth for property tests.
Feasible to n ≈ 80."""

from __future__ import annotations

from itertools import combinations


def _norm_edges(edge_pairs):
    es = set()
    for a, b in edge_pairs:
        if a != b:
            es.add((min(a, b), max(a, b)))
    return es


def census(edge_pairs) -> dict:
    es = _norm_edges(edge_pairs)
    verts = sorted({x for e in es for x in e})
    n = len(verts)
    m = len(es)
    adj = {v: set() for v in verts}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)

    t = {k: 0 for k in [
        "total_2_1edge", "total_2_indep", "total_3_tris", "total_2_star",
        "total_3_1edge", "total_3_indep", "total_4_clique", "total_4_chordcycle",
        "total_4_tailed_tris", "total_4_cycle", "total_3_star", "total_4_path",
        "total_4_1edge", "total_4_2edge", "total_4_2star", "total_4_tri",
        "total_4_indep",
    ]}
    t["total_2_1edge"] = m
    t["total_2_indep"] = n * (n - 1) // 2 - m

    for s3 in combinations(verts, 3):
        k = sum(1 for a, b in combinations(s3, 2) if b in adj[a])
        t[["total_3_indep", "total_3_1edge", "total_2_star", "total_3_tris"][k]] += 1

    for s4 in combinations(verts, 4):
        sub = [(a, b) for a, b in combinations(s4, 2) if b in adj[a]]
        k = len(sub)
        if k == 6:
            t["total_4_clique"] += 1
        elif k == 5:
            t["total_4_chordcycle"] += 1
        elif k == 4:
            degs = sorted(sum(1 for e in sub if v in e) for v in s4)
            t["total_4_cycle" if degs == [2, 2, 2, 2] else "total_4_tailed_tris"] += 1
        elif k == 3:
            degs = sorted(sum(1 for e in sub if v in e) for v in s4)
            if degs == [1, 1, 2, 2]:
                t["total_4_path"] += 1
            elif degs == [1, 1, 1, 3]:
                t["total_3_star"] += 1
            else:  # [0,2,2,2] triangle + isolated
                t["total_4_tri"] += 1
        elif k == 2:
            degs = sorted(sum(1 for e in sub if v in e) for v in s4)
            t["total_4_2edge" if degs == [1, 1, 1, 1] else "total_4_2star"] += 1
        elif k == 1:
            t["total_4_1edge"] += 1
        else:
            t["total_4_indep"] += 1
    t["total_wedges"] = 3 * t["total_3_tris"] + t["total_2_star"]
    t["global_cc"] = 3 * t["total_3_tris"] / t["total_wedges"] if t["total_wedges"] else 0.0
    return t


def micro(edge_pairs, pgd_quirk: bool = True) -> dict:
    """Per-edge micro counts keyed by canonical (src,dst):
    (triangle, two_star, clique4, chordal_cycle4, tailed_tri4, cycle4,
    star3, path4)."""
    es = _norm_edges(edge_pairs)
    verts = sorted({x for e in es for x in e})
    adj = {v: set() for v in verts}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for v, u in sorted(es):
        common = adj[v] & adj[u]
        tri = len(common)
        rv_set = adj[v] - adj[u] - {u}
        ru_set = adj[u] - adj[v] - {v}
        rv, ru = len(rv_set), len(ru_set)
        cliq = sum(1 for w, x in combinations(sorted(common), 2) if x in adj[w])
        chordal = tri * (tri - 1) // 2 - cliq
        cyc = sum(1 for w in ru_set for x in rv_set if x in adj[w])
        path4 = rv * ru - cyc
        tailed_true = sum(1 for w, x in combinations(sorted(rv_set), 2) if x in adj[w]) + sum(
            1 for w, x in combinations(sorted(ru_set), 2) if x in adj[w]
        )
        tailed = 0 if pgd_quirk else tailed_true
        star3 = rv * (rv - 1) // 2 + ru * (ru - 1) // 2 - tailed
        two_star = rv + ru
        out[(v, u)] = (tri, two_star, cliq, chordal, tailed, cyc, star3, path4)
    return out
