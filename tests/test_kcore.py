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


def test_kcore_resume_from_checkpoint(spark, tmp_path):
    """A budgeted kcore run with a checkpoint_dir warns (instead of
    raising) on max_iter exhaustion and a follow-up call resumes from
    the durable state to the exact same fixpoint as a fresh run —
    parity with the pagerank/CC/LPA resume contract."""
    edges = gnp(40, 0.12, 7)
    g = make_graph(spark, edges)
    ckpt = str(tmp_path / "ck")
    with pytest.warns(RuntimeWarning, match="resume"):
        kcore(g, max_iter=1, check_interval=1, checkpoint_dir=ckpt)
    import os

    assert os.path.isdir(os.path.join(ckpt, "kcore")), "no durable state written"
    resumed = {
        r["v"]: r["core"] for r in kcore(g, checkpoint_dir=ckpt).collect()
    }
    fresh = {r["v"]: r["core"] for r in kcore(g).collect()}
    assert resumed == fresh
    assert fresh == nx.core_number(nx.Graph(edges))


def test_kcore_metrics_logged(spark, tmp_path):
    from pgd_spark.operators.pregel import IterationLog

    g = make_graph(spark, gnp(30, 0.15, 4))
    log = IterationLog()
    kcore(g, checkpoint_dir=str(tmp_path / "ck"), log=log)
    assert log.entries and log.entries[-1]["changed"] == 0
    assert all(e["algo"] == "kcore" for e in log.entries)
    import os

    assert os.path.exists(os.path.join(str(tmp_path / "ck"), "kcore", "metrics.jsonl"))
