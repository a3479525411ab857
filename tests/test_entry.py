"""Driver-contract smoke: entry() runs and returns rows; queries() and
oracle_sql() keys line up; a sample of queries runs at sf0.001."""

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["total_2_1edge"] > 0
    assert r["total_3_tris"] >= 0


def test_oracle_keys_subset(spark):
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    # the majority of queries must be oracle-checked
    assert len(os_) >= 18


def test_sample_queries_run(spark):
    qs = entrymod.queries()
    for name in ["g_degree_stats", "doc_token_count", "emb_cosine_topk"]:
        df = qs[name](spark, "/root/testdata/sf0.001")
        assert df.count() > 0
