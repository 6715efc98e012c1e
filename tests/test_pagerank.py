"""Fixed-point PageRank: hand-computed vectors and invariance."""

from data_quality_spark.operators.pagerank import pagerank_fixed


def _run(spark, iters):
    edges = spark.createDataFrame(
        [("A", "B", 1), ("B", "A", 1), ("C", "A", 1)],
        ["src_domain", "dst_domain", "n_links"],
    )
    out = pagerank_fixed(edges, iters=iters)
    return {r["node"]: r["rank"] for r in out.collect()}


def test_two_rounds_hand_computed(spark):
    # unit 1e6, damping 17/20, base 150000
    # r1: A=150000+850000+850000, B=150000+850000, C=150000
    # r2: A=150000+850000+127500, B=150000+(1850000*17 div 20), C=150000
    assert _run(spark, 1) == {"A": 1850000, "B": 1000000, "C": 150000}
    assert _run(spark, 2) == {"A": 1127500, "B": 1722500, "C": 150000}


def test_weighted_split(spark):
    # D splits 3:1 between A and B: contributions are exact integer shares
    edges = spark.createDataFrame(
        [("D", "A", 3), ("D", "B", 1)],
        ["src_domain", "dst_domain", "n_links"],
    )
    got = {r["node"]: r["rank"] for r in pagerank_fixed(edges, iters=1).collect()}
    # D's outflow: 1e6*17*3 div (20*4) = 637500 to A; 1e6*17*1 div 80 = 212500 to B
    assert got == {"A": 787500, "B": 362500, "D": 150000}


def test_partitioning_invariance(spark):
    edges = spark.createDataFrame(
        [(f"s{i % 7}", f"d{i % 3}", 1 + i % 4) for i in range(200)],
        ["src_domain", "dst_domain", "n_links"],
    ).groupBy("src_domain", "dst_domain").sum("n_links").withColumnRenamed(
        "sum(n_links)", "n_links"
    )
    a = {r["node"]: r["rank"] for r in pagerank_fixed(edges, iters=4).collect()}
    b = {
        r["node"]: r["rank"]
        for r in pagerank_fixed(edges.repartition(13), iters=4).collect()
    }
    assert a == b
