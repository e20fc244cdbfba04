import numpy as np
import pandas as pd

from pcgraph import fixtures
from pcgraph.algos.pagerank import pagerank


def _pr_oracle(edges_pdf, n_ids=None, d=0.85, tol=1e-6, max_iter=100):
    """Driver-side numpy power iteration with identical semantics."""
    ids = np.unique(np.concatenate([edges_pdf["src"].values, edges_pdf["dst"].values]))
    if n_ids is not None:
        ids = np.unique(np.concatenate([ids, n_ids]))
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    src = np.array([idx[v] for v in edges_pdf["src"].values])
    dst = np.array([idx[v] for v in edges_pdf["dst"].values])
    outdeg = np.bincount(src, minlength=n).astype(float)
    pr = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.where(outdeg > 0, pr / np.maximum(outdeg, 1), 0.0)
        msg = np.bincount(dst, weights=contrib[src], minlength=n)
        dangling = pr[outdeg == 0].sum()
        new = (1 - d) / n + d * (msg + dangling / n)
        l1 = np.abs(new - pr).sum()
        pr = new
        if l1 < tol:
            break
    return {int(v): pr[idx[v]] for v in ids}


def test_tiny_example_vs_oracle(spark):
    vertices, edges = fixtures.tiny_example_graph()
    result, history = pagerank(
        spark,
        fixtures.to_spark_edges(spark, edges),
        vertices=spark.createDataFrame(vertices, schema="id long"),
        num_partitions=4,
    )
    oracle = _pr_oracle(edges, n_ids=vertices["id"].values)
    got = {r["id"]: r["pagerank"] for r in result.collect()}
    assert set(got) == set(oracle)
    for vid in oracle:
        assert abs(got[vid] - oracle[vid]) < 1e-6, vid
    assert history[-1]["converged"]
    # total PageRank mass is conserved
    assert abs(history[-1]["total_mass"] - 1.0) < 1e-9


def test_random_graph_vs_oracle(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {"src": rng.integers(0, 150, size=500), "dst": rng.integers(0, 150, size=500)}
    )
    pdf = pdf[pdf.src != pdf.dst].drop_duplicates().reset_index(drop=True)
    result, history = pagerank(
        spark, fixtures.to_spark_edges(spark, pdf), num_partitions=8, tol=1e-8
    )
    oracle = _pr_oracle(pdf, tol=1e-8)
    got = {r["id"]: r["pagerank"] for r in result.collect()}
    for vid in oracle:
        assert abs(got[vid] - oracle[vid]) < 1e-6, vid


def test_salting_equivalence(spark):
    pdf = fixtures.skew_graph(n=300)
    edges = fixtures.to_spark_edges(spark, pdf)
    plain, _ = pagerank(spark, edges, num_partitions=8, tol=1e-8)
    salted, _ = pagerank(spark, edges, num_partitions=8, tol=1e-8, salt_threshold=50)
    a = {r["id"]: r["pagerank"] for r in plain.collect()}
    b = {r["id"]: r["pagerank"] for r in salted.collect()}
    assert set(a) == set(b)
    for vid in a:
        # both converged to L1<1e-8; fold order differs, so allow float slack
        assert abs(a[vid] - b[vid]) < 1e-6, vid
