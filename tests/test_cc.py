import numpy as np

from pcgraph import fixtures
from pcgraph.algos.cc import connected_components


def _cc_oracle(edges_pdf, vertex_ids):
    """Driver-side numpy min-label CC oracle (brute force)."""
    ids = np.unique(
        np.concatenate([edges_pdf["src"].values, edges_pdf["dst"].values, vertex_ids])
    )
    idx = {v: i for i, v in enumerate(ids)}
    comp = ids.copy()
    src = np.array([idx[v] for v in edges_pdf["src"].values])
    dst = np.array([idx[v] for v in edges_pdf["dst"].values])
    while True:
        prev = comp.copy()
        np.minimum.at(comp, dst, comp[src])
        np.minimum.at(comp, src, comp[dst])
        if np.array_equal(prev, comp):
            break
    return {int(v): int(comp[idx[v]]) for v in ids}


def test_tiny_example_exact(spark):
    vertices, edges = fixtures.tiny_example_graph()
    result, history = connected_components(
        spark,
        fixtures.to_spark_edges(spark, edges),
        vertices=spark.createDataFrame(vertices, schema="id long"),
        num_partitions=4,
    )
    got = {r["id"]: r["component"] for r in result.collect()}
    assert got == fixtures.TINY_EXPECTED_CC
    assert history[-1]["active"] == 0  # converged, not max_iter


def test_odd_even_oracle(spark):
    n = 500
    edges = fixtures.odd_even_graph(n=n)
    result, _ = connected_components(
        spark, fixtures.to_spark_edges(spark, edges), num_partitions=8
    )
    got = {r["id"]: r["component"] for r in result.collect()}
    assert len(got) == n
    for vid, comp in got.items():
        assert comp == (1 if vid % 2 == 1 else 2), (vid, comp)


def test_matches_numpy_oracle_random(spark):
    rng = np.random.default_rng(7)
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "src": rng.integers(0, 300, size=600),
            "dst": rng.integers(0, 300, size=600),
        }
    )
    pdf = pdf[pdf.src != pdf.dst].drop_duplicates()
    sym = pd.concat(
        [pdf, pdf.rename(columns={"src": "dst", "dst": "src"})]
    ).drop_duplicates()
    oracle = _cc_oracle(sym, np.unique(np.concatenate([pdf.src, pdf.dst])))
    result, _ = connected_components(
        spark, fixtures.to_spark_edges(spark, pdf), num_partitions=8
    )
    got = {r["id"]: r["component"] for r in result.collect()}
    assert got == oracle


def test_partition_count_independence(spark):
    vertices, edges = fixtures.tiny_example_graph()
    edges_df = fixtures.to_spark_edges(spark, edges)
    outs = []
    for p in (2, 16):
        result, _ = connected_components(spark, edges_df, num_partitions=p)
        outs.append({r["id"]: r["component"] for r in result.collect()})
    assert outs[0] == outs[1]
