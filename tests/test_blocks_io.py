from pcgraph import fixtures
from pcgraph.algos.cc import connected_components, symmetrize
from pcgraph.partition import build_blocks, load_blocks, save_blocks


def test_save_load_blocks_roundtrip(spark, tmp_path):
    pdf = fixtures.skew_graph(n=200)
    edges = fixtures.to_spark_edges(spark, pdf)
    sym = symmetrize(edges)
    blocks = build_blocks(spark, sym, 8, salt_threshold=30)
    path = str(tmp_path / "blk")
    save_blocks(blocks, path)
    loaded = load_blocks(spark, path)
    assert loaded.num_partitions == 8
    assert loaded.salt_threshold == 30
    assert loaded.mirrors is not None

    direct, _ = connected_components(spark, edges, num_partitions=8, salt_threshold=30)
    via_loaded, _ = connected_components(spark, edges, blocks=loaded)
    a = {r["id"]: r["component"] for r in direct.collect()}
    b = {r["id"]: r["component"] for r in via_loaded.collect()}
    assert a == b
