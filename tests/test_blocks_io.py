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


def test_block_store_mode_equivalence(spark, tmp_path):
    """Block-store mode (kernels read their partition's CSR rows
    worker-side, no cogroup) must produce identical results to the
    cached-DataFrame cogroup mode — including salted hubs (mirror
    routing) and singleton vertices (partitions with no block files)."""
    from pcgraph.algos.pagerank import pagerank
    from pcgraph.partition import open_block_store, save_block_store

    pdf = fixtures.skew_graph(n=200)
    edges = fixtures.to_spark_edges(spark, pdf)
    sym = symmetrize(edges)
    blocks = build_blocks(spark, sym, 8, salt_threshold=30)
    path = str(tmp_path / "store")
    save_block_store(blocks, path)
    store = open_block_store(spark, path)
    assert store.blocks is None and store.store_path is not None
    assert store.mirrors is not None

    direct, _ = connected_components(spark, edges, num_partitions=8, salt_threshold=30)
    via_store, hist = connected_components(spark, edges, blocks=store)
    a = {r["id"]: r["component"] for r in direct.collect()}
    b = {r["id"]: r["component"] for r in via_store.collect()}
    assert a == b
    # store mode skips the explicit prefilter (structural): no metric
    assert all("active_partitions" not in m for m in hist)

    # PageRank over the directed graph through a store, with singletons
    vertices, tiny_edges = fixtures.tiny_example_graph()
    e = fixtures.to_spark_edges(spark, tiny_edges)
    vdf = spark.createDataFrame(vertices, schema="id long")
    tb = build_blocks(spark, e, 4)
    tpath = str(tmp_path / "tiny_store")
    save_block_store(tb, tpath)
    tstore = open_block_store(spark, tpath)
    pr_direct, _ = pagerank(spark, e, vertices=vdf, tol=1e-9, max_iter=30, num_partitions=4)
    pr_store, _ = pagerank(spark, e, vertices=vdf, tol=1e-9, max_iter=30, blocks=tstore)
    da = {r["id"]: r["pagerank"] for r in pr_direct.collect()}
    db = {r["id"]: r["pagerank"] for r in pr_store.collect()}
    assert set(da) == set(db)
    assert all(abs(da[k] - db[k]) < 1e-12 for k in da)
