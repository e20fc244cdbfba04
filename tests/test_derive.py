import re

from pcgraph import derive, fixtures
from pcgraph.algos.cc import connected_components
from pcgraph.algos.pagerank import pagerank


def _oracle_edges(source_pdf, level="file"):
    """Pure-python re-derivation of dependency edges for comparison."""
    module_of = {}
    for row in source_pdf.itertuples(index=False):
        m = re.sub(r"^(src|lib|main)/", "", row.path)
        m = re.sub(r"\.(py|java|scala|go)$", "", m).replace("/", ".")
        module_of.setdefault(m, []).append((row.repo, row.path))
    edges = {}
    for row in source_pdf.itertuples(index=False):
        for m in re.findall(r"import\s+([A-Za-z_][\w\.]*)", row.content):
            for repo, path in module_of.get(m, []):
                if level == "file":
                    s, d = (row.repo, row.path), (repo, path)
                else:
                    s, d = row.repo, repo
                if s != d:
                    edges[(s, d)] = edges.get((s, d), 0) + 1
    return edges


def test_dependency_edges_match_python_oracle(spark):
    src = fixtures.source_table(spark, n_repos=12)
    src_pdf = src.toPandas()
    for level, key in (("file", ("repo", "path")), ("repo", None)):
        got_df = derive.dependency_edges(src, level=level)
        cat = derive.file_catalog(src).toPandas()
        if level == "file":
            id_of = {
                (r.repo, r.path): r.file_id for r in cat.itertuples(index=False)
            }
        else:
            id_of = {r.repo: r.repo_id for r in cat.itertuples(index=False)}
        oracle = {
            (id_of[s], id_of[d]): w
            for (s, d), w in _oracle_edges(src_pdf, level).items()
        }
        got = {
            (r["src"], r["dst"]): r["weight"] for r in got_df.collect()
        }
        assert got == oracle, level


def test_content_sha_invariant(spark):
    src = fixtures.source_table(spark, n_repos=8)
    derived = derive.file_catalog(src)
    assert derive.verify_content_sha(src, derived) == 0
    # and a corrupted copy is caught
    from pyspark.sql import functions as F

    corrupted = derived.withColumn(
        "content_sha",
        F.when(F.col("path") == "src/pkg0/mod0.py", F.lit("deadbeef")).otherwise(
            F.col("content_sha")
        ),
    )
    assert derive.verify_content_sha(src, corrupted) > 0


def test_cooccurrence_edges_canonical(spark):
    src = fixtures.source_table(spark, n_repos=10)
    co = derive.cooccurrence_edges(src)
    rows = co.collect()
    assert len(rows) > 0
    # canonical orientation: hashing of m1<m2 means no duplicate pair both ways
    seen = {(r["src"], r["dst"]) for r in rows}
    assert all((d, s) not in seen for s, d in seen)


def test_end_to_end_source_to_pagerank(spark):
    """Flagship path: source table -> repo dependency edges -> PageRank + CC."""
    src = fixtures.source_table(spark, n_repos=15)
    edges = derive.dependency_edges(src, level="repo")
    pr, hist = pagerank(spark, edges, num_partitions=8)
    assert hist[-1]["converged"]
    assert abs(hist[-1]["total_mass"] - 1.0) < 1e-9
    cc, _ = connected_components(spark, edges, num_partitions=8)
    assert pr.count() == cc.count() > 0
