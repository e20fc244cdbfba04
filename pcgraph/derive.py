"""Edge derivation: Iceberg-style source-code table -> link graph.

Input (BASELINE.json input_hint): table
``(repo string, path string, commit string, lang string, content string)``.
Everything here is declarative Spark SQL — regex extraction, explode,
joins, aggregation — so Catalyst handles pushdown/pruning and the whole
derivation runs JVM-side with zero Python rows (input_hint: "no per-row
Python").  The reference reads KONECT edge lists instead
(/root/reference/data/us_airport_network/README.opsahl-usairport —
"First column: ID of from node ..."); this module is our analog of its
graph-construction surface (Graph.fromDataSet, PCGraph.java:54).

Row-wise invariant vs the source table: ``content_sha = sha2(content,
256)`` is carried through derivation and checkable with
``verify_content_sha`` (north rule: "content sha256 equality preserved
row-wise").

Stable 63-bit vertex ids: ``xxhash64(repo \\0 path)`` for files,
``xxhash64(repo)`` for repos (SURVEY.md §1.2 Spark mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMPORT_RE = r"import\s+([A-Za-z_][\w\.]*)"
_SEP = "\x00"


def with_content_sha(source: DataFrame) -> DataFrame:
    """Attach the row-wise invariant column ``content_sha``."""
    return source.withColumn("content_sha", F.sha2(F.col("content"), 256))


def file_id_col() -> F.Column:
    return F.xxhash64(F.concat_ws(_SEP, F.col("repo"), F.col("path")))


def repo_id_col(repo_col: str = "repo") -> F.Column:
    return F.xxhash64(F.col(repo_col))


def file_catalog(source: DataFrame) -> DataFrame:
    """One row per file: ids, module name, content sha.

    Module name is derived from the path (strip a leading source root and
    the extension, slashes -> dots): ``src/pkg3/mod7.py`` -> ``pkg3.mod7``.
    """
    module = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("path"), r"^(src|lib|main)/", ""),
            r"\.(py|java|scala|go)$",
            "",
        ),
        "/",
        ".",
    )
    return with_content_sha(source).select(
        "repo",
        "path",
        "lang",
        file_id_col().alias("file_id"),
        repo_id_col().alias("repo_id"),
        module.alias("module"),
        "content_sha",
    )


def extract_imports(source: DataFrame) -> DataFrame:
    """(importer file, imported module) pairs via regex + explode.

    ``regexp_extract_all`` + ``explode`` keeps the extraction fully
    JVM-side; duplicate imports within a file are preserved (they feed
    edge weights).
    """
    return source.select(
        file_id_col().alias("src_file_id"),
        repo_id_col().alias("src_repo_id"),
        F.explode(
            F.regexp_extract_all(F.col("content"), F.lit(IMPORT_RE), F.lit(1))
        ).alias("module"),
    )


def dependency_edges(source: DataFrame, level: str = "file") -> DataFrame:
    """Import-dependency edges [src, dst, weight].

    ``level='file'``: importer file -> defining file.
    ``level='repo'``: importer repo -> defining repo (aggregated).
    A module defined in several files/repos links to each definition.
    Self-edges are dropped.  The (small) module catalog side is the join
    build side; at 10^12-file scale this is a shuffle join on ``module``
    — the key is already low-cardinality text, and Catalyst/AQE handle
    skewed popular modules with skew-join splitting.
    """
    from .datapipe._util import widen_small_input

    # a one-file source table plans single-task scans, serializing the
    # regex extraction on one core; no-op at scale (widen_small_input)
    source = widen_small_input(source)
    imports = extract_imports(source)
    catalog = file_catalog(source).select(
        "module",
        F.col("file_id").alias("dst_file_id"),
        F.col("repo_id").alias("dst_repo_id"),
    )
    joined = imports.join(catalog, on="module", how="inner")
    if level == "file":
        src, dst = "src_file_id", "dst_file_id"
    elif level == "repo":
        src, dst = "src_repo_id", "dst_repo_id"
    else:
        raise ValueError(f"unknown level: {level!r}")
    return (
        joined.filter(F.col(src) != F.col(dst))
        .groupBy(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .agg(F.count("*").cast("double").alias("weight"))
    )


def cooccurrence_edges(
    source: DataFrame, max_imports_per_file: int = 64
) -> DataFrame:
    """Module co-occurrence edges: modules imported by the same file.

    Undirected by construction (canonical m1 < m2 orientation), weight =
    number of files importing both.  ``max_imports_per_file`` caps the
    per-file quadratic blowup (a generated 10k-import file would
    otherwise emit 10^8 pairs): files above the cap are dropped, which
    is the standard guard in co-occurrence mining at scale.
    """
    imports = (
        extract_imports(source)
        .select("src_file_id", "module")
        .distinct()
    )
    counts = imports.groupBy("src_file_id").agg(F.count("*").alias("n_imports"))
    capped = imports.join(
        counts.filter(F.col("n_imports") <= max_imports_per_file).select(
            "src_file_id"
        ),
        on="src_file_id",
        how="inner",
    )
    a = capped.select("src_file_id", F.col("module").alias("m1"))
    b = capped.select("src_file_id", F.col("module").alias("m2"))
    pairs = a.join(b, on="src_file_id").filter(F.col("m1") < F.col("m2"))
    return pairs.groupBy(
        F.xxhash64("m1").alias("src"), F.xxhash64("m2").alias("dst")
    ).agg(F.count("*").cast("double").alias("weight"))


def verify_content_sha(source: DataFrame, derived: DataFrame) -> int:
    """Number of rows whose carried ``content_sha`` disagrees with a
    fresh ``sha2(content, 256)`` on the source table (0 == invariant
    holds).  Join key: (repo, path)."""
    fresh = with_content_sha(source).select(
        "repo", "path", F.col("content_sha").alias("fresh_sha")
    )
    return (
        derived.select("repo", "path", "content_sha")
        .join(fresh, on=["repo", "path"], how="left")
        .filter(
            F.col("fresh_sha").isNull()
            | (F.col("fresh_sha") != F.col("content_sha"))
        )
        .count()
    )
