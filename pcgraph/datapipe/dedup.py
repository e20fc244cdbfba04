"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard, SimHash.

Designed for 100 TB document corpora: every stage is a shuffle on a
bounded key (content hash, band key, shingle) with map-side partial
aggregation; no driver-side collection, no per-row Python.  MinHash uses
portable string-min over sha2 hex digests so the same signature is
computable in any engine (our DuckDB oracles reproduce it verbatim).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger("pcgraph.dedup")

DEFAULT_SEEDS = ("s0", "s1", "s2", "s3")


def make_seeds(n_perms: int) -> tuple[str, ...]:
    """Deterministic seed strings s0..s{n-1} for an n-permutation
    MinHash.  The 4-perm default keeps oracle parity cheap; real
    recall targets want 64-128 perms (use ``n_perms``/``n_bands`` on
    ``near_duplicates``) — the LSH S-curve at r rows per band and b
    bands crosses 1/2 at similarity ~ (1/b)^(1/r)."""
    return tuple(f"s{i}" for i in range(n_perms))


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content with the
    canonical (minimum) id and the duplicate count."""
    return (
        docs.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_sha"))
        .groupBy("content_sha")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def word_shingles(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct k-word shingles per document: DataFrame[id, shingle].

    Pure SQL: split + slide via transform/sequence (JVM-side); documents
    shorter than k words shingle as their full text (mirrors
    ``textstats.fingerprint`` — dropping them entirely would silently
    bypass near-dup detection for short docs).

    The ONE exchange here hash-partitions the raw documents BY ID
    before the explode: Generate/Project preserve partitioning, so the
    ``.distinct()`` (grouping on (id, shingle) ⊇ id) needs no second
    exchange, and every downstream ``groupBy("id")`` — the signature
    aggregation, computed on BOTH sides of the LSH band self-join; the
    jaccard size counts — runs exchange-free on the cached layout.
    Shuffling pre-explode text also moves ~k x fewer bytes than the
    previous post-explode (id, shingle) distinct exchange.  The
    explicit width (max(scan partitions, default parallelism)) keeps
    tiny inputs spread across the cluster for the downstream sha256
    work (AQE would coalesce a keyless small exchange to one task) and
    never narrows an at-scale scan.  Trade: one document's shingles
    now deduplicate on one task — per-task work is bounded by the
    largest single document, which corpus pipelines cap upstream.
    """
    toks = F.split(F.col(text_col), " ")
    shingles = F.when(F.size(toks) < k, F.array(F.col(text_col))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )
    base = docs.select(F.col(id_col), F.col(text_col))
    sc = docs.sparkSession.sparkContext
    width = max(base.rdd.getNumPartitions(), sc.defaultParallelism)
    return (
        base.repartition(width, F.col(id_col))
        .select(F.col(id_col).alias("id"), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, seeds: tuple[str, ...] = DEFAULT_SEEDS
) -> DataFrame:
    """MinHash signature per document: for each seed, the minimum
    sha2-hex of (seed || '|' || shingle).  String-min over hex digests is
    a valid uniform minhash and is engine-portable."""
    aggs = [
        F.min(F.sha2(F.concat_ws("|", F.lit(seed), F.col("shingle")), 256)).alias(
            f"sig{i}"
        )
        for i, seed in enumerate(seeds)
    ]
    return shingles.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, n_bands: int = 2, max_bucket: int | None = None
) -> DataFrame:
    """Candidate near-duplicate pairs: documents sharing any band key.

    Bands = consecutive signature groups concatenated.  All bands go
    through ONE (band_idx, band) self-join (a single shuffle), not one
    join per band.  A single giant bucket (boilerplate / empty docs at
    corpus scale) makes the self-join m² — ``max_bucket`` caps it:
    buckets larger than the cap are dropped from candidate generation
    (their members are still caught by exact dedup, which is how a
    100 TB pipeline handles degenerate clusters).  The cap check is one
    aggregation over (band_idx, band) — one tiny driver action total,
    reported through the ``pcgraph.dedup`` logger, never silent.
    """
    sig_cols = [c for c in signatures.columns if c.startswith("sig")]
    if not 1 <= n_bands <= len(sig_cols):
        raise ValueError(
            f"n_bands={n_bands} must be within [1, {len(sig_cols)}] signature columns"
        )
    if len(sig_cols) % n_bands != 0:
        raise ValueError(
            f"n_bands={n_bands} must divide the {len(sig_cols)} signature columns "
            "(trailing signatures would be silently dropped)"
        )
    per_band = len(sig_cols) // n_bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "|",
                    *[F.col(c) for c in sig_cols[b * per_band : (b + 1) * per_band]],
                ).alias("band"),
            )
            for b in range(n_bands)
        ]
    )
    banded = signatures.select(
        "id", F.explode(band_structs).alias("bk")
    ).select("id", F.col("bk.band_idx").alias("band_idx"), F.col("bk.band").alias("band"))
    banded_cached = None
    if max_bucket is not None:
        # The cap check is the pipeline's first action; persisting the
        # banded signatures means the shingle->minhash work runs ONCE
        # (the check materializes the cache, the self-join reads it) —
        # without this the whole upstream pipeline executes twice.
        # MEMORY_AND_DISK, LRU-evictable; ~|docs|*n_bands small rows.
        banded = banded_cached = banded.persist()
        oversized = (
            banded.groupBy("band_idx", "band")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > max_bucket)
        )
        dropped = oversized.agg(
            F.count("*").alias("buckets"), F.sum("n").alias("members")
        ).collect()[0]
        if dropped["buckets"]:
            log.warning(
                "lsh_candidate_pairs: dropping %d bucket(s) (%d member rows) "
                "larger than max_bucket=%d — members remain covered by "
                "exact dedup",
                dropped["buckets"], dropped["members"], max_bucket,
            )
        banded = banded.join(
            oversized.select("band_idx", "band"), ["band_idx", "band"], "left_anti"
        )
    left = banded.select(F.col("id").alias("id1"), "band_idx", "band")
    right = banded.select(F.col("id").alias("id2"), "band_idx", "band")
    pairs = (
        left.join(right, ["band_idx", "band"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    if banded_cached is not None:
        # Materialize the (small, deduped) pairs so the banded cache can
        # be released NOW instead of leaking until ContextCleaner gets to
        # it across repeated pipeline invocations.  The checkpoint blocks
        # are |pairs|-bounded and freed when the result is gc'd.
        pairs = pairs.localCheckpoint(eager=True)
        banded_cached.unpersist()
    return pairs


def jaccard_similarity(
    shingles: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: |A∩B| / |A∪B|.

    The candidate ``pairs`` join runs FIRST: ``pairs ⋈ shingles(id1) ⋈
    shingles(id2, shingle)`` bounds the intermediate by |pairs| × the
    per-doc shingle count.  The reverse order — shingles self-joined on
    ``shingle`` before the pair restriction — is Σ_shingle count² rows:
    one boilerplate trigram shared by 10⁶ docs would produce 10¹² rows
    before the pair filter ever applied (Catalyst does not reorder inner
    joins without CBO stats).  Sizes via per-doc counts; integer
    arithmetic until the final division (deterministic across engines).
    """
    sizes = shingles.groupBy("id").agg(F.count("*").alias("n"))
    a = shingles.select(F.col("id").alias("id1"), "shingle")
    b = shingles.select(F.col("id").alias("id2"), "shingle")
    inter = (
        pairs.join(a, "id1")  # |pairs| × shingles-of-id1
        .join(b, ["id2", "shingle"])  # keep shingles present in BOTH docs
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("n", "n1"), "id1")
        .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("n", "n2"), "id2")
        .select(
            "id1",
            "id2",
            F.round(
                F.col("n_inter") / (F.col("n1") + F.col("n2") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
    )


def near_duplicates(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perms: int = 4,
    n_bands: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pipeline: shingle -> minhash ->
    band-bucket join -> exact Jaccard verify -> threshold filter.

    ``max_bucket`` is an OPT-IN guard for the band self-join against
    degenerate buckets (m² blowup on boilerplate-heavy corpora).  It is
    deliberately off by default: a capped bucket silently drops genuinely
    near-but-not-identical documents (only byte-identical members stay
    covered by ``exact_duplicates``), so capping is a recall trade the
    caller must choose — and the uncapped default keeps results equal to
    an uncapped oracle.  At corpus scale set ``max_bucket`` (e.g. 1024)
    together with the recall-grade LSH config.  ``n_perms``/``n_bands``
    tune the LSH S-curve — the 4/2 default is the cheap oracle-parity
    config; 64-128 perms with 16-32 bands is the recall-grade
    configuration.
    """
    # The distinct shingle set is referenced four times downstream (the
    # signature branch and three jaccard/size branches); without a cache
    # each reference re-runs the explode+distinct subtree — the plan's
    # identical exchanges are NOT reused across the band self-join's two
    # sides in practice (measured: two full duplicate shingle stages per
    # run).  The persist is filled by the caller's single action and is
    # |distinct shingles|-bounded; it also means the signature min-hash
    # hashes each distinct shingle once instead of every raw occurrence.
    sh = word_shingles(docs, k=k, id_col=id_col, text_col=text_col).persist()
    # Fill the cache NOW: the downstream branches run as parallel stages
    # of one job, and a not-yet-filled cache is computed by every branch
    # that reaches it concurrently (measured: two full duplicate shingle
    # stages per run without this).  One narrow count over the cached
    # partitions is far cheaper than the duplicated explode+distinct.
    sh.count()
    sigs = minhash_signatures(sh, seeds=make_seeds(n_perms))
    cands = lsh_candidate_pairs(sigs, n_bands=n_bands, max_bucket=max_bucket)
    jac = jaccard_similarity(sh, cands)
    return jac.filter(F.col("jaccard") >= threshold)


def _simhash_votes(tok_hash_array, bits_of_hash):
    """Fold an array of per-token hashes into 64 bit-votes, entirely
    inside ONE row (aggregate + zip_with): no explode, no row
    amplification — the naive (doc, bit) explode is a 64x shuffle blowup
    at corpus scale.  ``bits_of_hash(h) -> array<int>[64]`` maps one
    token hash to its +/-1 votes."""
    return F.aggregate(
        tok_hash_array,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(acc, bits_of_hash(h), lambda a, b: a + b),
    )


def simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over word tokens, fully JVM-side (fast path).

    Per doc: for each of 64 bit positions, sum +/-1 over token xxhash64
    bits; bit j of the simhash = (sum_j >= 0).  One aggregate expression
    per document — no explode, no per-row Python.  Hamming-close
    simhashes = near-duplicate candidates."""
    toks = F.split(F.col(text_col), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bits(h):
        return F.array(
            *[
                F.shiftright(h, j).bitwiseAND(F.lit(1)).cast("int") * 2 - 1
                for j in range(64)
            ]
        )

    votes = _simhash_votes(hashes, bits)
    # 2^j as literals (j=63 is the sign bit: -2^63 in two's complement,
    # matching shiftleft(1L, 63) wrap semantics)
    powers = F.array(
        *[
            F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long")
            for j in range(64)
        ]
    )
    sim = F.aggregate(
        F.zip_with(
            votes,
            powers,
            lambda s, p: F.when(s >= 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select(F.col(id_col).alias("id"), sim.alias("simhash"))


def simhash_portable(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash with engine-portable hashing: bit j of a token =
    parity of hex digit j of sha256(token), result emitted as a 64-char
    '0'/'1' string (no 2^63 signed overflow, reproducible verbatim in
    DuckDB/any ANSI engine — the correctness-oracle variant of
    ``simhash64``).  Same no-explode aggregate formulation."""
    toks = F.split(F.col(text_col), " ")
    hashes = F.transform(toks, lambda t: F.sha2(t, 256))

    def bits(h):
        return F.array(
            *[
                (F.conv(F.substring(h, j + 1, 1), 16, 10).cast("int") % 2) * 2 - 1
                for j in range(64)
            ]
        )

    votes = _simhash_votes(hashes, bits)
    sim = F.array_join(
        F.transform(votes, lambda s: F.when(s >= 0, "1").otherwise("0")), ""
    )
    return docs.select(F.col(id_col).alias("id"), sim.alias("simhash"))
