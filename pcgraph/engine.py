"""The partition-centric superstep loop (driver-side delta iteration).

Spark has no engine-level delta iteration (Flink:
/root/reference/src/main/java/org/apache/flink/graph/partition/centric/
PartitionCentricIteration.java:89-112 — iterateDelta + closeWith), so
the loop lives in the driver.  One global superstep =

    frontier --route(partition_id, mirrors)--> cogroup with CSR blocks
      [blocks pre-filtered to the frontier's ACTIVE partitions, so a
      sparse tail round pays O(frontier), not O(|E|) Arrow transfer]
      --applyInPandas(kernel: many LOCAL supersteps, vectorized numpy)-->
      messages [dst, ...] --groupBy(dst).agg(fold) [Catalyst gives the
      map-side combiner the reference lacks]--> state merge -->
      changed-filter --> next frontier

Convergence = empty frontier (reference semantics) or an
algorithm-supplied metric (PageRank L1 < tol).

Lineage strategy (measured; docs/PERF.md):
  * The STATE is eagerly ``localCheckpoint``-ed EVERY round — the
    round's single materializing job.  In Spark 4.x the resulting
    ``LogicalRDD`` PRESERVES the merge join's outputPartitioning and
    outputOrdering, so the next round's state-side merge has NO
    Exchange and NO Sort; the only per-round shuffles are the routed
    frontier and the (map-side combined) message fold.
  * Checkpointing — an opaque plan — is load-bearing, not just a
    lineage cut.  Anything that keeps the state's logical plan alive
    across rounds (persist + lazy derivation) makes every round a
    SELF-JOIN of the state with its own message branch: the analyzer's
    DeduplicateRelations re-aliases the message side's subtree, the
    re-aliased subtree no longer matches the cache registry, and the
    whole chain silently re-executes back to the last opaque plan —
    measured as per-round input/shuffle bytes DOUBLING per superstep
    (2^k; 9 GB/round state scans at 316M edges grew to 31 GB by the
    4th round).  One opaque checkpoint per round makes every round's
    cost structurally identical — the property a 1000-round run at
    100 TB needs.
  * The previous round's checkpoint blocks are freed eagerly and
    deterministically (``_free_checkpoint``) — ContextCleaner would
    only free them at some later GC, and a long loop would otherwise
    hold every round's ~|V| object-form rows in block storage.

Every ``checkpoint_every`` rounds state+frontier go to Parquet with a
``_meta.json`` carrying superstep number, metrics, per-partition
frontier counts and a parent pointer, so runs resume mid-iteration
(north rule: resumable with per-partition lineage).
"""

from __future__ import annotations

import inspect
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .iohelpers import fs_exists, fs_list_dirs, read_json, write_json_atomic
from .partition import GraphBlocks
from .statestore import BucketedStateStore, DeltaStateStore

META_NAME = "_meta.json"

# Target edges per kernel task when the block store records the edge
# count (see _messages).  128k edges ~= a few ms of vectorized kernel
# work — big enough to amortize the per-task python-runner protocol
# cost, small enough that the cap (one block per task) still binds for
# any graph that matters at scale.  Env override for benchmarking.
_EDGES_PER_KERNEL_TASK = int(
    os.environ.get("PCGRAPH_KERNEL_EDGES_PER_TASK", str(128 * 1024))
)


def _round_dir(checkpoint_dir: str, step: int) -> str:
    return os.path.join(checkpoint_dir, f"round={step:05d}")


def _store_dir_for_meta(checkpoint_dir: str, store_root: str) -> str:
    """How a round meta records its state store's location: relative to
    the checkpoint dir when the store lives under it (so a relocated
    checkpoint directory still resumes), absolute otherwise (a caller-
    configured --state-store-dir outside the checkpoint tree).

    Scheme-less paths are normalized (abspath) before the prefix
    compare: a relative ``state_store_dir`` like ``./store`` not under
    the checkpoint dir would otherwise be recorded verbatim and
    resolved against the CHECKPOINT dir on resume instead of the
    original working directory (ADVICE r5)."""

    def _norm(p: str) -> str:
        return p if "://" in p else os.path.abspath(p)

    store_abs = _norm(store_root)
    prefix = _norm(checkpoint_dir).rstrip("/") + "/"
    if store_abs.startswith(prefix):
        return store_abs[len(prefix):]
    return store_abs


def _bind_store(kernel3: Callable, store_path: str) -> Callable:
    """Adapt a 3-arg kernel to block-store mode: the grouped-map only
    delivers the frontier slice; the block side is read worker-side."""

    def fn(key, fpdf):
        from .partition import read_store_block

        bpdf = read_store_block(store_path, int(key[0]))
        return kernel3(key, fpdf, bpdf)

    return fn


def _bind_step(kernel: Callable, step: int) -> Callable:
    """Close over the superstep number with the exact 3-arg signature
    cogroup.applyInPandas validates."""

    def kernel_fn(key, fpdf, bpdf):
        return kernel(key, fpdf, bpdf, step)

    return kernel_fn


def _kernel_wants_step(kernel: Callable) -> bool:
    """A kernel may declare ``(key, frontier_pdf, block_pdf, step)`` to
    receive the superstep number (reference parity:
    VertexUpdateFunction.getSuperstepNumber, VertexUpdateFunction.java:
    77-79 — exposed to the partition kernel here because that is where
    step-dependent logic lives in the partition-centric model)."""
    try:
        return len(inspect.signature(kernel).parameters) >= 4
    except (TypeError, ValueError):
        return False


def _free_checkpoint(df: DataFrame) -> None:
    """Release a ``localCheckpoint``-ed DataFrame's cached RDD blocks
    NOW.  ``DataFrame.unpersist`` only touches the SQL cache registry —
    checkpoint blocks are RDD-level persistence, otherwise freed only
    when the JVM garbage-collects the plan (ContextCleaner), which a
    tight superstep loop cannot wait for.  Best-effort: falls back to
    ContextCleaner if the internal accessor is unavailable."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


class PCEngine:
    """Generic partition-centric iteration runner.

    The algorithm supplies:
      * ``kernel(key, frontier_pdf, block_pdf[, step]) -> messages_pdf``
        — the per-partition vectorized local computation (analog of the
        reference's PartitionProcessFunction.processPartition,
        PartitionProcessFunction.java:78-89); the optional 4th
        parameter receives the 1-based superstep number;
      * ``msg_schema`` — DDL schema of the messages DataFrame (first
        column must be ``dst``);
      * ``update(state, msgs, step) -> new_state`` — global fold +
        vertex update (analog of VertexUpdateFunction.updateVertex,
        VertexUpdateFunction.java:42-56); lazy, engine materializes;
      * ``frontier_fn(new_state) -> frontier[id, value]`` — the changed
        set (analog of setNewVertexValue's emit-on-change,
        VertexUpdateFunction.java:85-93); stays a LAZY projection of
        the checkpointed state (no second materialized copy per round);
      * optional ``metrics_fn(new_state, step) -> dict`` — one action
        over the materialized state (e.g. PageRank L1 delta); may set
        ``active`` and ``converged``;
      * optional ``pre_superstep(step)`` / ``post_superstep(step,
        metrics)`` lifecycle hooks (reference parity:
        PartitionProcessFunction.java:45-63, PartitionCentricIteration.
        java:142-153) — driver-side, once per global superstep.
    """

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 1,
        partition_metrics: bool | None = None,
        aqe_in_loop: bool = False,
        checkpoint_storage_level: str | None = None,
    ):
        self.spark = spark
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = max(1, checkpoint_every)
        # Storage level for the per-round state localCheckpoint.
        # Default: "MEMORY_AND_DISK" — PySpark's SERIALIZED level.  The
        # state is scanned twice per round (frontier route + merge), and
        # the A/B at 316M edges (BENCH/pr_steady_316m_r4.json) measured
        # the deserialized default re-reading 7.4 GB of spilled object
        # rows per round (object form overflows the storage pool) vs
        # 0.87 GB serialized, with 8x less GC and the best wall time —
        # and at cluster scale compact state is what keeps 10^9-vertex
        # checkpoints memory-resident.  Override with
        # PCGRAPH_CKPT_LEVEL=MEMORY_AND_DISK_DESER (or any StorageLevel
        # name) to trade memory for the deser CPU back.
        if checkpoint_storage_level is None:
            checkpoint_storage_level = os.environ.get(
                "PCGRAPH_CKPT_LEVEL", "MEMORY_AND_DISK"
            )
        from pyspark import StorageLevel

        self._ckpt_level = getattr(StorageLevel, checkpoint_storage_level)
        if partition_metrics is None:
            partition_metrics = checkpoint_dir is not None
        self.partition_metrics = partition_metrics
        # AQE re-plans 3-4 query stages on the driver every superstep — a
        # serial per-round cost that hits higher parallelism levels
        # proportionally harder (Amdahl), and it buys nothing here: the
        # loop's shuffle partitioning is fixed by construction and skew
        # is handled by explicit salting (AQE cannot split applyInPandas
        # groups anyway, SURVEY.md §4).  Off inside run(), restored after.
        self.aqe_in_loop = aqe_in_loop
        self.history: list[dict] = []

    # ------------------------------------------------------------------
    def run(
        self,
        blocks: GraphBlocks,
        state: DataFrame,
        frontier: DataFrame | None,
        kernel: Callable,
        msg_schema: str,
        update: Callable[[DataFrame, DataFrame, int], DataFrame],
        frontier_fn: Callable[[DataFrame], DataFrame],
        max_iter: int,
        metrics_fn: Callable[[DataFrame, int], dict] | None = None,
        metrics_exprs: list | None = None,
        metrics_post: Callable[[dict, int], dict] | None = None,
        start_step: int = 0,
        algorithm: str = "custom",
        prefilter_blocks: bool = False,
        strict: bool = False,
        state_cols: list[str] | None = None,
        pre_superstep: Callable[[int], None] | None = None,
        post_superstep: Callable[[int, dict], None] | None = None,
        state_store_dir: str | None = None,
        n_buckets: int = 256,
        resume_manifest: dict | None = None,
        monotone: str | None = None,
        delta_broadcast_rows: int = 1_000_000,
        max_versions: int = 8,
        checkpoint_initial_state: bool = True,
    ) -> tuple[DataFrame, list[dict]]:
        """Iterate to convergence.

        ``monotone`` ("min" or "max") with ``state_store_dir`` switches
        to the DELTA-VERSION incremental loop: the algorithm's merge
        must be exactly "fold messages per dst with min (resp. max),
        keep on strict improvement" over state rows ``(id, value,
        changed)`` and messages ``(dst, msg)`` — CC's min-label and
        SSSP's min-distance qualify.  In that mode ``update`` and
        ``frontier_fn`` are bypassed after initialization (the engine
        applies the monotone merge itself) and each round writes ONLY
        its changed rows (O(changed)) as a new store version, with
        min-reconciliation on read and per-bucket compaction
        (``max_versions``) bounding read amplification.  ``delta_
        broadcast_rows``: folded-message count at or below which the
        improvement join broadcasts the messages (sparse rounds scan
        the touched buckets once, shuffle-free).

        ``state_store_dir`` switches the loop to INCREMENTAL state
        (BucketedStateStore): the state lives hash-bucketed on disk and
        each round rewrites only the buckets its messages touch, making
        sparse-frontier rounds O(frontier) instead of the classic
        loop's O(|V|) per-round state materialization.  Requirements:
        the algorithm must be a delta algorithm — ``update`` only
        changes rows targeted by messages, and ``metrics_exprs`` must
        be computable over the TOUCHED rows alone (CC/SSSP changed
        counts qualify; PageRank's full-state L1 does not).  On a
        cluster the directory must be on shared storage (hdfs/s3a).
        ``resume_manifest`` (from a committed round's meta) resumes
        against an existing store.

        ``state_cols``: columns to RETAIN in the per-round materialized
        state.  Metric-only columns (e.g. PageRank's prev_pr, consumed
        by the observe expressions) are projected away after the
        observation fires, so they never occupy checkpoint storage —
        at 316M edges this cuts the per-round state bytes ~25%.

        ``prefilter_blocks=True`` restricts each round's cogroup to the
        partitions the frontier actually touches (one tiny distinct-
        collect of partition ids).  Essential for delta algorithms with
        long sparse tails (CC after ~3 rounds, SSSP for ~diameter
        rounds): without it every round ships the ENTIRE topology
        through Arrow just to return empty frames.  Leave False for
        full-frontier algorithms (PageRank, sync LPA) where all
        partitions are active anyway.

        ``strict=True`` raises (reference parity: "Target vertex does
        not exist!", PartitionCentricIteration.java:216-227) if any
        kernel message targets a vertex id absent from the state.
        Costs one extra anti-join action per round (messages are
        persisted for the round to avoid re-running kernels) — a debug
        mode, zero-cost when off.

        ``metrics_exprs``/``metrics_post``: aggregate Columns evaluated
        over the new state INSIDE the round's single materializing job
        via ``DataFrame.observe`` (so convergence metrics cost zero
        extra actions/passes — vs ``metrics_fn``, which runs its own
        aggregation action).  ``metrics_post(observed_dict, step)``
        turns the raw observed values into the metrics dict (and may
        set ``active``/``converged``).  The observe node rides the
        checkpoint action only — it never enters the retained plan.
        """
        conf = self.spark.conf
        aqe_prev = conf.get("spark.sql.adaptive.enabled", "true")
        bcast_prev = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        if not self.aqe_in_loop:
            conf.set("spark.sql.adaptive.enabled", "false")
        # The per-round merge join must NOT auto-broadcast the folded
        # messages: the broadcast build is an extra job every round
        # (each job has a fixed driver/py4j floor), while the sort-merge
        # path fuses fold+merge+checkpoint into the final stage of the
        # ONE materializing job — the state side is exchange- and
        # sort-free from the previous round's checkpointed partitioning
        # (module docstring), so SMJ costs no extra shuffle.  Explicit
        # F.broadcast hints (mirror route, delta-loop sparse fold) are
        # unaffected by the threshold.
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            if state_store_dir is not None:
                # A scalar-valued resume manifest (bucket -> version) is a
                # legacy bucket-rewrite checkpoint; list-valued is delta.
                legacy_manifest = resume_manifest is not None and any(
                    not isinstance(v, (list, tuple))
                    for v in resume_manifest.values()
                )
                delta_manifest = resume_manifest is not None and any(
                    isinstance(v, (list, tuple))
                    for v in resume_manifest.values()
                )
                if delta_manifest and monotone is None:
                    # Routing a delta (list-valued) manifest into the
                    # bucket-rewrite loop would die deep inside
                    # BucketedStateStore.restore with an opaque
                    # TypeError — name the mismatch instead.
                    raise ValueError(
                        "resume manifest is delta-versioned (list-valued "
                        "version lists) but the delta loop was not "
                        "selected (monotone=None); resume with the same "
                        "mode the checkpoint was written with (e.g. "
                        "delta=True in cc()/sssp())"
                    )
                if monotone is not None and not legacy_manifest:
                    return self._run_loop_delta(
                        blocks, state, frontier, kernel, msg_schema,
                        frontier_fn, max_iter, metrics_exprs, metrics_post,
                        start_step, algorithm, strict, pre_superstep,
                        post_superstep, state_store_dir, n_buckets,
                        resume_manifest, monotone, delta_broadcast_rows,
                        max_versions, prefilter_blocks,
                    )
                return self._run_loop_incremental(
                    blocks, state, frontier, kernel, msg_schema, update,
                    frontier_fn, max_iter, metrics_exprs, metrics_post,
                    start_step, algorithm, strict, state_cols,
                    pre_superstep, post_superstep, state_store_dir,
                    n_buckets, resume_manifest,
                )
            return self._run_loop(
                blocks, state, frontier, kernel, msg_schema, update,
                frontier_fn, max_iter, metrics_fn, metrics_exprs,
                metrics_post, start_step, algorithm, prefilter_blocks,
                strict, state_cols, pre_superstep, post_superstep,
                checkpoint_initial_state,
            )
        finally:
            conf.set("spark.sql.adaptive.enabled", aqe_prev)
            conf.set("spark.sql.autoBroadcastJoinThreshold", bcast_prev)

    def _run_loop(
        self,
        blocks: GraphBlocks,
        state: DataFrame,
        frontier: DataFrame | None,
        kernel: Callable,
        msg_schema: str,
        update: Callable[[DataFrame, DataFrame, int], DataFrame],
        frontier_fn: Callable[[DataFrame], DataFrame],
        max_iter: int,
        metrics_fn: Callable[[DataFrame, int], dict] | None,
        metrics_exprs: list | None,
        metrics_post: Callable[[dict, int], dict] | None,
        start_step: int,
        algorithm: str,
        prefilter_blocks: bool,
        strict: bool,
        state_cols: list[str] | None,
        pre_superstep: Callable[[int], None] | None,
        post_superstep: Callable[[int, dict], None] | None,
        checkpoint_initial_state: bool = True,
    ) -> tuple[DataFrame, list[dict]]:
        # The initial state becomes the first opaque plan; the first
        # round's merge pays one state-side shuffle into hash(id)
        # partitioning, every later round inherits it from the previous
        # round's checkpointed merge output (no Exchange, no Sort).
        #
        # ``checkpoint_initial_state=False`` (algorithms pass it when
        # the initial state is a cheap deterministic scan — the store's
        # vertex census): round 1 then embeds the scan directly.  The
        # state subtree appears twice in the round-1 plan (frontier
        # branch + merge branch), i.e. the census is read at most twice
        # — cheaper than materializing an O(|V|) checkpoint first,
        # at every scale.  The per-round checkpoint of the MERGE output
        # (the lineage-cut that keeps rounds structurally identical) is
        # unaffected.
        if checkpoint_initial_state:
            state = state.localCheckpoint(
                eager=True, storageLevel=self._ckpt_level
            )
        if frontier is None:
            frontier = frontier_fn(state)
        wants_step = _kernel_wants_step(kernel)
        step = start_step
        while step < max_iter:
            step += 1
            round_t0 = time.monotonic()
            if pre_superstep is not None:
                pre_superstep(step)
            routed = blocks.route(frontier)

            kernel_fn = _bind_step(kernel, step) if wants_step else kernel
            msgs, active_partitions = self._messages(
                blocks, routed, kernel_fn, msg_schema, prefilter_blocks
            )
            if strict:
                msgs = msgs.persist()
                unknown = (
                    msgs.select("dst")
                    .join(
                        state.select(F.col("id").alias("dst")), on="dst",
                        how="left_anti",
                    )
                    .count()
                )
                if unknown:
                    raise ValueError(
                        f"Target vertex does not exist! ({unknown} message(s) "
                        "target ids absent from the vertex set)"
                    )
            new_state = update(state, msgs, step)
            obs: Observation | None = None
            if metrics_exprs:
                # Evaluated as a side-effect of this round's single
                # materializing action — no separate aggregation pass.
                # Attached on TOP of the merge plan; the checkpoint /
                # write discards the plan, so the node fires exactly
                # once and never survives into later rounds.
                obs = Observation(f"pcgraph_{algorithm}_step{step}")
                action_src = new_state.observe(obs, *metrics_exprs)
            else:
                action_src = new_state
            if state_cols is not None:
                # metric-only columns end at the observation: project
                # them away BELOW the checkpoint (partitioning on id is
                # preserved through Project/CollectMetrics)
                action_src = action_src.select(*state_cols)

            do_ckpt = (
                self.checkpoint_dir is not None and step % self.checkpoint_every == 0
            )
            if do_ckpt:
                rdir = _round_dir(self.checkpoint_dir, step)
                action_src.write.mode("overwrite").parquet(
                    os.path.join(rdir, "state.parquet")
                )  # the write is the materializing action (fires observe)
                new_state = self.spark.read.parquet(
                    os.path.join(rdir, "state.parquet")
                )
                # A parquet read-back has no partitioning metadata: the
                # next round pays one state-side shuffle — the durable-
                # checkpoint tax, once per checkpoint_every rounds.
            else:
                # THE materializing action of the round.  The returned
                # LogicalRDD keeps the merge's hash(id) partitioning +
                # sort order (Spark 4.x), so next round's merge has no
                # state-side Exchange/Sort; the opaque plan makes the
                # message branch's lineage start at an RDD leaf, so no
                # self-join dedup / no recompute (module docstring).
                new_state = action_src.localCheckpoint(
                    eager=True, storageLevel=self._ckpt_level
                )

            if obs is not None:
                observed = dict(obs.get)
                metrics = (
                    metrics_post(observed, step) if metrics_post else observed
                )
            elif metrics_fn:
                metrics = metrics_fn(new_state, step)
            else:
                metrics = {}
            new_frontier = frontier_fn(new_state)
            if "active" not in metrics:
                # one cheap scan of the checkpointed state (no shuffle)
                metrics["active"] = new_frontier.count()
            metrics.update(
                superstep=step,
                algorithm=algorithm,
                round_sec=round(time.monotonic() - round_t0, 4),
            )
            if active_partitions is not None:
                metrics["active_partitions"] = active_partitions

            if do_ckpt:
                self._commit_round(blocks, step, new_frontier, metrics)
            if strict:
                msgs.unpersist()
            # Free the PREVIOUS round's checkpoint blocks now: the new
            # state is fully materialized, and block storage holding
            # every round's ~|V| object-form rows starves execution
            # memory (UnifiedMemoryManager eviction churn, measured).
            _free_checkpoint(state)
            state, frontier = new_state, new_frontier
            self.history.append(metrics)
            if post_superstep is not None:
                post_superstep(step, metrics)
            if metrics.get("converged") or metrics["active"] == 0:
                break
        return state, self.history

    # ------------------------------------------------------------------
    def _bound_kernel(self, kernel_fn: Callable, store_path: str) -> Callable:
        """Per-run cache of the store-bound kernel closure: a fresh
        closure per round would defeat the UDF cache below (the pickle
        changes with the function object).  Keyed by kernel identity —
        step-bound kernels (a new closure per round) simply miss."""
        cached = self.__dict__.get("_bound_cache")
        if cached is not None and cached[0] is kernel_fn and cached[1] == store_path:
            return cached[2]
        bound = _bind_store(kernel_fn, store_path)
        self.__dict__["_bound_cache"] = (kernel_fn, store_path, bound)
        return bound

    def _grouped_udf(self, fn: Callable, msg_schema: str):
        """Per-run cache of the grouped-map pandas UDF for ``fn``."""
        cached = self.__dict__.get("_udf_cache")
        if cached is not None and cached[0] is fn and cached[1] == msg_schema:
            return cached[2]
        from pyspark.rdd import PythonEvalType
        from pyspark.sql.functions import pandas_udf

        udf = pandas_udf(
            fn,
            returnType=msg_schema,
            functionType=PythonEvalType.SQL_GROUPED_MAP_PANDAS_UDF,
        )
        self.__dict__["_udf_cache"] = (fn, msg_schema, udf)
        return udf

    # ------------------------------------------------------------------
    def _messages(
        self,
        blocks: GraphBlocks,
        routed: DataFrame,
        kernel_fn: Callable,
        msg_schema: str,
        prefilter_blocks: bool,
    ) -> tuple[DataFrame, int | None]:
        """One superstep's kernel application: routed frontier -> raw
        messages (shared by the classic and incremental loops).

        The routed frontier is explicitly hash-partitioned into
        ``num_partitions`` (one CSR block per task) instead of letting
        the grouped-map plan its exchange at spark.sql.shuffle.partitions:
        same single shuffle, but each kernel task then writes 1/Pth of
        the message volume through its ShuffleExternalSorter.  At 316M
        edges with 128 blocks on 32 shuffle partitions, the 4-blocks-
        per-task kernel stage buffered ~240 MB of compressed partials
        per task and spilled 10-15 GB/round (r5 per-stage attribution,
        docs/PERF.md); at one block per task the buffers fit."""
        active_partitions = None
        # Physical width of the kernel stage (number of reduce
        # partitions feeding applyInPandas).  One CSR block per task is
        # the at-scale layout (spill-free shuffle write, r5); but each
        # python-runner task has a fixed JVM<->worker protocol cost
        # (~10-100 ms), so a SMALL graph must not fan a few thousand
        # rows out over num_partitions tasks.  When the store records
        # the edge count, size width to ~_EDGES_PER_KERNEL_TASK edges
        # per task, capped at num_partitions — at 316M edges the cap
        # binds (one block per task, exactly the r5 behavior), at sf0.1
        # it is a handful of tasks.  Grouping semantics are unchanged:
        # groups are keyed by partition_id regardless of the physical
        # partition count.
        width = blocks.num_partitions
        if blocks.n_edges is not None:
            width = max(1, min(width, -(-blocks.n_edges // _EDGES_PER_KERNEL_TASK)))
        widened = routed.repartition(width, "partition_id")
        if blocks.store_path is not None:
            # Block-store mode: the grouped-map only materializes
            # groups the frontier touches, and each kernel reads its
            # own partition's CSR rows worker-side — no JVM cache
            # scan, no Arrow transfer of the topology, and inactive
            # partitions are free (prefiltering is structural).
            #
            # The pandas UDF object is cached across supersteps (same
            # kernel, same schema): applyInPandas re-wraps and
            # re-cloudpickles the function on every call (~20 ms/round
            # measured); the cached UDF applied through the same
            # flatMapGroupsInPandas entry point halves that.  Any
            # failure of the cached path falls back to the public API.
            bound = self._bound_kernel(kernel_fn, blocks.store_path)
            try:
                udf = self._grouped_udf(bound, msg_schema)
                gd = widened.groupby("partition_id")
                udf_col = udf(*[widened[c] for c in widened.columns])
                from pyspark.sql.classic.dataframe import DataFrame as _CDF

                msgs = _CDF(
                    gd._jgd.flatMapGroupsInPandas(udf_col._jc), self.spark
                )
            except Exception:
                msgs = widened.groupby("partition_id").applyInPandas(
                    bound, schema=msg_schema
                )
        else:
            blocks_df = blocks.blocks
            if prefilter_blocks:
                pids = [
                    r[0]
                    for r in routed.select("partition_id").distinct().collect()
                ]
                active_partitions = len(pids)
                blocks_df = blocks_df.filter(F.col("partition_id").isin(pids))
            msgs = (
                widened.groupby("partition_id")
                .cogroup(blocks_df.groupby("partition_id"))
                .applyInPandas(kernel_fn, schema=msg_schema)
            )
        if width < blocks.num_partitions:
            # Small-graph case only (the width cap did not bind): keep
            # the downstream message fold at the same width — the
            # algorithm's groupBy("dst") then reuses this partitioning
            # instead of planning its own exchange at
            # spark.sql.shuffle.partitions, so the fold/merge stages run
            # `width` tasks, not 32+.  Replaces the fold's
            # ENSURE_REQUIREMENTS exchange (same exchange count); never
            # fires at scale, where width == num_partitions.
            msgs = msgs.repartition(width, "dst")
        return msgs, active_partitions

    # ------------------------------------------------------------------
    def _run_loop_incremental(
        self,
        blocks: GraphBlocks,
        state: DataFrame,
        frontier: DataFrame | None,
        kernel: Callable,
        msg_schema: str,
        update: Callable[[DataFrame, DataFrame, int], DataFrame],
        frontier_fn: Callable[[DataFrame], DataFrame],
        max_iter: int,
        metrics_exprs: list | None,
        metrics_post: Callable[[dict, int], dict] | None,
        start_step: int,
        algorithm: str,
        strict: bool,
        state_cols: list[str] | None,
        pre_superstep: Callable[[int], None] | None,
        post_superstep: Callable[[int, dict], None] | None,
        state_store_dir: str,
        n_buckets: int,
        resume_manifest: dict | None,
    ) -> tuple[DataFrame, list[dict]]:
        """Delta-algorithm loop over a BucketedStateStore: every round's
        state read AND write touch only the buckets the messages land
        in, so a sparse tail round costs O(frontier) — vs the classic
        loop's O(|V|) per-round checkpoint (PERF.md round-4 target #4).

        Per round: kernel messages (persisted once), one tiny distinct-
        collect of the messages' dst buckets, a partition-pruned read of
        exactly those buckets, ``update`` merging messages into them,
        and a versioned write of only those buckets (the materializing
        action; any observe rides it).  The next frontier is read back
        from the just-written version — rows untouched this round can
        never be in it, which is exactly the changed-set semantics.
        """
        store = BucketedStateStore(self.spark, state_store_dir, n_buckets)
        if resume_manifest is not None:
            store.restore(resume_manifest)
            if frontier is None:
                raise ValueError(
                    "incremental resume requires the committed round's "
                    "frontier (engine.resume provides it)"
                )
        else:
            store.init(state, step=start_step)
            if frontier is None:
                frontier = frontier_fn(store.read_version(start_step))
        wants_step = _kernel_wants_step(kernel)
        step = start_step
        while step < max_iter:
            step += 1
            round_t0 = time.monotonic()
            if pre_superstep is not None:
                pre_superstep(step)
            routed = blocks.route(frontier)
            kernel_fn = _bind_step(kernel, step) if wants_step else kernel
            msgs, _ = self._messages(
                blocks, routed, kernel_fn, msg_schema, prefilter_blocks=False
            )
            # The round's FIRST action runs the kernels and caches the
            # messages; everything after reads the (frontier-sized)
            # cache — kernels never run twice.
            msgs = msgs.persist()
            active_buckets = sorted(
                r[0]
                for r in msgs.select(
                    store.bucket_expr(F.col("dst")).alias("b")
                )
                .distinct()
                .collect()
            )
            if strict:
                unknown = (
                    msgs.select("dst")
                    .join(
                        store.read_full().select(F.col("id").alias("dst")),
                        on="dst",
                        how="left_anti",
                    )
                    .count()
                )
                if unknown:
                    raise ValueError(
                        f"Target vertex does not exist! ({unknown} message(s) "
                        "target ids absent from the vertex set)"
                    )
            state_subset = store.read_buckets(active_buckets)
            if state_subset is None:
                # no message targets any stored vertex -> nothing can
                # change; converged by the emit-on-change contract
                msgs.unpersist()
                metrics = {
                    "active": 0,
                    "superstep": step,
                    "algorithm": algorithm,
                    "round_sec": round(time.monotonic() - round_t0, 4),
                    "active_buckets": 0,
                }
                self.history.append(metrics)
                if post_superstep is not None:
                    post_superstep(step, metrics)
                break
            merged = update(state_subset, msgs, step)
            obs: Observation | None = None
            if metrics_exprs:
                obs = Observation(f"pcgraph_{algorithm}_step{step}")
                merged = merged.observe(obs, *metrics_exprs)
            if state_cols is not None:
                merged = merged.select(*state_cols)
            merged = merged.withColumn(
                "bucket", store.bucket_expr(F.col("id"))
            )
            store.write_round(merged, step)  # THE materializing action
            msgs.unpersist()
            touched = store.read_version(step)
            new_frontier = frontier_fn(touched)
            if obs is not None:
                observed = dict(obs.get)
                metrics = (
                    metrics_post(observed, step) if metrics_post else observed
                )
            else:
                metrics = {}
            if "active" not in metrics:
                metrics["active"] = new_frontier.count()
            metrics.update(
                superstep=step,
                algorithm=algorithm,
                round_sec=round(time.monotonic() - round_t0, 4),
                active_buckets=len(active_buckets),
            )
            do_ckpt = (
                self.checkpoint_dir is not None
                and step % self.checkpoint_every == 0
            )
            if do_ckpt:
                metrics_meta = dict(metrics)
                metrics_meta["manifest"] = {
                    str(b): v for b, v in store.manifest.items()
                }
                metrics_meta["n_buckets"] = store.n_buckets
                metrics_meta["state_store_dir"] = _store_dir_for_meta(
                    self.checkpoint_dir, state_store_dir
                )
                self._commit_round(
                    blocks, step, new_frontier, metrics_meta,
                    write_state=False,
                )
                store.mark_committed()
            frontier = new_frontier
            self.history.append(metrics)
            if post_superstep is not None:
                post_superstep(step, metrics)
            if metrics.get("converged") or metrics["active"] == 0:
                break
        return store.read_full(), self.history

    # ------------------------------------------------------------------
    def _run_loop_delta(
        self,
        blocks: GraphBlocks,
        state: DataFrame,
        frontier: DataFrame | None,
        kernel: Callable,
        msg_schema: str,
        frontier_fn: Callable[[DataFrame], DataFrame],
        max_iter: int,
        metrics_exprs: list | None,
        metrics_post: Callable[[dict, int], dict] | None,
        start_step: int,
        algorithm: str,
        strict: bool,
        pre_superstep: Callable[[int], None] | None,
        post_superstep: Callable[[int, dict], None] | None,
        state_store_dir: str,
        n_buckets: int,
        resume_manifest: dict | None,
        monotone: str,
        delta_broadcast_rows: int,
        max_versions: int,
        prefilter_blocks: bool = False,
    ) -> tuple[DataFrame, list[dict]]:
        """Monotone delta loop over a DeltaStateStore: each round writes
        ONLY its changed rows — O(changed), not O(touched buckets).

        Per round: kernel messages folded per dst (min/max — ONE small
        aggregate, persisted, its count is the kernel-running action),
        a scan of the touched buckets' versions joined against the
        folded messages (broadcast when the fold is small: sparse
        rounds never shuffle state), strict-improvement filter, and an
        append-only write of the improvements as a new store version —
        which doubles as the next frontier.  Reads reconcile duplicate
        ids with the same min the algorithm folds with, so ordering is
        immaterial; compaction keeps per-bucket version lists bounded.
        """
        store = DeltaStateStore(
            self.spark, state_store_dir, n_buckets,
            max_versions=max_versions, monotone=monotone,
        )
        fold = F.min if monotone == "min" else F.max
        # Canonicalize the VALUE type to what every LATER version will
        # hold: delta rows carry the folded message as `value`, so v0
        # must already use the message's type — an int32-valued vertex
        # table would otherwise write v0 as int and v1+ as long, and
        # the multi-version parquet read fails on the physical-type
        # mismatch.  The id column keeps ITS type: blocks.route hashes
        # it, and xxhash64(int32) != xxhash64(long) for the same value
        # (bucket_expr casts internally for the same reason).
        from pyspark.sql.types import StructType

        msg_type = StructType.fromDDL(msg_schema)["msg"].dataType
        if resume_manifest is not None:
            store.restore(resume_manifest)
            if frontier is None:
                raise ValueError(
                    "incremental resume requires the committed round's "
                    "frontier (engine.resume provides it)"
                )
        else:
            canon = [
                F.col("id"),
                F.col("value").cast(msg_type).alias("value"),
            ] + [F.col(c) for c in state.columns if c not in ("id", "value")]
            store.init(state.select(*canon))  # v0 = full state
            if frontier is None:
                frontier = frontier_fn(store.read_version(0))
        wants_step = _kernel_wants_step(kernel)
        empty_frontier = self.spark.createDataFrame(
            [], StructType.fromDDL("id long").add("value", msg_type)
        )
        step = start_step
        while step < max_iter:
            step += 1
            round_t0 = time.monotonic()
            if pre_superstep is not None:
                pre_superstep(step)
            routed = blocks.route(frontier)
            kernel_fn = _bind_step(kernel, step) if wants_step else kernel
            msgs, _ = self._messages(
                blocks, routed, kernel_fn, msg_schema,
                prefilter_blocks=prefilter_blocks,
            )
            folded = (
                msgs.groupBy("dst").agg(fold("msg").alias("msg")).persist()
            )
            n_msgs = folded.count()  # runs the kernels exactly once
            if n_msgs == 0:
                folded.unpersist()
                metrics = {
                    "active": 0,
                    "superstep": step,
                    "algorithm": algorithm,
                    "round_sec": round(time.monotonic() - round_t0, 4),
                    "active_buckets": 0,
                }
                self.history.append(metrics)
                if post_superstep is not None:
                    post_superstep(step, metrics)
                break
            active_buckets = sorted(
                r[0]
                for r in folded.select(
                    store.bucket_expr(F.col("dst")).alias("b")
                )
                .distinct()
                .collect()
            )
            raw = store.read_buckets_raw(active_buckets)
            if strict:
                # O(touched buckets), not O(|V|): an unknown dst hashes
                # into its own bucket, and active_buckets covers every
                # message's bucket — so the already-pruned `raw` read is
                # a sufficient universe for the missing-vertex anti-join
                # (a full-manifest read here made every strict round
                # scan the whole store; r4 VERDICT "what's wrong" #1).
                if raw is None:
                    # n_msgs counts folded (distinct-dst) rows, not raw
                    # messages — say so (ADVICE r5: keep the two strict
                    # paths' diagnostics consistent)
                    raise ValueError(
                        f"Target vertex does not exist! ({n_msgs} distinct "
                        "target id(s) absent from the vertex set)"
                    )
                unknown = (
                    folded.select("dst")
                    .join(
                        raw.select(F.col("id").alias("dst")),
                        on="dst",
                        how="left_anti",
                    )
                    .count()
                )
                if unknown:
                    raise ValueError(
                        f"Target vertex does not exist! ({unknown} message(s) "
                        "target ids absent from the vertex set)"
                    )
            if raw is None:
                # no message targets any stored vertex -> nothing changes
                folded.unpersist()
                metrics = {
                    "active": 0,
                    "superstep": step,
                    "algorithm": algorithm,
                    "round_sec": round(time.monotonic() - round_t0, 4),
                    "active_buckets": 0,
                }
                self.history.append(metrics)
                if post_superstep is not None:
                    post_superstep(step, metrics)
                break
            fol = (
                F.broadcast(folded)
                if n_msgs <= delta_broadcast_rows
                else folded
            )
            cand = raw.join(fol, raw["id"] == fol["dst"], "inner")
            cur = cand.groupBy("id").agg(
                fold("value").alias("value"), fold("msg").alias("msg")
            )
            improved = (
                F.col("msg") < F.col("value")
                if monotone == "min"
                else F.col("msg") > F.col("value")
            )
            delta = cur.filter(improved).select(
                "id",
                F.col("msg").alias("value"),
                F.lit(True).alias("changed"),
            )
            obs = Observation(f"pcgraph_{algorithm}_step{step}")
            exprs = metrics_exprs or [F.count(F.lit(1)).alias("changed")]
            delta = (
                delta.observe(obs, *exprs)
                .select("id", "value")
                .withColumn("bucket", store.bucket_expr(F.col("id")))
            )
            vid = store.write_delta(  # THE materializing action
                delta,
                num_partitions=min(
                    int(self.spark.conf.get("spark.sql.shuffle.partitions")),
                    len(active_buckets),
                ),
            )
            folded.unpersist()
            observed = dict(obs.get)
            if metrics_exprs:
                metrics = (
                    metrics_post(observed, step) if metrics_post else observed
                )
            else:
                metrics = {"active": int(observed["changed"] or 0)}
            if "active" not in metrics:
                metrics["active"] = int(observed.get("changed") or 0)
            metrics.update(
                superstep=step,
                algorithm=algorithm,
                round_sec=round(time.monotonic() - round_t0, 4),
                active_buckets=len(active_buckets),
                store_version=vid,
            )
            # protect the round's delta: its rows are the next frontier,
            # read lazily below — compaction must not fold/delete it.
            # Stagger to n_buckets/4 per round so a full-frontier phase
            # (every bucket over budget at once) doesn't pay a
            # full-state rewrite in a single round.
            compacted = store.compact(
                protect=vid, max_buckets=max(1, n_buckets // 4)
            )
            if compacted:
                metrics["compacted_buckets"] = len(compacted)
            new_frontier = (
                store.read_version(vid)
                if metrics["active"]
                else empty_frontier
            )
            do_ckpt = (
                self.checkpoint_dir is not None
                and step % self.checkpoint_every == 0
            )
            if do_ckpt:
                metrics_meta = dict(metrics)
                metrics_meta["manifest"] = {
                    str(b): list(vs) for b, vs in store.manifest.items()
                }
                metrics_meta["n_buckets"] = store.n_buckets
                metrics_meta["monotone"] = monotone
                metrics_meta["state_store_dir"] = _store_dir_for_meta(
                    self.checkpoint_dir, state_store_dir
                )
                self._commit_round(
                    blocks, step, new_frontier, metrics_meta,
                    write_state=False,
                )
                store.mark_committed()
            frontier = new_frontier
            self.history.append(metrics)
            if post_superstep is not None:
                post_superstep(step, metrics)
            if metrics.get("converged") or metrics["active"] == 0:
                break
        return store.read_reconciled(), self.history

    # ------------------------------------------------------------------
    def _commit_round(
        self,
        blocks: GraphBlocks,
        step: int,
        frontier: DataFrame,
        metrics: dict,
        write_state: bool = True,
    ) -> None:
        """Write frontier + meta for a checkpointed round (state already
        written); the atomic meta rename is the commit marker.

        ``write_state=False`` is the incremental-store mode: the state
        lives in the BucketedStateStore and the meta's ``manifest``
        (bucket -> version) IS the state pointer — per-partition lineage
        without re-copying the state."""
        rdir = _round_dir(self.checkpoint_dir, step)
        frontier.write.mode("overwrite").parquet(
            os.path.join(rdir, "frontier.parquet")
        )
        meta = dict(metrics)
        if self.partition_metrics:
            pp = blocks.route(frontier).groupBy("partition_id").count().collect()
            meta["frontier_rows_per_partition"] = {
                int(r["partition_id"]): int(r["count"]) for r in pp
            }
        parent = step - self.checkpoint_every
        # Paths are stored RELATIVE to checkpoint_dir so a checkpoint
        # directory can be relocated (or live on a shared filesystem
        # mounted at a different path) and still resume.
        rel = os.path.basename(rdir.rstrip("/"))
        meta.update(
            committed=True,
            parent_round=parent if parent > 0 else None,
            frontier_path=os.path.join(rel, "frontier.parquet"),
        )
        if write_state:
            meta["state_path"] = os.path.join(rel, "state.parquet")
        # Routed through the Hadoop FileSystem API so checkpoint_dir may
        # be hdfs:// / s3a:// on a cluster (north rule: resumable).
        write_json_atomic(self.spark, os.path.join(rdir, META_NAME), meta)

    # ------------------------------------------------------------------
    @staticmethod
    def latest_round(checkpoint_dir: str, spark: SparkSession | None = None) -> dict | None:
        """Find the newest committed round's meta (resume point)."""
        if spark is None:
            spark = SparkSession.getActiveSession()
        best = None
        for name in fs_list_dirs(spark, checkpoint_dir):
            meta_path = os.path.join(checkpoint_dir, name, META_NAME)
            if name.startswith("round=") and fs_exists(spark, meta_path):
                meta = read_json(spark, meta_path)
                if meta.get("committed"):
                    best = meta
        return best

    def resume(self, checkpoint_dir: str) -> tuple[DataFrame, DataFrame, dict] | None:
        """Load (state, frontier, meta) of the latest committed round.

        Incremental-store rounds carry a ``manifest`` instead of a
        ``state_path``; the returned state is the store view at that
        round (callers pass ``meta['manifest']`` back through
        ``run(resume_manifest=...)`` to continue incrementally)."""
        meta = self.latest_round(checkpoint_dir, self.spark)
        if meta is None:
            return None

        def _abspath(p: str) -> str:  # absolute paths = pre-relative-meta runs
            if "://" in p or os.path.isabs(p):
                return p
            return os.path.join(checkpoint_dir, p)

        if "manifest" in meta:
            mf = meta["manifest"]
            # The committed round records where its store lives (a
            # caller-configured --state-store-dir need not be under the
            # checkpoint dir); pre-r5 metas lack the key and used the
            # default location.
            store_root = _abspath(
                meta.get("state_store_dir", "statestore")
            )
            meta["state_store_dir_resolved"] = store_root
            if any(isinstance(v, (list, tuple)) for v in mf.values()):
                dstore = DeltaStateStore(
                    self.spark,
                    store_root,
                    int(meta.get("n_buckets", 256)),
                    monotone=meta.get("monotone", "min"),
                )
                dstore.restore(mf)
                state = dstore.read_reconciled()
            else:
                store = BucketedStateStore(
                    self.spark,
                    store_root,
                    int(meta.get("n_buckets", 256)),
                )
                store.restore(mf)
                state = store.read_full()
        else:
            state = self.spark.read.parquet(_abspath(meta["state_path"]))
        frontier = self.spark.read.parquet(_abspath(meta["frontier_path"]))
        return state, frontier, meta
