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

Lineage/partitioning strategy (the two scale killers, measured):
  * The FRONTIER is eagerly ``localCheckpoint``-ed every round.  The
    frontier is the only place ``state`` is referenced twice per round
    (messages + merge); checkpointing it makes the state plan chain
    LINEAR instead of exponential (plain per-round persist blew up
    analysis time by superstep ~8 in round-1 measurements).
  * The STATE is ``persist()``-ed, NOT localCheckpoint-ed, between
    truncations: a checkpointed DataFrame comes back as an opaque
    ``Scan ExistingRDD`` with unknown partitioning, forcing a full
    re-shuffle + re-sort of all N vertices on the state side of the
    merge join every superstep.  A persisted join output keeps its
    hash(id) partitioning AND sort order, so steady-state rounds show
    NO Exchange and NO Sort on the state side — the only shuffle per
    superstep is the (combined) message fold.  Every
    ``truncate_every`` rounds the chain is cut with one eager
    localCheckpoint (bounded analysis cost, bounded recompute window).

Every ``checkpoint_every`` rounds state+frontier go to Parquet with a
``_meta.json`` carrying superstep number, metrics, per-partition
frontier counts and a parent pointer, so runs resume mid-iteration
(north rule: resumable with per-partition lineage).
"""

from __future__ import annotations

import inspect
import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .partition import GraphBlocks

META_NAME = "_meta.json"


def _round_dir(checkpoint_dir: str, step: int) -> str:
    return os.path.join(checkpoint_dir, f"round={step:05d}")


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
        VertexUpdateFunction.java:85-93);
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
        truncate_every: int = 8,
        aqe_in_loop: bool = False,
    ):
        self.spark = spark
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = max(1, checkpoint_every)
        if partition_metrics is None:
            partition_metrics = checkpoint_dir is not None
        self.partition_metrics = partition_metrics
        self.truncate_every = max(1, truncate_every)
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
        frontier_checkpoint: bool = True,
        pre_superstep: Callable[[int], None] | None = None,
        post_superstep: Callable[[int, dict], None] | None = None,
    ) -> tuple[DataFrame, list[dict]]:
        """Iterate to convergence.

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
        set ``active``/``converged``).
        """
        conf = self.spark.conf
        aqe_prev = conf.get("spark.sql.adaptive.enabled", "true")
        if not self.aqe_in_loop:
            conf.set("spark.sql.adaptive.enabled", "false")
        try:
            return self._run_loop(
                blocks, state, frontier, kernel, msg_schema, update,
                frontier_fn, max_iter, metrics_fn, metrics_exprs,
                metrics_post, start_step, algorithm, prefilter_blocks,
                strict, frontier_checkpoint, pre_superstep, post_superstep,
            )
        finally:
            conf.set("spark.sql.adaptive.enabled", aqe_prev)

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
        frontier_checkpoint: bool,
        pre_superstep: Callable[[int], None] | None,
        post_superstep: Callable[[int, dict], None] | None,
    ) -> tuple[DataFrame, list[dict]]:
        state = state.localCheckpoint(eager=True)
        last_trunc: DataFrame | None = state  # current lineage root
        if frontier is None:
            frontier = frontier_fn(state)
        # The frontier is the node referenced twice per round (kernel
        # input + being derived from the state both paths of the merge);
        # an eager localCheckpoint keeps the state lineage linear.  It
        # happens at the END of each round (the round's one materializing
        # action, which also populates the state cache and fires the
        # observation metrics); the initial frontier is cut here.
        #
        # ``frontier_checkpoint=False`` (full-frontier algorithms like
        # PageRank/sync LPA, where the frontier is ~|V| every round):
        # skip the per-round frontier materialization — at 316M edges
        # that is a 3.1 GB object-form RDD written AND re-read every
        # round for data the state cache already holds.  The frontier
        # stays a lazy projection of the persisted state; the analyzed
        # plan then doubles per round (state referenced twice), so the
        # truncation cadence bounds it at 2^truncate_every copies —
        # keep truncate_every <= ~4 in this mode.
        if frontier_checkpoint:
            frontier = frontier.localCheckpoint(eager=True)
        wants_step = _kernel_wants_step(kernel)
        step = start_step
        rounds_since_truncate = 0
        while step < max_iter:
            step += 1
            round_t0 = time.monotonic()
            if pre_superstep is not None:
                pre_superstep(step)
            routed = blocks.route(frontier)

            kernel_fn = _bind_step(kernel, step) if wants_step else kernel
            active_partitions = None
            if blocks.store_path is not None:
                # Block-store mode: the grouped-map only materializes
                # groups the frontier touches, and each kernel reads its
                # own partition's CSR rows worker-side — no JVM cache
                # scan, no Arrow transfer of the topology, and inactive
                # partitions are free (prefiltering is structural).
                msgs = routed.groupby("partition_id").applyInPandas(
                    _bind_store(kernel_fn, blocks.store_path),
                    schema=msg_schema,
                )
            else:
                blocks_df = blocks.blocks
                if prefilter_blocks:
                    pids = [
                        r[0]
                        for r in routed.select("partition_id").distinct().collect()
                    ]
                    active_partitions = len(pids)
                    blocks_df = blocks_df.filter(
                        F.col("partition_id").isin(pids)
                    )
                msgs = (
                    routed.groupby("partition_id")
                    .cogroup(blocks_df.groupby("partition_id"))
                    .applyInPandas(kernel_fn, schema=msg_schema)
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
                obs = Observation(f"pcgraph_{algorithm}_step{step}")
                new_state = new_state.observe(obs, *metrics_exprs)

            do_ckpt = (
                self.checkpoint_dir is not None and step % self.checkpoint_every == 0
            )
            rounds_since_truncate += 1
            truncated = False
            if do_ckpt:
                rdir = _round_dir(self.checkpoint_dir, step)
                new_state.write.mode("overwrite").parquet(
                    os.path.join(rdir, "state.parquet")
                )
                new_state = self.spark.read.parquet(
                    os.path.join(rdir, "state.parquet")
                )
                truncated = True
            elif rounds_since_truncate >= self.truncate_every:
                # Cut the (linear) plan chain: one eager materializing
                # job.  Costs one state re-shuffle on the NEXT round's
                # merge (checkpointed scans lose partitioning) — paid
                # once per truncate_every rounds instead of every round.
                new_state = new_state.localCheckpoint(eager=True)
                truncated = True
            else:
                # Persist keeps hash(id) partitioning + sort order from
                # the merge join, so next round's merge needs no state-
                # side Exchange; materialized by the metrics action (or
                # the frontier checkpoint) below.
                new_state = new_state.persist()

            new_frontier = frontier_fn(new_state)
            # THE materializing action of the round: populates the state
            # cache (persist branch), cuts the frontier lineage, and
            # fires the observation metrics — one job, one data pass.
            if frontier_checkpoint:
                new_frontier = new_frontier.localCheckpoint(eager=True)
            elif not truncated:
                # no frontier materialization in this mode — the persist
                # branch still needs one action to populate the state
                # cache and fire the observation
                new_state.count()
            if obs is not None:
                observed = dict(obs.get)
                metrics = (
                    metrics_post(observed, step) if metrics_post else observed
                )
            elif metrics_fn:
                metrics = metrics_fn(new_state, step)
            else:
                metrics = {}
            if "active" not in metrics:
                # cheap: counts the already-materialized checkpoint RDD
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
            # Release the PREVIOUS round's cache blocks now: the new
            # state is fully materialized (MEMORY_AND_DISK, never
            # silently lost in-process), so the old frontier/state are
            # only needed if a recompute walks past them — bounded by
            # the last truncation, which is exactly the durability
            # contract.  Holding a whole epoch (measured: ~5 GB of
            # frontier checkpoint + state persist PER ROUND at 316M
            # edges) starves execution memory and turns every sort/agg
            # page allocation into storage-eviction churn on the
            # UnifiedMemoryManager lock.
            for df in (frontier, state if state is not last_trunc else None):
                if df is not None:
                    try:
                        df.unpersist()
                    except Exception:
                        pass
            if truncated:
                rounds_since_truncate = 0
                if last_trunc is not None and last_trunc is not state:
                    try:
                        last_trunc.unpersist()
                    except Exception:
                        pass
                last_trunc = new_state
            state, frontier = new_state, new_frontier
            self.history.append(metrics)
            if post_superstep is not None:
                post_superstep(step, metrics)
            if metrics.get("converged") or metrics["active"] == 0:
                break
        return state, self.history

    # ------------------------------------------------------------------
    def _commit_round(
        self, blocks: GraphBlocks, step: int, frontier: DataFrame, metrics: dict
    ) -> None:
        """Write frontier + meta for a checkpointed round (state already
        written); the atomic meta rename is the commit marker."""
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
            state_path=os.path.join(rel, "state.parquet"),
            frontier_path=os.path.join(rel, "frontier.parquet"),
        )
        tmp = os.path.join(rdir, META_NAME + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(meta, fh, indent=1, default=str)
        os.replace(tmp, os.path.join(rdir, META_NAME))

    # ------------------------------------------------------------------
    @staticmethod
    def latest_round(checkpoint_dir: str) -> dict | None:
        """Find the newest committed round's meta (resume point)."""
        if not os.path.isdir(checkpoint_dir):
            return None
        best = None
        for name in sorted(os.listdir(checkpoint_dir)):
            meta_path = os.path.join(checkpoint_dir, name, META_NAME)
            if name.startswith("round=") and os.path.exists(meta_path):
                with open(meta_path) as fh:
                    meta = json.load(fh)
                if meta.get("committed"):
                    best = meta
        return best

    def resume(self, checkpoint_dir: str) -> tuple[DataFrame, DataFrame, dict] | None:
        """Load (state, frontier, meta) of the latest committed round."""
        meta = self.latest_round(checkpoint_dir)
        if meta is None:
            return None

        def _abspath(p: str) -> str:  # absolute paths = pre-relative-meta runs
            return p if os.path.isabs(p) else os.path.join(checkpoint_dir, p)

        state = self.spark.read.parquet(_abspath(meta["state_path"]))
        frontier = self.spark.read.parquet(_abspath(meta["frontier_path"]))
        return state, frontier, meta
