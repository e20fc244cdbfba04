"""The partition-centric superstep loop (driver-side delta iteration).

Spark has no engine-level delta iteration (Flink:
/root/reference/src/main/java/org/apache/flink/graph/partition/centric/
PartitionCentricIteration.java:89-112 — iterateDelta + closeWith), so
the loop lives in the driver.  One global superstep =

    frontier --route(partition_id, mirrors)--> cogroup with CSR blocks
      --applyInPandas(kernel: many LOCAL supersteps, vectorized numpy)-->
      messages [dst, ...] --groupBy(dst).agg(fold) [Catalyst gives the
      map-side combiner the reference lacks]--> state merge -->
      changed-filter --> next frontier

Convergence = empty frontier (reference semantics) or an
algorithm-supplied metric (PageRank L1 < tol).  Lineage is truncated
every round (``localCheckpoint`` — plans would otherwise grow linearly
with supersteps); every ``checkpoint_every`` rounds state+frontier go to
Parquet with a ``_meta.json`` carrying superstep number, metrics,
per-partition frontier counts and a parent pointer, so runs resume
mid-iteration (north rule: resumable with per-partition lineage).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .partition import GraphBlocks

META_NAME = "_meta.json"


def _round_dir(checkpoint_dir: str, step: int) -> str:
    return os.path.join(checkpoint_dir, f"round={step:05d}")


class PCEngine:
    """Generic partition-centric iteration runner.

    The algorithm supplies:
      * ``kernel(key, frontier_pdf, block_pdf) -> messages_pdf`` — the
        per-partition vectorized local computation (analog of the
        reference's PartitionProcessFunction.processPartition,
        PartitionProcessFunction.java:78-89);
      * ``msg_schema`` — DDL schema of the messages DataFrame;
      * ``update(state, msgs, step) -> new_state`` — global fold +
        vertex update (analog of VertexUpdateFunction.updateVertex,
        VertexUpdateFunction.java:42-56); lazy, engine materializes;
      * ``frontier_fn(new_state) -> frontier[id, value]`` — the changed
        set (analog of setNewVertexValue's emit-on-change,
        VertexUpdateFunction.java:85-93);
      * optional ``metrics_fn(new_state, step) -> dict`` — one action
        over the materialized state (e.g. PageRank L1 delta); may set
        ``active`` and ``converged``.
    """

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 1,
        partition_metrics: bool | None = None,
    ):
        self.spark = spark
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = max(1, checkpoint_every)
        if partition_metrics is None:
            partition_metrics = checkpoint_dir is not None
        self.partition_metrics = partition_metrics
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
        start_step: int = 0,
        algorithm: str = "custom",
    ) -> tuple[DataFrame, list[dict]]:
        state = state.localCheckpoint(eager=True)
        if frontier is None:
            frontier = frontier_fn(state)
        step = start_step
        while step < max_iter:
            step += 1
            round_t0 = time.monotonic()
            routed = blocks.route(frontier)
            msgs = (
                routed.groupby("partition_id")
                .cogroup(blocks.blocks.groupby("partition_id"))
                .applyInPandas(kernel, schema=msg_schema)
            )
            new_state = update(state, msgs, step)

            do_ckpt = (
                self.checkpoint_dir is not None and step % self.checkpoint_every == 0
            )
            if do_ckpt:
                rdir = _round_dir(self.checkpoint_dir, step)
                new_state.write.mode("overwrite").parquet(
                    os.path.join(rdir, "state.parquet")
                )
                new_state = self.spark.read.parquet(
                    os.path.join(rdir, "state.parquet")
                )
            else:
                # Eager localCheckpoint: one materializing job per round,
                # truncating lineage immediately.  Plain persist() lets the
                # logical plan grow exponentially (state appears twice per
                # round: state + frontier), blowing up analysis time by
                # superstep ~8; lazy (eager=False) measured ~6x slower
                # rounds in local mode.
                new_state = new_state.localCheckpoint(eager=True)

            new_frontier = frontier_fn(new_state)
            metrics = metrics_fn(new_state, step) if metrics_fn else {}
            if "active" not in metrics:
                metrics["active"] = new_frontier.count()
            metrics.update(
                superstep=step,
                algorithm=algorithm,
                round_sec=round(time.monotonic() - round_t0, 4),
            )

            if do_ckpt:
                self._commit_round(blocks, step, new_frontier, metrics)
            # release the previous round's localCheckpoint blocks
            try:
                state.unpersist()
            except Exception:  # reading from parquet after a checkpoint round
                pass
            state, frontier = new_state, new_frontier
            self.history.append(metrics)
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
