"""PCGraph — the user-facing facade (reference parity: PCGraph.java).

The reference's entire extension surface is two abstract classes —
``PartitionProcessFunction`` (PartitionProcessFunction.java:40-90) and
``VertexUpdateFunction`` (VertexUpdateFunction.java:42-116) — wired by
``PCGraph.runPartitionCentricIteration(ppf, vuf, maxIterations)``
(PCGraph.java:42-55).  Our equivalent: a user supplies

  * ``kernel(key, frontier_pdf, block_pdf) -> messages_pdf`` — the
    partition process function (vectorized pandas, many local supersteps
    per call);
  * ``msg_schema`` — DDL schema of the message DataFrame;
  * a *fold spec*: either one of the built-in folds ("min", "max",
    "sum") applied to the ``msg`` column, or a custom
    ``update(state, msgs, step) -> new_state`` (the vertex update
    function; new_state must carry a boolean ``changed`` column).

Built-in algorithms are exposed as methods so a reference user can
switch 1:1 (PCConnectedComponents.run -> PCGraph.connected_components).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import PCEngine
from .partition import (
    GraphBlocks,
    build_blocks,
    degrees,
    ensure_block_store,
    vertex_ids,
)

_FOLDS = {"min": F.min, "max": F.max, "sum": F.sum}


class PCGraph:
    """A (vertices, edges) pair + the partition-centric iteration runner."""

    def __init__(
        self,
        spark: SparkSession,
        edges: DataFrame,
        vertices: DataFrame | None = None,
        num_partitions: int = 16,
        salt_threshold: int | None = None,
        weighted: bool = False,
        store_dir: str | None = None,
    ):
        self.spark = spark
        self.edges = edges
        self.vertices = vertices
        self.num_partitions = num_partitions
        self.salt_threshold = salt_threshold
        self.weighted = weighted
        self.store_dir = store_dir
        self._blocks: GraphBlocks | None = None

    # -------------------------------------------------------- topology
    @property
    def blocks(self) -> GraphBlocks:
        """The graph's CSR blocks — cogroup mode by default; with
        ``store_dir`` set, a worker-readable block store (topology never
        crosses Arrow per round; the at-scale iteration path)."""
        if self._blocks is None:
            if self.store_dir is not None:
                self._blocks = ensure_block_store(
                    self.spark,
                    self.edges,
                    self.num_partitions,
                    self.store_dir,
                    salt_threshold=self.salt_threshold,
                    weighted=self.weighted,
                    tag="directed" + ("-w" if self.weighted else ""),
                )
            else:
                self._blocks = build_blocks(
                    self.spark,
                    self.edges,
                    self.num_partitions,
                    salt_threshold=self.salt_threshold,
                    weighted=self.weighted,
                )
        return self._blocks

    def vertex_set(self) -> DataFrame:
        vset = vertex_ids(self.edges)
        if self.vertices is not None:
            vset = vset.union(self.vertices.select("id")).distinct()
        return vset

    def degrees(self) -> DataFrame:
        return degrees(self.edges)

    def unpersist(self) -> None:
        if self._blocks is not None:
            self._blocks.unpersist()
            self._blocks = None

    # -------------------------------------------------------- iteration
    def run_partition_centric_iteration(
        self,
        kernel: Callable,
        msg_schema: str,
        initial_value,
        fold: str | Callable = "min",
        update: Callable | None = None,
        max_iter: int = 100,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 1,
        emit_on: str = "change",
        sum_tol: float | None = None,
        strict: bool = False,
        prefilter_blocks: bool = False,
        pre_superstep: Callable | None = None,
        post_superstep: Callable | None = None,
    ) -> tuple[DataFrame, list[dict]]:
        """Run a custom iteration; returns (DataFrame[id, value], metrics).

        ``initial_value`` is a Column or literal seeding every vertex
        (reference: vertex init mapper, Graph.fromDataSet).  With a
        built-in ``fold``, the vertex update is
        ``value' = fold(value, fold(messages))`` with emit-on-strict-
        change semantics (VertexUpdateFunction.java:85-93); pass
        ``update`` for anything richer.

        ``kernel`` may declare a 4th parameter to receive the 1-based
        superstep number — ``kernel(key, frontier_pdf, block_pdf,
        step)`` — for step-dependent logic (reference:
        getSuperstepNumber, VertexUpdateFunction.java:77-79);
        ``pre_superstep(step)`` / ``post_superstep(step, metrics)`` are
        the driver-side lifecycle hooks (PartitionProcessFunction.java:
        45-63).

        ``fold="sum"`` semantics: a vertex that receives any message
        stays active, so on cyclic graphs the iteration ACCUMULATES for
        exactly ``max_iter`` rounds and does not converge on its own —
        that is the meaningful default for sum-folds (e.g. counting
        walks).  Pass ``sum_tol`` to instead deactivate vertices whose
        incoming sum has magnitude <= sum_tol (convergence for decaying
        quantities like rank mass).

        ``strict=True`` raises if a kernel message targets an id
        outside the vertex set (reference: "Target vertex does not
        exist!", PartitionCentricIteration.java:216-227).
        """
        state = self.vertex_set().select(
            "id",
            (initial_value if not isinstance(initial_value, (int, float))
             else F.lit(initial_value)).alias("value"),
            F.lit(True).alias("changed"),
        )

        if update is None:
            if not isinstance(fold, str) or fold not in _FOLDS:
                raise ValueError(f"fold must be one of {sorted(_FOLDS)} or pass update=")
            agg = _FOLDS[fold]
            better = F.col("msg") < F.col("value") if fold == "min" else (
                F.col("msg") > F.col("value") if fold == "max" else F.lit(True)
            )

            def update(state_df, msgs, step):  # noqa: ANN001
                folded = msgs.groupBy("dst").agg(agg("msg").alias("msg"))
                joined = state_df.select("id", "value").join(
                    folded, state_df["id"] == folded["dst"], "left"
                )
                new_value = (
                    F.when(F.col("msg").isNotNull() & better, F.col("msg"))
                    .otherwise(F.col("value"))
                    if fold != "sum"
                    else F.col("value") + F.coalesce(F.col("msg"), F.lit(0))
                )
                if fold != "sum":
                    changed = F.coalesce(better, F.lit(False))
                elif sum_tol is not None:
                    changed = F.coalesce(
                        F.abs(F.col("msg")) > F.lit(sum_tol), F.lit(False)
                    )
                else:
                    changed = F.col("msg").isNotNull()
                return joined.select(
                    "id", new_value.alias("value"), changed.alias("changed")
                )

        engine = PCEngine(
            self.spark,
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
        )
        frontier_fn = (
            (lambda s: s.filter("changed").select("id", "value"))
            if emit_on == "change"
            else (lambda s: s.select("id", "value"))
        )
        state, history = engine.run(
            blocks=self.blocks,
            state=state,
            frontier=None,  # derived from the checkpointed state
            kernel=kernel,
            msg_schema=msg_schema,
            update=update,
            frontier_fn=frontier_fn,
            max_iter=max_iter,
            algorithm="custom",
            strict=strict,
            prefilter_blocks=prefilter_blocks,
            pre_superstep=pre_superstep,
            post_superstep=post_superstep,
        )
        return state.select("id", "value"), history

    # -------------------------------------------------------- library
    def connected_components(self, **kw) -> tuple[DataFrame, list[dict]]:
        from .algos.cc import connected_components

        return connected_components(
            self.spark, self.edges, vertices=self.vertices,
            num_partitions=self.num_partitions,
            salt_threshold=self.salt_threshold, **kw,
        )

    def pagerank(self, **kw) -> tuple[DataFrame, list[dict]]:
        from .algos.pagerank import pagerank

        # PageRank runs on the raw directed edges — exactly what
        # self.blocks holds — so the cached CSR build is reused (the
        # build's full edge shuffle is amortized across algorithms).
        # With store_dir set, self.blocks IS the store handle.
        kw.setdefault(
            "blocks", self.blocks if self.store_dir is not None else self._blocks
        )
        return pagerank(
            self.spark, self.edges, vertices=self.vertices,
            num_partitions=self.num_partitions,
            salt_threshold=self.salt_threshold, weighted=self.weighted, **kw,
        )

    def label_propagation(self, **kw) -> tuple[DataFrame, list[dict]]:
        from .algos.labelprop import label_propagation

        # Cached blocks hold the raw directed edges, valid only for the
        # directed LPA variant (the undirected one symmetrizes first).
        if kw.get("directed"):
            kw.setdefault("blocks", self._blocks)
        return label_propagation(
            self.spark, self.edges, vertices=self.vertices,
            num_partitions=self.num_partitions,
            salt_threshold=self.salt_threshold, **kw,
        )

    def sssp(self, source: int, **kw) -> tuple[DataFrame, list[dict]]:
        from .algos.sssp import sssp

        return sssp(
            self.spark, self.edges, source, vertices=self.vertices,
            num_partitions=self.num_partitions,
            salt_threshold=self.salt_threshold, **kw,
        )

    def triangle_count(self) -> int:
        from .algos.triangles import triangle_count

        return triangle_count(self.edges)
