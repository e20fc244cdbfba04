"""Explain-audit the LPA update plan: count Exchanges before/after the
single-shuffle rewrite.  Run: python scripts/explain_lpa_update.py"""
import re

from pcgraph.session import get_spark
from pcgraph import fixtures
from pcgraph.algos.labelprop import label_propagation

spark = get_spark("lpa-explain", cores=4, shuffle_partitions=8)
spark.conf.set("spark.sql.adaptive.enabled", "false")

edges = spark.createDataFrame(fixtures.odd_even_graph(n=200))

captured = {}

import pcgraph.engine as eng

orig_loop = eng.PCEngine._run_loop


def spy_loop(self, blocks, state, frontier, kernel, msg_schema, update, *a, **kw):
    def spied_update(s, m, step):
        out = update(s, m, step)
        if step == 2:  # round 2: state side is a round-1 checkpoint (steady shape)
            captured["plan"] = out._sc._jvm.PythonSQLUtils.explainString(
                out._jdf.queryExecution(), "formatted"
            )
        return out

    return orig_loop(self, blocks, state, frontier, kernel, msg_schema,
                     spied_update, *a, **kw)


eng.PCEngine._run_loop = spy_loop
label_propagation(spark, edges, max_iter=3, num_partitions=4)
plan = captured["plan"]
n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
n_ensure = len(re.findall(r"ENSURE_REQUIREMENTS", plan))
print(plan)
print(f"\n=== exchanges: {n_exchange} (ENSURE_REQUIREMENTS: {n_ensure}) ===")
