"""Runtime bloom-filter join pruning: measured evidence for BENCH.md.

Runs plans/bloom_demo.py::promo_brand_revenue at $SPARK_GRAFT_SF_DIR
twice — session defaults (no injection; the 10GB application-side
threshold is never met locally) vs the demo thresholds (bloom injected
on the fact side) — and reports best-of-N wall plus the rows that
actually crossed the fact-side shuffle, read from the executed plan's
SQLMetrics (AQE off for this probe so the plan tree is walkable).

Usage: python scripts/bench_bloom.py [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scaling import wait_for_quiet_host  # noqa: E402
from fec_cn_support_etl_spark.session import get_spark  # noqa: E402


def shuffle_records(df) -> dict[str, int]:
    """Sum 'records written' over ShuffleExchangeExec nodes of the
    EXECUTED plan (call after an action).  Keyed by child scan hint so
    the fact-side exchange is identifiable."""
    qe = df._jdf.queryExecution()
    root = qe.executedPlan()
    out: dict[str, int] = {}
    stack = [root]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if name == "ShuffleExchangeExec":
            mets = node.metrics()
            it = mets.iterator()
            val = None
            while it.hasNext():
                kv = it.next()
                if kv._1() == "shuffleRecordsWritten":
                    val = kv._2().value()
            label = node.child().toString().splitlines()[0][:60]
            out[label] = out.get(label, 0) + int(val or 0)
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


#: the three regimes: session defaults (dim broadcasts at this scale —
#: no fact-side shuffle at all), the past-broadcast regime WITHOUT the
#: runtime filter (what a naive shuffle join pays), and the same regime
#: WITH the bloom injected (what this demo buys back).
ARMS = {
    "default_broadcast": {},
    "shuffle_no_bloom": {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
    },
    "shuffle_bloom": None,  # BLOOM_DEMO_CONFS
}


def run(spark, sf_dir: str, arm: str, trials: int) -> dict:
    from fec_cn_support_etl_spark.plans.bloom_demo import (
        BLOOM_DEMO_CONFS,
        has_runtime_bloom,
        promo_brand_revenue,
        scoped_confs,
    )

    confs = dict(BLOOM_DEMO_CONFS) if ARMS[arm] is None else dict(ARMS[arm])
    confs["spark.sql.adaptive.enabled"] = "false"  # walkable plan tree
    best, recs, injected = float("inf"), None, None
    with scoped_confs(spark, confs):
        for _ in range(trials):
            wait_for_quiet_host(max_wait_sec=60)
            df = promo_brand_revenue(spark, sf_dir)
            t0 = time.time()
            rows = df.collect()  # same Dataset/QueryExecution -> live SQLMetrics
            best = min(best, time.time() - t0)
            assert len(rows) > 0
            if recs is None:
                recs = shuffle_records(df)
                injected = has_runtime_bloom(df)
    return {
        "bloom_injected": injected,
        "wall_sec_best": round(best, 3),
        "shuffle_records_by_exchange": recs,
        "total_shuffle_records": sum((recs or {}).values()),
    }


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bloom-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    for arm in ARMS:  # warm codegen per plan shape
        run(spark, "/root/testdata/sf0.001", arm, trials=1)
    out = {"sf_dir": sf_dir}
    for arm in ARMS:
        out[arm] = run(spark, sf_dir, arm, trials=trials)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
