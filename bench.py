"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is executed with a full materialization
(``df.write.format('noop')``) so the measured time is the whole plan,
not a lazy handle. One warm-up of the smallest query amortizes JVM/
codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from marketing_attribution_etl_framework__maef_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("maef-bench")

    queries = entrymod.queries()
    # warm-up: run every query once at the smallest SF (or, failing
    # that, a 3-query subset at the target SF) so JVM JIT + whole-stage
    # codegen classes + parquet footer caches exist before timing —
    # the measured numbers are steady-state per-query cost, not
    # first-compilation noise (cold-vs-warm measured 9.5 s vs 2.5 s on
    # the simhash shape).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for fn in queries.values():
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
    else:
        for warm in ("maef_channel_report", "llm_multimodal_meta", "llm_ann_ivf"):
            queries[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
