#!/usr/bin/env python
"""A/B: eager vs lazy localCheckpoint on connected_components' edge staging
(dedup/cluster.py), on exactly the near_dup_clusters headline query at sf0.1.

Verdict r6 "What's wrong #2": near_dup_clusters regressed 2.28 -> 3.15 s in
the driver bench after the round-6 lazy-checkpoint change (c2c4097); the A/B
decides eager-vs-lazy from a within-run comparison on an idle host.

Protocol (per quiet-host-benchmarking rules): one SparkSession, warmup run of
each variant first (discarded), then 3 alternating timed runs per variant,
rebuilding the DataFrame per run; report min and all samples.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "16")
os.environ.setdefault("SPARK_GRAFT_HASH_MODE", "fast")

from datapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_once(spark, eager: bool) -> float:
    os.environ["SPARK_GRAFT_CC_EAGER"] = "1" if eager else "0"
    from datapipeline_spark.queries_data import REGISTRY

    fn = REGISTRY["near_dup_clusters"][0]
    t0 = time.perf_counter()
    df = fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark()
    # warmup both variants (codegen/JIT)
    run_once(spark, True)
    run_once(spark, False)
    samples = {"eager": [], "lazy": []}
    for _ in range(3):
        samples["eager"].append(run_once(spark, True))
        samples["lazy"].append(run_once(spark, False))
    out = {
        "query": "near_dup_clusters",
        "sf_dir": SF_DIR,
        "eager_min": min(samples["eager"]),
        "lazy_min": min(samples["lazy"]),
        "samples": samples,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
