"""AQE skew-join: prove the engine's answer to hot join keys actually
engages.  With skew thresholds lowered to test scale, a join against a
heavily skewed build side must (a) produce correct results and (b) show
the skew=true marker in the final adaptive sort-merge join plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_conf(spark):
    keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_and_stays_correct(skew_conf):
    spark = skew_conf
    # 50k rows of key 0 (hot) + 1k spread keys, joined to a 1k-key dim
    fact = spark.range(51_000).select(
        F.when(F.col("id") < 50_000, 0).otherwise(F.col("id") - 50_000 + 1).alias("k"),
        F.concat(F.lit("payload_"), F.col("id")).alias("payload"),
    )
    dim = spark.range(1_001).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    joined = fact.join(dim, "k")
    rows = joined.collect()  # executes THIS DataFrame's query execution
    assert len(rows) == 51_000
    assert sum(1 for r in rows if r["k"] == 0) == 50_000
    # execution finalized the adaptive plan on the same QueryExecution —
    # the hot partition must have been split (skew=true marker on the SMJ)
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final_plan, final_plan[:2000]
