"""Round-6 fan-out helper: behavior contract.

fan_out must (a) repartition an under-parallel input up to the session
core budget, (b) pass through an input that already has enough
partitions UNCHANGED (no extra shuffle at scale), and (c) never change
the row multiset.
"""

from scylla_cdc_java_spark.datapipe.fanout import fan_out


def test_fans_under_parallel_input(spark):
    df = spark.range(0, 1000).coalesce(1)
    out = fan_out(df, "id")
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == target
    assert sorted(r["id"] for r in out.collect()) == list(range(1000))


def test_noop_when_already_parallel(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).repartition(target + 1)
    out = fan_out(df, "id")
    # same object back: no repartition node added
    assert out is df


def test_keyless_fallback_preserves_rows(spark):
    df = spark.range(0, 500).coalesce(1)
    out = fan_out(df)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    assert sorted(r["id"] for r in out.collect()) == list(range(500))


def test_explicit_min_partitions(spark):
    df = spark.range(0, 100).coalesce(1)
    out = fan_out(df, "id", min_partitions=5)
    assert out.rdd.getNumPartitions() == 5
