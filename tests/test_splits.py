"""Histogram-balanced split planning (SplitsProvider /
RowRangeHistogramStatistics analog)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geowave_spark.plans.splits import (
    equi_depth_bounds,
    merged_histogram,
    repartition_by_splits,
    split_column,
    update_histogram_statistics,
)


@pytest.fixture()
def skewed_df(spark):
    rng = np.random.default_rng(13)
    # heavy-tailed cell ids: equal-width ranges would be badly unbalanced
    vals = np.concatenate(
        [
            rng.integers(0, 100, 30_000),  # hot head
            rng.integers(100, 100_000, 10_000),  # long tail
        ]
    ).astype(np.float64)
    pdf = pd.DataFrame({"cell": vals, "part": (np.arange(len(vals)) % 7)})
    return spark.createDataFrame(pdf)


def test_histogram_merges_across_appends(spark, skewed_df, tmp_path):
    path = str(tmp_path / "store")
    a = skewed_df.where(F.col("part") < 3)
    b = skewed_df.where(F.col("part") >= 3)
    update_histogram_statistics(a, path, "part", "cell", 0.0, 100_000.0, 512)
    update_histogram_statistics(b, path, "part", "cell", 0.0, 100_000.0, 512)
    lo, hi, counts = merged_histogram(spark, path, "cell")
    assert (lo, hi) == (0.0, 100_000.0)
    assert counts.sum() == skewed_df.count()


def test_equi_depth_bounds_balance_skew(spark, skewed_df, tmp_path):
    path = str(tmp_path / "store")
    update_histogram_statistics(skewed_df, path, "part", "cell", 0.0, 100_000.0, 2048)
    bounds = equi_depth_bounds(spark, path, "cell", 8)
    assert len(bounds) == 7
    assert bounds == sorted(bounds)
    # each of the 8 ranges holds ≈ total/8 rows (± one bin's mass)
    sizes = (
        skewed_df.withColumn("_s", split_column("cell", bounds))
        .groupBy("_s")
        .count()
        .collect()
    )
    total = skewed_df.count()
    got = {r["_s"]: r["count"] for r in sizes}
    assert set(got) == set(range(8))
    for n in got.values():
        assert abs(n - total / 8) < total * 0.02
    # sanity: equal-WIDTH ranges would put ~75% of rows in the first slice
    head = skewed_df.where(F.col("cell") < 100_000.0 / 8).count()
    assert head > total * 0.7


def test_repartition_by_splits_balances_tasks(spark, skewed_df, tmp_path):
    path = str(tmp_path / "store")
    update_histogram_statistics(skewed_df, path, "part", "cell", 0.0, 100_000.0, 2048)
    n_tasks = 4
    bounds = equi_depth_bounds(spark, path, "cell", n_tasks * 4)
    out = repartition_by_splits(skewed_df, "cell", bounds, n_splits=n_tasks)
    sizes = (
        out.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    total = sum(counts)
    # oversplit+hash: max partition stays within 2× the mean
    assert max(counts) < 2.0 * total / n_tasks
    # and nothing was lost
    assert total == skewed_df.count()


def test_binning_disagreement_raises(spark, skewed_df, tmp_path):
    path = str(tmp_path / "store")
    update_histogram_statistics(skewed_df, path, "part", "cell", 0.0, 100_000.0, 512)
    update_histogram_statistics(skewed_df, path, "part", "cell", 0.0, 50_000.0, 512)
    with pytest.raises(ValueError, match="disagree"):
        merged_histogram(spark, path, "cell")


def test_catalog_write_maintains_histogram(spark, skewed_df, tmp_path):
    """checkpointed_write(histogram_field=...) keeps the split histogram
    current across resumed/incremental writes."""
    from geowave_spark.plans.splits import equi_depth_bounds
    from geowave_spark.sources.catalog import checkpointed_write

    path = str(tmp_path / "cat")
    a = skewed_df.where(F.col("part") < 3)
    checkpointed_write(
        a, path, "part", lon=None, lat=None,
        histogram_field=("cell", 0.0, 100_000.0),
    )
    b = skewed_df  # includes already-written partitions: only new ones append
    checkpointed_write(
        b, path, "part", lon=None, lat=None,
        histogram_field=("cell", 0.0, 100_000.0),
    )
    from geowave_spark.plans.splits import merged_histogram

    _, _, counts = merged_histogram(spark, path, "cell")
    assert counts.sum() == skewed_df.count()
    bounds = equi_depth_bounds(spark, path, "cell", 4)
    assert len(bounds) == 3 and bounds == sorted(bounds)
