"""Persisted incremental statistics store (sources/statistics.py) —
mirrors the reference's field-statistic tests: incremental updates merge
to the same answer as a from-scratch computation, OptimalCount answers
from stats alone, Bloom membership has no false negatives and a bounded
false-positive rate, HLL NDV estimates land near truth."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geowave_spark.sources.statistics import (
    bloom_contains,
    bloom_might_contain,
    merged_bloom,
    merged_statistics,
    optimal_count,
    read_statistics,
    update_statistics,
)


@pytest.fixture(scope="module")
def batches():
    rng = np.random.default_rng(13)
    out = []
    for b in range(3):
        n = 800
        out.append(
            pd.DataFrame(
                {
                    "part": (rng.integers(0, 4, n) + 4 * b).astype(np.int64),
                    "val": rng.normal(50.0, 12.0, n).round(4),
                    "word": [f"w{v}" for v in rng.integers(0, 500, n)],
                }
            )
        )
    return out


@pytest.fixture(scope="module")
def store(spark, batches, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("statstore"))
    for pdf in batches:  # three incremental ingests
        update_statistics(spark.createDataFrame(pdf), path, "part", ["val", "word"])
    return path


def test_incremental_merge_matches_direct(spark, batches, store):
    allpdf = pd.concat(batches, ignore_index=True)
    got = merged_statistics(spark, store, "val")
    assert got["count"] == len(allpdf)
    assert got["nulls"] == 0
    assert got["min"] == pytest.approx(allpdf.val.min())
    assert got["max"] == pytest.approx(allpdf.val.max())
    assert got["sum"] == pytest.approx(allpdf.val.sum(), rel=1e-12)
    assert got["mean"] == pytest.approx(allpdf.val.mean(), rel=1e-9)
    assert got["variance"] == pytest.approx(allpdf.val.var(ddof=0), rel=1e-6)


def test_optimal_count_no_scan(spark, batches, store):
    assert optimal_count(spark, store, "val") == sum(len(b) for b in batches)


def test_hll_ndv_estimate(spark, batches, store):
    allpdf = pd.concat(batches, ignore_index=True)
    true_ndv = allpdf.word.nunique()
    est = merged_statistics(spark, store, "word")["ndv_estimate"]
    assert abs(est - true_ndv) / true_ndv < 0.1


def test_bloom_no_false_negatives(spark, batches, store):
    allpdf = pd.concat(batches, ignore_index=True)
    bits = merged_bloom(spark, store, "word")
    assert bloom_contains(bits, allpdf.word.unique()).all()
    assert bloom_might_contain(spark, store, "word", allpdf.word.iloc[0])


def test_bloom_false_positive_rate_bounded(spark, store):
    bits = merged_bloom(spark, store, "word")
    absent = [f"zz_absent_{i}" for i in range(2000)]
    fp = bloom_contains(bits, absent).sum()
    assert fp / len(absent) < 0.05


def test_checkpointed_write_maintains_stats_incrementally(spark, tmp_path):
    from geowave_spark.sources.catalog import checkpointed_write

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "tier": np.repeat([1, 2, 3], 100),
            "lon": rng.uniform(-10, 10, 300),
            "lat": rng.uniform(-10, 10, 300),
            "v": rng.uniform(0, 1, 300).round(6),
        }
    )
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(pdf)
    r1 = checkpointed_write(df, path, "tier", stats_fields=["v"])
    assert set(r1["written"]) == {"1", "2", "3"}
    # resume: nothing new to write → no duplicate stats rows
    r2 = checkpointed_write(df, path, "tier", stats_fields=["v"])
    assert r2["written"] == []
    stats = read_statistics(spark, path)
    assert stats.count() == 3  # one partial per partition, not six
    assert optimal_count(spark, path, "v") == 300


def test_index_statistics_from_metrics(spark, tmp_path):
    """PartitionsStatistic / RowRangeHistogramStatistic analogs answered
    from the metrics side table alone."""
    from geowave_spark.sources.catalog import checkpointed_write
    from geowave_spark.sources.statistics import index_statistics

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "tier": np.repeat([4, 5], [120, 80]),
            "lon": rng.uniform(-30, 40, 200),
            "lat": rng.uniform(-10, 20, 200),
        }
    )
    path = str(tmp_path / "tbl")
    checkpointed_write(spark.createDataFrame(pdf), path, "tier")
    got = index_statistics(spark, path)
    assert got["partitions"] == ["4", "5"]
    assert got["row_histogram"] == {"4": 120, "5": 80}
    assert got["total_rows"] == 200 and got["max_partition_rows"] == 120
    minx, miny, maxx, maxy = got["envelope"]
    assert minx == pytest.approx(pdf.lon.min()) and maxy == pytest.approx(pdf.lat.max())


def test_binned_statistics_per_cell(spark, tmp_path):
    """Binned persisted statistics (SpatialSimpleFeatureBinningStrategy
    analog): per-geohash-cell count / min / max answered from the store
    equal a direct scan, across TWO incremental appends (round-3 verdict
    #10)."""
    from geowave_spark.encode import geohash_udf
    from geowave_spark.sources.statistics import (
        binned_optimal_count,
        binned_statistics,
        update_binned_statistics,
    )

    rng = np.random.default_rng(11)
    parts = []
    for batch in range(2):
        pdf = pd.DataFrame(
            {
                "lon": rng.uniform(-30, 40, 400),
                "lat": rng.uniform(-10, 20, 400),
                "v": rng.normal(0, 5, 400),
            }
        )
        parts.append(pdf)
    path = str(tmp_path / "btbl")
    for pdf in parts:
        df = spark.createDataFrame(pdf)
        update_binned_statistics(
            df, path, geohash_udf(2)(F.col("lon"), F.col("lat")), ["v"]
        )
    allp = pd.concat(parts, ignore_index=True)
    full = spark.createDataFrame(allp).withColumn(
        "bin", geohash_udf(2)(F.col("lon"), F.col("lat"))
    )
    want = {
        r["bin"]: (r["n"], r["mn"], r["mx"])
        for r in full.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    got = {
        r["bin"]: (r["count"], r["min"], r["max"])
        for r in binned_statistics(spark, path, "v").collect()
    }
    assert set(got) == set(want)
    for b in want:
        assert got[b][0] == want[b][0]
        assert got[b][1] == pytest.approx(want[b][1], rel=0, abs=0)
        assert got[b][2] == pytest.approx(want[b][2], rel=0, abs=0)
    counts = {
        r["bin"]: r["count"] for r in binned_optimal_count(spark, path, "v").collect()
    }
    assert counts == {b: w[0] for b, w in want.items()}
    assert len(want) > 10  # fixture spans many cells
