"""spark-submit entry point: the streaming ingest path, bounded.

The streaming dataflow end-to-end (streaming/ingest.py — the Kafka
ingest analog, IngestFromKafkaDriver.java:48-54, with the rate source
standing in for the broker):

1. rate-source point stream (swap `synthetic_point_stream` for
   `kafka_point_stream(spark, brokers, topic)` on a cluster with the
   kafka package);
2. watermarked dedup → SFC cell encode → exactly-once parquet sink
   partitioned by tier (checkpointed);
3. stream-static point-in-geometry join against a broadcast geometry
   grid, rolled up into watermarked per-window per-region counts to a
   memory sink.

Runs BOUNDED: waits for a few committed micro-batches, stops, and
prints what landed — so the same script works as a smoke test and as
the deployment template.

    python /root/repo/examples/make_zip.py
    spark-submit --master <cluster> \
        --py-files /tmp/geowave_spark_pyfiles.zip \
        examples/submit_stream_ingest.py <out_dir>
"""

import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession

# works under spark-submit --py-files AND a bare `python examples/...` run
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _await_rows(q, deadline_s: float = 90.0):
    """Block until one micro-batch with rows has committed (recentProgress
    only reports completed batches), so a stop() can't strand the sink
    without data."""
    deadline = time.time() + deadline_s
    while time.time() < deadline and not any(
        p["numInputRows"] > 0 for p in q.recentProgress
    ):
        time.sleep(1)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="gw_stream_")
    spark = SparkSession.builder.appName("geowave-spark-stream-ingest").getOrCreate()

    from geowave_spark.sources.fixtures import regions_pdf
    from geowave_spark.streaming.ingest import (
        dedup_stream,
        ingest_to_table,
        stream_pip_join,
        synthetic_point_stream,
        windowed_region_counts,
    )

    # 1-2) dedup'd, cell-encoded, checkpointed parquet sink
    stream = dedup_stream(synthetic_point_stream(spark, rows_per_second=2000))
    q_sink = ingest_to_table(stream, f"{out}/indexed", f"{out}/ckpt")
    _await_rows(q_sink)
    q_sink.stop()
    q_sink.awaitTermination(30)
    landed = spark.read.parquet(f"{out}/indexed/data")
    print(f"SINK rows={landed.count()} tiers={sorted(r['tier'] for r in landed.select('tier').distinct().collect())}")

    # 3) stream-static PIP join + watermarked per-region rollup
    regions = spark.createDataFrame(regions_pdf(300))
    counts = windowed_region_counts(
        synthetic_point_stream(spark, rows_per_second=2000), regions
    )
    q_roll = (
        counts.writeStream.format("memory")
        .queryName("region_counts")
        .outputMode("update")
        .start()
    )
    _await_rows(q_roll)
    q_roll.stop()
    q_roll.awaitTermination(30)
    rolled = spark.sql(
        "SELECT count(*) AS rows, count(DISTINCT region_id) AS regions FROM region_counts"
    ).collect()[0]
    print(f"ROLLUP rows={rolled['rows']} regions={rolled['regions']}")
    assert landed.count() > 0 and rolled["rows"] > 0
    print("RESULT ok")
    spark.stop()


if __name__ == "__main__":
    main()
