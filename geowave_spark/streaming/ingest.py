"""Streaming ingest: cell-encode a stream and maintain windowed metrics.

GeoWave has no streaming query engine — Kafka is only an ingest source
(core/ingest/.../kafka/IngestFromKafkaDriver.java:48-54: consume Avro →
normal ingest path).  The Spark-native equivalent: ``readStream`` (kafka in
production; rate/memory here) → the same cell-encode UDFs → partitioned
sink, plus a watermarked windowed aggregation maintaining the streaming
metrics table (count per cell per window) that the batch engine keeps in
``metrics``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..encode import with_point_cells
from ..sfc import TieredStrategy


def synthetic_point_stream(spark: SparkSession, rows_per_second: int = 500) -> DataFrame:
    """A rate-source stream of points (deterministic lon/lat from the value
    counter) standing in for a Kafka feature feed."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            F.col("value").alias("event_id"),
            (-180.0 + (F.col("value") * 48271 % 360000) / 1000.0).alias("lon"),
            (-90.0 + (F.col("value") * 69621 % 180000) / 1000.0).alias("lat"),
        )
    )


def encode_stream(stream: DataFrame, strategy: TieredStrategy | None = None) -> DataFrame:
    """Add (tier, cell) to a streaming point DataFrame — same pandas UDFs as
    the batch path (Structured Streaming runs them per micro-batch)."""
    return with_point_cells(stream, strategy=strategy or TieredStrategy())


def windowed_cell_counts(
    stream: DataFrame,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    cell_deg: float = 15.0,
) -> DataFrame:
    """Watermarked per-window per-cell counts (late data beyond the
    watermark is dropped) — the streaming metrics table."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("win"),
            F.floor((F.col("lon") + 180.0) / cell_deg).alias("cx"),
            F.floor((F.col("lat") + 90.0) / cell_deg).alias("cy"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def ingest_to_table(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    strategy: TieredStrategy | None = None,
    trigger_seconds: int = 1,
):
    """Start the streaming ingest: encode cells and append to the indexed
    table path, partitioned by tier (exactly-once via the checkpoint)."""
    encoded = encode_stream(stream, strategy)
    return (
        encoded.writeStream.format("parquet")
        .option("path", f"{path}/data")
        .option("checkpointLocation", checkpoint)
        .partitionBy("tier")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
