"""spark-submit entry point: distance spatial join + tile assignment.

Run on any cluster (the north rule's deployment shape):

    python -m geowave_spark... no — package ships as a zip:

    python /root/repo/examples/make_zip.py   # writes /tmp/geowave_spark_pyfiles.zip
    spark-submit --master <cluster> \
        --py-files /tmp/geowave_spark_pyfiles.zip \
        examples/submit_spatial_join.py <sf_dir> [radius]

The script only assumes `geowave_spark` is importable (via --py-files);
it builds no SparkSession config of its own beyond the app name, so
cluster-wide defaults (executors, shuffle service, dynamic allocation)
apply untouched.
"""

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# works under spark-submit --py-files AND a bare `python examples/...` run
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    radius = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    spark = SparkSession.builder.appName("geowave-spark-submit-demo").getOrCreate()

    from geowave_spark.operators.join import distance_join

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        F.expr("-180.0 + ((c_custkey * 48271) % 360000) / 1000.0").alias("lon"),
        F.expr("-90.0 + ((c_custkey * 69621) % 180000) / 1000.0").alias("lat"),
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey"),
        F.expr("-180.0 + ((s_suppkey * 16807) % 360000) / 1000.0").alias("lon"),
        F.expr("-90.0 + ((s_suppkey * 65539) % 180000) / 1000.0").alias("lat"),
    )
    pairs = distance_join(cust, supp, radius, "c_custkey", "s_suppkey")
    n = pairs.count()
    print(f"RESULT pairs={n}")
    spark.stop()


if __name__ == "__main__":
    main()
