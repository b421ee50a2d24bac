"""Build the --py-files zip for spark-submit (see submit_spatial_join.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from geowave_spark.deploy import build_zip

print(build_zip())
