"""geowave_spark — a PySpark-native spatial-join + tiling analytics engine.

From-scratch reimplementation of the query/data-processing capabilities of
locationtech/geowave (reference at /root/reference, Java) as an idiomatic
PySpark engine: vectorized numpy SFC/cell indexing inside Arrow pandas UDFs,
spatial joins as cell-key hash equi-joins, kNN via cell-ring expansion,
raster↔vector tiling over an image+caption table, plus the large-scale
training-data operators (dedup, similarity search, text analysis).
"""

__version__ = "0.1.0"
