"""Raster↔vector tiling: image codecs, tile assignment, merge, mosaic."""
