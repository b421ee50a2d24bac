"""Engine operators: joins, kNN, KDE, binned aggregation, dedup, similarity, text."""
