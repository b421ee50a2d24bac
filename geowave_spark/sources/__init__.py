"""Sources: deterministic synthetic fixtures (images, regions, points) and catalog IO."""
