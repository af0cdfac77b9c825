"""Cross-cutting utilities: model factory, video/mask helpers, checkpoints."""
