"""Inference pipelines (video and static)."""
