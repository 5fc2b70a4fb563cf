"""Structured Streaming skins over the batch-iterative engine."""
