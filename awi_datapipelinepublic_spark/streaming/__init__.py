"""Structured Streaming layer: file-arrival triggers via readStream + foreachBatch."""
