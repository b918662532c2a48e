"""Streaming shell: micro-batch CDC pipeline with checkpointed exactly-once."""
