"""Checkpointing, torch-weight bridging, structured logging."""
