"""Utilities: checkpointing, filters, metrics/telemetry."""
