"""Structured Streaming surface: ingest (the ``event_iter`` analog) and
event-time analytics (watermarks, tumbling/sliding/session windows)."""
