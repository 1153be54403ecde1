"""Structured Streaming surface: sources, windowed aggregations,
watermarks, streaming dedup. The reference has no streaming at all — its
nearest analog is a 30 s polling scheduler (scheduler/scheduler.py:49-57);
this module is the [EXT] replacement (SURVEY.md §2.C Streaming)."""
