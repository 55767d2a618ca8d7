"""Cross-cutting utilities: errors, transcript, serialization, timers."""
