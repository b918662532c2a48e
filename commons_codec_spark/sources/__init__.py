"""Sources: synthetic CDC event-log generation and stream helpers."""
