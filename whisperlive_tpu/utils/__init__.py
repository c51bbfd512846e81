"""Cross-cutting utilities: metrics, SRT, terminal rendering."""
