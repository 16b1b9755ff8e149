"""Query layer: structural extraction matching and topic matching."""
