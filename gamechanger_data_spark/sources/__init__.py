"""Sources: ready-marker-gated change-feed batches (batch + streaming)."""
