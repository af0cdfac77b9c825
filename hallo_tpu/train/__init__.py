"""Two-stage training (spatial/identity, then motion+audio)."""
