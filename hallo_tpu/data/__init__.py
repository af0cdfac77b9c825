"""Host-side preprocessing and datasets (L5 of the reference layer map)."""
