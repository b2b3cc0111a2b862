"""Single-chip kernel ops (Pallas + pure-JAX golden twins)."""
