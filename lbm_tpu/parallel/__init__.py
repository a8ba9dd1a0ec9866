"""Multi-chip spatial sharding over a JAX device mesh."""
