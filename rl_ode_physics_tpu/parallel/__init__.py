"""Multi-chip scaling: world-batch vmap + Mesh/shard_map sharding."""
