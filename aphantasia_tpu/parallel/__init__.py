"""Device-mesh sharding + the jitted training step."""
