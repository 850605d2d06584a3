"""Device-mesh sharding: distributed LM / BA over ICI collectives."""
