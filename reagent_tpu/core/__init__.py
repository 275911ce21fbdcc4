"""Core runtime: typed pytree batches, config/registry machinery, parameters."""
