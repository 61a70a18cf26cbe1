"""Multi-chip sharding: mesh construction, key-range all-to-all, collectives."""
