"""Mesh construction, data-parallel block sharding, and multi-host wiring."""
