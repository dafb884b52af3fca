"""Shared utilities: varints, block math, corpus providers, timing."""
