"""Core runtime: options/config tiers, stats, matrix I/O, test fixtures."""
