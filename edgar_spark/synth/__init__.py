"""Deterministic synthetic EDGAR page corpus (no network in this sandbox)."""
