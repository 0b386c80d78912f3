"""Deterministic synthetic data generation (no external data)."""
