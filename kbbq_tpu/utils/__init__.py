"""Shared utilities: synthetic data generation, timing, logging."""
