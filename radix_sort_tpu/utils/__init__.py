"""Harness utilities: timing/statistics, CSV schema, CLI options."""
