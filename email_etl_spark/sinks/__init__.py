"""Sinks: canonical email DataFrames → storage layouts."""
