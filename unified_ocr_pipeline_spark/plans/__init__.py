"""Spark assembly: session, extraction stage, pipeline, skew handling."""
