"""Text-analysis functions as JVM-side Column expressions (no Python UDFs)."""
