"""Sources: the deterministic seeded pages-fixture generator and readers."""
