"""Sequential single-threaded oracle producing byte-identity goldens."""
