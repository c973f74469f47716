"""Large-scale training-data operators: dedup, similarity search, multimodal."""
