"""Spark operators: geometry pipeline, spatial join, MVT encode, dedup,
similarity, multimodal plumbing."""
