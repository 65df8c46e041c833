"""Engine operators: KG construction (extract → link → canonicalize →
materialize) and large-scale training-data ops (dedup, similarity,
text stats, multimodal plumbing)."""
