"""Large-scale training-data pipeline operators over the documents /
embeddings tables: dedup, similarity search, text analysis, multimodal."""
