"""Training-data pipeline operators over documents/embeddings tables:
deduplication, similarity search, text analysis, multimodal plumbing."""
