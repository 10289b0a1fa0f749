"""LLM-training-data pipeline operators (engine extension, SURVEY.md
§2.C: dedup, similarity search, text analysis, multimodal plumbing)."""
