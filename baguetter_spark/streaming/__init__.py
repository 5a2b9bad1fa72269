"""Structured-Streaming ingestion of transcripts into index segments."""
