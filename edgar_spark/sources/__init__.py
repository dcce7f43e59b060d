"""Bulk ingest sources (WARC-style web archives)."""
