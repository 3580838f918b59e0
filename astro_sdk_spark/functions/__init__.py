"""DataFrame-level functions: flatten, text analysis, dedup, similarity."""
