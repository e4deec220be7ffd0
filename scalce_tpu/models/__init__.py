"""Statistical models: core dictionary, entropy tables, quality contexts."""
