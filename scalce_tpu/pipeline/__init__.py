"""jit-compiled block pipelines: the compress/decompress drivers
(SURVEY.md §2 L3, re-architected as pure block functions)."""
