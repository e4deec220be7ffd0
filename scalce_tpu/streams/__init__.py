"""Per-stream codecs: sequences, qualities, names (SURVEY.md §2 rows
"Sequence stream writer", "Quality codec", "Name codec")."""
