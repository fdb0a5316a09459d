"""Training-data pipeline operators beyond the reference's surface:
deduplication, similarity search, text analysis, multimodal plumbing,
and skew-handling utilities (see repo brief: first-class components
alongside SURVEY.md §2)."""
