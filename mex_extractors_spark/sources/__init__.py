"""Source scans + normalization to the common schema (SURVEY.md §2.1)."""
