"""Source operators — work-list builders and file-format readers
(SURVEY §2.1)."""
