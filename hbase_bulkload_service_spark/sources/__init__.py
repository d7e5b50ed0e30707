"""Sources & sinks (SURVEY.md §2.A / §2.H)."""
