"""Job orchestration (SURVEY.md §2.J) — time slicing + sequential queue."""
