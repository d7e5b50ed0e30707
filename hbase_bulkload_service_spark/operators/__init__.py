"""Engine operators (SURVEY.md §2) — thin, composable DataFrame combinators."""
