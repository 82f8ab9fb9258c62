"""Query plans over the driver testdata — the SURVEY.md §2 coverage map."""
