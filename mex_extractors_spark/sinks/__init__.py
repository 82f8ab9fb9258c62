"""Reporting side-channel sinks (SURVEY.md §2.2 K3/K6).

The hot path writes through the lake (``lake/table.py``); these sinks
cover the reference's small *reporting* outputs — per-group XLSX
exports and consent-solicitation emails — re-expressed so the render
work is distributed and only bytes leave the executors.
"""
