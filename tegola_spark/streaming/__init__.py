"""Incremental/append processing + checkpoint-resume helpers.

The reference has NO streaming semantics (SURVEY.md §2.12) — tegola is
request/response + batch seed. This package carries the engine-side
analogs the north rule asks for: resumable batch runs (checkpoint.py)
and an incremental append driver over a growing corpus table.
"""
