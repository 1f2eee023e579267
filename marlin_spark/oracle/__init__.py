"""Pure-Python oracle: analyzer, corpus generator, inverted index + BM25.

This package is the single-process "reference engine" for rank-identity
testing (SURVEY.md §7 Phase 0): no Spark imports allowed here.
"""
