"""Distributed operators: docid assignment, dedup, ANN, top-k."""
