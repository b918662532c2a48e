"""Distributed operators: CDC fold/merge, LWW, dedup, similarity, text."""
