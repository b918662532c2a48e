"""Decode / scalar-function operators (SURVEY.md §2.3).

Each module implements one decode lattice of the reference, twice:

* pure Python functions over plain dicts — the *specification*, unit-tested
  bit-for-bit against the reference's golden fixtures;
* a vectorized Spark form — either compiled to built-in column expressions
  (JVM-side, whole-stage codegen) when the target schema is known, or an
  Arrow-batched pandas UDF for arbitrary / recursive payloads.
"""
