"""commons-codec-spark: a PySpark-native CDC / incremental-ingest engine.

A from-scratch reimplementation of the *capabilities* of crate/commons-codec
(reference at /root/reference) as a distributed, exactly-once Structured
Streaming pipeline:

    change-event log  ->  vectorized decode (DynamoDB / DMS / MongoDB lattices)
                      ->  last-writer-wins collapse per key (skew-salted)
                      ->  idempotent keyed MERGE into a bucketed lake table
                      ->  per-partition lineage + throughput metrics

The reference is a single-process, record-at-a-time translator library
(dict in -> SQL string out).  This engine keeps its decode/translate
*semantics* (see ``functions/``) but re-expresses execution Spark-first:
declarative DataFrame plans, Arrow-vectorized UDFs only where built-in
functions cannot express the lattice, and an Iceberg-style copy-on-write
keyed table for the sink (``lake/``).
"""

__version__ = "0.1.0"
