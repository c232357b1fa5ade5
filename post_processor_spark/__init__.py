"""post_processor_spark — PySpark-native URL-frontier + citation analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
UTMediaCAT/post-processor (reference at /root/reference, studied for
semantics only) as an idiomatic Spark engine:

- canonical input: documents(doc_id: string,
  spans: array<struct<kind,text,media_ref,offset>>) (interleaved text+media)
- span kernel: vectorized Arrow/pandas extraction of outlinks, mentions,
  aliases (reference: processor/post_processor/processor_domain.py:18-91)
- citation analytics: broadcast scope joins + explode/groupBy referral
  graph (reference: processor/post_processor/processor.py:16-51)
- frontier: bloom+exact seen set, per-host politeness scheduling,
  salted skew handling, snapshot/resume (north_rule)
"""

__version__ = "0.1.0"
