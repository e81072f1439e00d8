"""oplogtoredis_spark — a brand-new PySpark-native CDC / incremental-ingest engine.

Re-creates WHAT tulip/oplogtoredis computes (ordered, deduplicated, resumable,
exactly-once-effect delivery of per-document change events — see SURVEY.md) as an
idiomatic Spark Structured Streaming lake upserter:

    change-event log (parquet/stream)
      → envelope projection + filters           (reference lib/oplog/tail.go:606-677)
      → transaction flatten (posexplode)        (reference lib/oplog/tail.go:680-766)
      → derive: changed fields, routing channels,
        parallelism hash, content sha256        (reference lib/oplog/processor.go:23-117)
      → per-key last-writer-wins on (ts, tx_idx) total order
                                                (reference lib/redispub/publisher.go:41-62)
      → foreachBatch MERGE INTO a snapshot-committed lake table,
        idempotent per batch id, resumable from checkpoint
                                                (reference lib/redispub/publisher.go:324-357)

Everything is DataFrame-first: native pyspark.sql.functions in the hot path,
Arrow-vectorized pandas UDFs only where semantics are genuinely recursive
(v2-deep changed-fields), never row-at-a-time Python.
"""

__version__ = "0.1.0"
