"""mex_extractors_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of robert-koch-institut/mex-extractors'
extract → transform → load contract (reference README.md:51-55) on Spark:

- heterogeneous raw source records are normalized into one common schema
  with declarative column expressions + vectorized pandas/Arrow UDFs
  (reference transforms are row-at-a-time Python, e.g.
  mex/extractors/seq_repo/transform.py:124-194);
- a change stream keyed on ``(repo, path)`` is replayed into an
  Iceberg-style copy-on-write lake table with last-writer-wins ordering
  by commit sequence (reference first-wins dedup inverted:
  mex/extractors/seq_repo/transform.py:129-136);
- commits are exactly-once, fenced by a per-partition high-watermark
  ledger (reference run_key idempotency:
  mex/extractors/pipeline/base.py:101-104) and carry a sha256 integrity
  manifest (reference S3 sink: mex/extractors/sinks/s3.py:106-133).

Everything here is public-API PySpark (DataFrame / SQL / Arrow); no code
is copied from the reference.
"""

__version__ = "0.1.0"
