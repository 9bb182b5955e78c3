"""Structured Streaming surface (optional).

The north rule and the reference are batch-only (SURVEY.md §2.8): "resumable
from checkpoint" means idempotent batch restart, which plans/pipeline.py
implements. This package additionally provides an INCREMENTAL ingest path for
completeness: new pages arrive on a stream, are signature-hashed with the same
vectorized UDFs, and exact/near duplicate hits against the accumulated state
are emitted per micro-batch via foreachBatch.
"""
