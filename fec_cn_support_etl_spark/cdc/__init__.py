"""CDC / incremental-ingest engine (BASELINE.json north rule).

WAL-style change events (op I/U/D on (repo, path) keys carrying commit,
lang, content) are applied to a lake table in either write mode:

    events --salted-hash-partition--> per-key LWW dedup (max-by lsn)
           --schema reconcile--> bucket-level COW MERGE        (mode=cow)
                             \\-> delta-file APPEND + read-time
                                 LWW merge + scheduled compact  (mode=mor)
           --atomic snapshot commit + idempotent epoch manifest-->

``mode="cow"`` rewrites the touched buckets (zero read amplification);
``mode="mor"`` appends the epoch's winners as delta files — commit cost
O(batch) instead of O(touched state) — and reads resolve base+deltas
per key by max(lsn, commit), with ``LakeTable.compact`` folding deltas
back into the base (Iceberg's write.update.mode, both settings).

The lake layer is ``table.LakeTable`` — an Iceberg-shaped local format
(bucketed parquet data files + JSON snapshot manifests with atomic
compare-and-swap commits (os.link; racing writers get CommitConflict))
because the Iceberg runtime jar is not available in this sandbox.
``engine.iceberg_merge_sql`` emits the equivalent MERGE INTO for a
real Iceberg catalog (see session.get_spark enable_iceberg).
"""
