"""CDC / incremental-ingest engine (BASELINE.json north rule).

WAL-style change events (op I/U/D on (repo, path) keys carrying commit,
lang, content) are applied to a copy-on-write lake table:

    events --salted-hash-partition--> per-key LWW dedup (max-by lsn)
           --schema reconcile--> bucket-level COW MERGE
           --atomic snapshot commit + idempotent epoch manifest-->

The lake layer is ``table.LakeTable`` — an Iceberg-shaped local format
(bucketed parquet data files + JSON snapshot manifests with atomic
compare-and-swap commits (os.link; racing writers get CommitConflict)) because the Iceberg runtime jar is not available in
this sandbox. ``engine.iceberg_merge_sql`` emits the equivalent
MERGE INTO for a real Iceberg catalog (see session.get_spark
enable_iceberg).
"""
