"""Stream enrichment against a LIVE CDC-maintained dimension.

The standard pattern a CDC pipeline feeds: facts arrive as a stream,
dimensions are LakeTables kept current by the ingest engine, and every
fact must be enriched with the dimension state AS OF its trigger (the
Kafka-Streams stream-KTable join semantic; reference analog: the
broadcast dict-map enrichment of scripts/individual_support.py:17-27,
lifted to a dimension that CHANGES underneath the stream).

Spark's native stream-static join cannot express this against a
snapshot table: the static side's file listing binds at PLAN time, so
a dimension maintained by commits appears frozen at the version the
query started with.  ``foreachBatch`` re-resolves
``table.current_snapshot()`` per micro-batch instead — each batch
joins against the dimension's CURRENT committed state, and the
snapshot version is stamped on every output row so downstream readers
can audit exactly which dimension version enriched which fact.

Exactly-once: the sink writes each micro-batch to its own
``batch=<id>`` directory with overwrite — a crash-replayed batch
rewrites the same directory with the same rows (enrichment reruns
against the dimension's CURRENT state, same as any at-least-once
side effect that re-derives from live state; the version stamp makes
a replayed-later enrichment visible rather than silent).

Scale: the dimension is broadcast when its on-disk state is under
``broadcast_max_bytes`` (a manifest-level ``os.stat`` sum — no Spark
job); above that the join falls back to a shuffle hash/sort-merge
join, which is the right plan for a fact stream against a huge
dimension.  The decision re-evaluates every trigger, so a dimension
that grows past the threshold flips plans without a restart.
NOTE the units: the threshold is COMPRESSED parquet bytes, but the
broadcast hash table is built from decompressed rows — zstd-era
expansion is commonly 3-10x — so the default is deliberately far
below Spark's executor memory headroom (32 MB on disk ≈ a few hundred
MB in memory worst-case).  Raise it only with the expansion ratio of
the actual dimension in hand.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc.table import LakeTable

VERSION_COL = "_dim_version"


def stream_enrich_with_table(
    spark: SparkSession,
    stream_dir: str,
    table: LakeTable,
    keys: Sequence[str],
    payload: Sequence[str],
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 8,
    broadcast_max_bytes: int = 32 << 20,
):
    """Tail ``stream_dir`` (parquet file source) and LEFT-join each
    micro-batch against the CURRENT state of ``table`` on ``keys``,
    keeping ``payload`` dimension columns; rows land under
    ``sink_dir/batch=<id>/`` with a ``_dim_version`` column recording
    the dimension snapshot that enriched them.  Returns the
    StreamingQuery (caller awaits termination)."""
    keys = list(keys)
    payload = list(payload)
    batch_schema = spark.read.parquet(stream_dir).schema

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        snap = table.current_snapshot()
        dim = table.read(snap).select(*keys, *payload)
        if table.state_size_bytes(snap) <= broadcast_max_bytes:
            dim = F.broadcast(dim)
        out = batch_df.join(dim, keys, "left").withColumn(VERSION_COL, F.lit(snap.version))
        out.write.mode("overwrite").parquet(os.path.join(sink_dir, f"batch={batch_id}"))

    reader = spark.readStream.schema(batch_schema).option(
        "maxFilesPerTrigger", int(max_files_per_trigger)
    )
    # the file stream source needs a directory; point at the parent with
    # a glob filter when given a single parquet file (same pattern as
    # streaming/pipeline.py::windowed_event_agg)
    if os.path.isfile(stream_dir):
        reader = reader.option("pathGlobFilter", os.path.basename(stream_dir)).parquet(
            os.path.dirname(stream_dir)
        )
    else:
        reader = reader.parquet(stream_dir)
    writer = reader.writeStream.foreachBatch(_apply).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_enriched(spark: SparkSession, sink_dir: str) -> DataFrame:
    """All enriched rows across batches (the batch=<id> layout is a
    standard hive-partitioned read; the column comes back as LONG)."""
    return spark.read.option("basePath", sink_dir).parquet(os.path.join(sink_dir, "batch=*"))
