"""Coordinated multi-table publish over the WAP staging layer.

A CDC pipeline frequently derives SEVERAL tables from one epoch (the
reference ships 18 coordinated output files per cycle —
scripts/merge_support.py writes the funded/unfunded/all × S/P/S+P
matrix together; a consumer reading a funded file from cycle N and an
unfunded file from cycle N-1 would compute nonsense).  This module
gives LakeTables that discipline: stage every table's epoch with WAP
(`stage_merge` — invisible to readers), then commit them through ONE
transaction manifest so the group is all-or-nothing DURABLE.

Guarantee (stated precisely — the same one Iceberg multi-table commits
have without a catalog transaction):

* the manifest write is the COMMIT POINT: before it, nothing is
  visible anywhere (staged snapshots are invisible and discardable);
  after it, every table's publish WILL happen — a crash mid-publish
  leaves a ``pending`` manifest that :func:`recover` rolls FORWARD
  idempotently (publishes are CAS fast-forwards; an already-published
  entry is detected by its applied epoch and skipped);
* what is NOT provided: cross-table snapshot isolation during the
  publish window — per-table commits become visible one at a time, so
  a reader racing the commit can observe table A at the new version
  and table B at the old one for the duration of the window.  Closing
  that window requires a multi-table catalog with transactional
  version pointers (Nessie / Iceberg REST catalog transactions); a
  single snapshot-pointer-per-table format cannot express it, and this
  module does not pretend to.

Single-coordinator by design, like the rest of the engine's writers: a
foreign commit landing on a member table between stage and publish
makes the staged snapshot stale, and commit()/recover() surface that
as CommitConflict rather than silently merging.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import SparkSession

from .table import CommitConflict, LakeTable


def _manifest_path(txn_dir: str, txn_id: str) -> str:
    return os.path.join(txn_dir, f"txn-{txn_id}.json")


def _write_manifest(txn_dir: str, txn_id: str, doc: dict) -> None:
    os.makedirs(txn_dir, exist_ok=True)
    tmp = _manifest_path(txn_dir, txn_id) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(doc, fh, indent=1)
    os.replace(tmp, _manifest_path(txn_dir, txn_id))


def _staged_epoch_applied(table: LakeTable, epoch: str, base_version: int) -> bool:
    cur = table.current_snapshot()
    e = cur.applied.get(str(epoch))
    return e is not None and int(e.get("snapshot", -1)) > base_version


def _publish_entry(spark: SparkSession, entry: dict) -> str:
    """Publish one manifest entry, idempotently.  Returns 'published',
    'already' or raises CommitConflict for a genuinely foreign commit."""
    table = LakeTable(spark, entry["root"])
    name, epoch, base_v = entry["name"], entry["epoch"], int(entry["base_version"])
    if _staged_epoch_applied(table, epoch, base_v):
        # crash landed between _write_snapshot and the staged-file
        # removal (or a prior recover already ran): finish the cleanup
        staged = os.path.join(table._staged_dir, f"{name}.json")
        if os.path.exists(staged):
            os.remove(staged)
        return "already"
    try:
        table.publish_staged(name)
        return "published"
    except FileNotFoundError as exc:
        raise CommitConflict(
            f"txn entry {entry}: staged snapshot missing and epoch not applied — "
            "was it discarded outside the transaction?"
        ) from exc


class MultiTableTransaction:
    """Stage epochs on several LakeTables, then publish them as one
    all-or-nothing-durable group.  See module docstring for the exact
    guarantee."""

    def __init__(self, spark: SparkSession, txn_dir: str, txn_id: str | None = None):
        self.spark = spark
        self.txn_dir = txn_dir
        self.txn_id = txn_id or uuid.uuid4().hex[:12]
        self._entries: list[dict] = []
        self._done = False

    # ---------------------------------------------------------- staging
    def stage(self, table: LakeTable, new_bucket_data, touched_buckets, epoch: str, **kw) -> str:
        """WAP-stage one table's epoch under this transaction (readers
        see nothing).  Any ``stage_merge`` kwarg passes through."""
        if self._done:
            raise RuntimeError("transaction already committed or aborted")
        # One entry per table root: two stages of the same table would
        # record the SAME base_version twice, so the second publish
        # deterministically conflicts mid-commit — after the manifest
        # (= after the commit point), where it poisons recovery
        # (ADVICE r6). Reject at stage time, while nothing is visible.
        if any(e["root"] == table.root for e in self._entries):
            raise ValueError(
                f"table {table.root} already staged in txn {self.txn_id}; "
                "merge the epochs into one stage_merge call"
            )
        name = table.stage_merge(
            new_bucket_data, touched_buckets, epoch, name=f"txn-{self.txn_id}-{epoch}", **kw
        )
        base_v = int(table._staged_doc(name)["base_version"])
        self._entries.append(
            {"root": table.root, "name": name, "epoch": str(epoch), "base_version": base_v}
        )
        return name

    # ----------------------------------------------------------- commit
    def commit(self) -> dict:
        """Write the ``pending`` manifest (THE commit point), publish
        every member table, mark the manifest ``committed``.  A crash
        anywhere after the manifest write is completed by
        :func:`recover`; a crash before it leaves only invisible staged
        snapshots (discardable orphans)."""
        if self._done:
            raise RuntimeError("transaction already committed or aborted")
        if not self._entries:
            raise ValueError("nothing staged")
        # fail fast while nothing is visible: every member must still be
        # at its staged base
        for e in self._entries:
            t = LakeTable(self.spark, e["root"])
            cur_v = t.current_snapshot().version
            if cur_v != e["base_version"]:
                raise CommitConflict(
                    f"table {e['root']} moved v{e['base_version']} -> v{cur_v} since "
                    "staging; re-stage the transaction"
                )
        _write_manifest(
            self.txn_dir, self.txn_id, {"state": "pending", "tables": self._entries}
        )
        results = [_publish_entry(self.spark, e) for e in self._entries]
        _write_manifest(
            self.txn_dir, self.txn_id, {"state": "committed", "tables": self._entries}
        )
        self._done = True
        return {"txn_id": self.txn_id, "results": results}

    def abort(self) -> None:
        """Discard every staged snapshot; nothing was ever visible."""
        if self._done:
            raise RuntimeError("transaction already committed or aborted")
        for e in self._entries:
            LakeTable(self.spark, e["root"]).discard_staged(e["name"])
        _write_manifest(
            self.txn_dir, self.txn_id, {"state": "aborted", "tables": self._entries}
        )
        self._done = True


def recover(spark: SparkSession, txn_dir: str) -> list[dict]:
    """Roll every ``pending`` transaction manifest FORWARD (the manifest
    is the commit point — its presence means the group must become
    visible), idempotently; ``committed``/``aborted`` manifests are
    left as an audit trail.  Returns one record per manifest examined.
    Run at coordinator startup, before accepting new work."""
    out: list[dict] = []
    if not os.path.isdir(txn_dir):
        return out
    for f in sorted(os.listdir(txn_dir)):
        if not (f.startswith("txn-") and f.endswith(".json")):
            continue
        path = os.path.join(txn_dir, f)
        with open(path) as fh:
            doc = json.load(fh)
        txn_id = f[len("txn-") : -len(".json")]
        if doc.get("state") != "pending":
            out.append({"txn_id": txn_id, "state": doc.get("state"), "action": "none"})
            continue
        # A poisoned manifest (e.g. a foreign commit landed in the
        # commit window) must not abort recovery of every LATER pending
        # manifest: record it as 'stuck' with the error and continue
        # (ADVICE r6). Entries are still attempted individually so a
        # partial roll-forward makes as much of the group durable as
        # the conflict allows; the stuck manifest stays 'pending' for
        # the operator.
        results: list[str] = []
        err: str | None = None
        for e in doc["tables"]:
            try:
                results.append(_publish_entry(spark, e))
            except CommitConflict as exc:
                results.append("conflict")
                err = str(exc)
        if err is None:
            _write_manifest(txn_dir, txn_id, {"state": "committed", "tables": doc["tables"]})
            out.append({"txn_id": txn_id, "state": "committed", "action": results})
        else:
            out.append(
                {"txn_id": txn_id, "state": "stuck", "action": results, "error": err}
            )
    return out
