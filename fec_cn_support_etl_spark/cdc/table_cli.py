"""Ops CLI for LakeTable — the `DESCRIBE TABLE` / metadata-tables
surface an operator needs (Iceberg exposes these as `<table>.history`,
`.snapshots`, `.files`):

    python -m fec_cn_support_etl_spark.cdc.table_cli describe --table /lake
    python -m fec_cn_support_etl_spark.cdc.table_cli history  --table /lake
    python -m fec_cn_support_etl_spark.cdc.table_cli files    --table /lake
    python -m fec_cn_support_etl_spark.cdc.table_cli staged   --table /lake
    python -m fec_cn_support_etl_spark.cdc.table_cli publish-staged --table /lake --name wap-7
    python -m fec_cn_support_etl_spark.cdc.table_cli discard-staged --table /lake --name wap-7
    python -m fec_cn_support_etl_spark.cdc.table_cli compact  --table /lake [--max-files 1]
    python -m fec_cn_support_etl_spark.cdc.table_cli vacuum   --table /lake [--keep-last 1]

All read-only subcommands work from snapshot JSON alone — no
SparkSession, no data reads — so they're safe to run against a live
table from anywhere that can see the storage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _snapshots_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "snapshots")


def _load(table_dir: str, version: int | None = None) -> dict:
    d = _snapshots_dir(table_dir)
    versions = sorted(int(f[1:-5]) for f in os.listdir(d) if f.startswith("v") and f.endswith(".json"))
    if not versions:
        raise SystemExit(f"no snapshots under {d}")
    v = versions[-1] if version is None else version
    with open(os.path.join(d, f"v{v}.json")) as fh:
        return json.load(fh)


def cmd_describe(args) -> dict:
    s = _load(args.table)
    schema = json.loads(s["schema_json"][s["current_schema_id"]])
    files = [f for fs in s["buckets"].values() for f in fs]
    return {
        "version": s["version"],
        "key_cols": s["key_cols"],
        "order_cols": s.get("order_cols", []),
        "n_buckets": s["n_buckets"],
        "buckets_with_data": len(s["buckets"]),
        "data_files": len(files),
        "mor_dirty_buckets": sum(1 for fs in s["buckets"].values() if len(fs) > 1),
        "schema_versions": len(s["schema_json"]),
        "columns": [(f["name"], f["type"] if isinstance(f["type"], str) else f["type"].get("type", "complex")) for f in schema["fields"]],
        "applied_epochs": len(s["applied"]),
    }


def cmd_history(args) -> list[dict]:
    s = _load(args.table)
    rows = [
        {"epoch": ep, "snapshot": meta.get("snapshot"), "ts": meta.get("ts"),
         "n_keys": meta.get("n_keys"), "n_deletes": meta.get("n_deletes"),
         "mode": meta.get("mode", "cow"), "touched_buckets": meta.get("touched_buckets")}
        for ep, meta in s["applied"].items()
    ]
    return sorted(rows, key=lambda r: (r["snapshot"] or 0, r["epoch"]))


def cmd_files(args) -> list[dict]:
    s = _load(args.table)
    out = []
    for b, fs in sorted(s["buckets"].items(), key=lambda kv: int(kv[0])):
        for i, f in enumerate(fs):
            out.append(
                {"bucket": int(b), "role": "base" if i == 0 else f"delta-{i}",
                 "path": f["path"], "schema_id": f["schema_id"], "stats": f.get("stats", {})}
            )
    return out


def cmd_compact(args) -> dict:
    from ..session import get_spark
    from .table import LakeTable

    spark = get_spark(app_name="table-compact", master=args.master)
    snap = LakeTable(spark, args.table).compact(max_files=args.max_files)
    return {"compacted": snap is not None, "snapshot": None if snap is None else snap.version}


def cmd_vacuum(args) -> dict:
    from ..session import get_spark
    from .table import LakeTable

    spark = get_spark(app_name="table-vacuum", master=args.master)
    removed = LakeTable(spark, args.table).vacuum(keep_last=args.keep_last)
    return {"removed_dirs": removed}


def cmd_staged(args) -> list[dict]:
    d = os.path.join(args.table, "staged")
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d)):
        if not f.endswith(".json"):
            continue
        with open(os.path.join(d, f)) as fh:
            doc = json.load(fh)
        snap = doc["snapshot"]
        out.append(
            {"name": f[:-5], "base_version": doc["base_version"],
             "target_version": snap["version"],
             "epochs": [e for e, m in snap["applied"].items()
                        if m.get("snapshot") == snap["version"]]}
        )
    return out


def cmd_publish_staged(args) -> dict:
    # publish/discard are pure snapshot-JSON operations (the CAS is an
    # os.link) — no SparkSession needed, like the other metadata cmds
    from .table import LakeTable

    snap = LakeTable(None, args.table).publish_staged(args.name)
    return {"published": args.name, "snapshot": snap.version}


def cmd_discard_staged(args) -> dict:
    from .table import LakeTable

    LakeTable(None, args.table).discard_staged(args.name)
    return {"discarded": args.name, "note": "data dir reclaimed by next vacuum"}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="LakeTable metadata / maintenance CLI")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("describe", "history", "files", "staged"):
        sp = sub.add_parser(name)
        sp.add_argument("--table", required=True)
    for name in ("publish-staged", "discard-staged"):
        sp = sub.add_parser(name)
        sp.add_argument("--table", required=True)
        sp.add_argument("--name", required=True)
    sp = sub.add_parser("compact")
    sp.add_argument("--table", required=True)
    sp.add_argument("--max-files", type=int, default=1)
    sp.add_argument("--master", default=None)
    sp = sub.add_parser("vacuum")
    sp.add_argument("--table", required=True)
    sp.add_argument("--keep-last", type=int, default=1)
    sp.add_argument("--master", default=None)
    args = p.parse_args(argv)
    out = {"describe": cmd_describe, "history": cmd_history, "files": cmd_files,
           "staged": cmd_staged, "publish-staged": cmd_publish_staged,
           "discard-staged": cmd_discard_staged,
           "compact": cmd_compact, "vacuum": cmd_vacuum}[args.cmd](args)
    print(json.dumps(out, indent=1, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
