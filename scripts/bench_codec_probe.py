"""Codec A/B at the BENCH probe protocol: local[32], 400k events x 4
epochs, 64 buckets — snappy vs zstd for COW and MOR commit modes.

Round-5 context: zstd (the table default since r5) is strictly better at
the 16M-event 1->4-core scaling protocol (state rewrite IO through one
disk is the non-scaling term; zstd buys ~2x less write IO with spare
CPU), but the r5 driver+builder runs both showed the 32-core 400k-event
COW probe dropping ~17% (50.5k -> ~42k ev/s) — at that scale state is
tiny, the disk is never the bottleneck, and the compression CPU sits on
the commit critical path.  This script pins both codecs at the probe
protocol with interleaved best-of trials on a quiet host, and prints
the per-table state size as calibration evidence.  Outcome (BENCH.md
round-6): zstd won at the probe too, so the size-aware default that
was prototyped from these numbers was REJECTED and zstd stayed the
unconditional default — this script measures the two real codecs only.

Usage: python scripts/bench_codec_probe.py [trials]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scaling import wait_for_quiet_host  # noqa: E402
from fec_cn_support_etl_spark.session import get_spark  # noqa: E402

EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_CDC_EVENTS", "400000"))
EPOCHS = int(os.environ.get("SPARK_GRAFT_BENCH_CDC_EPOCHS", "4"))


def run_once(spark, wal: str, work: str, mode: str, codec: str) -> dict:
    from fec_cn_support_etl_spark.cdc import runner
    from fec_cn_support_etl_spark.cdc.table import LakeTable

    table_dir = os.path.join(work, f"lake-{mode}-{codec}-{time.time_ns()}")
    props = {"write_compression": codec}
    summary = runner.replay(
        spark, wal, table_dir, n_buckets=64, mode=mode,
        table_props=props, log=lambda *_: None,
    )
    t = LakeTable(spark, table_dir)
    size = t.state_size_bytes()
    shutil.rmtree(table_dir, ignore_errors=True)
    return {"events_per_sec": summary["events_per_sec"], "state_bytes": size}


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="codec-probe", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    from fec_cn_support_etl_spark.cdc import events as ev
    from fec_cn_support_etl_spark.cdc import runner

    work = tempfile.mkdtemp(prefix="codec-probe-")
    try:
        # warm codegen exactly like bench.py's probe does
        warm_wal = os.path.join(work, "warm_wal")
        ev.write_wal(
            ev.gen_change_events(spark, 50_000, n_repos=50, n_paths=100, epochs=1, seed=1),
            warm_wal,
        )
        runner.replay(spark, warm_wal, os.path.join(work, "warm_lake"), n_buckets=64, log=lambda *_: None)

        wal = os.path.join(work, "wal")
        ev.write_wal(
            ev.gen_change_events(
                spark, EVENTS, n_repos=200, n_paths=500, epochs=EPOCHS,
                evolve_from_epoch=None, seed=42,
            ),
            wal,
        )
        best: dict[tuple, dict] = {}
        for trial in range(trials):
            # interleave codecs inside each trial so one contention
            # episode can't bias a whole codec arm
            for mode in ("cow", "mor"):
                for codec in ("snappy", "zstd"):
                    wait_for_quiet_host(max_wait_sec=120)
                    r = run_once(spark, wal, work, mode, codec)
                    k = (mode, codec)
                    if k not in best or r["events_per_sec"] > best[k]["events_per_sec"]:
                        best[k] = r
                    print(
                        f"trial {trial} {mode}/{codec}: "
                        f"{r['events_per_sec']:.0f} ev/s, state {r['state_bytes']/1e6:.1f} MB",
                        file=sys.stderr,
                    )
        out = {
            "protocol": {"events": EVENTS, "epochs": EPOCHS, "n_buckets": 64, "cpus": int(cpus)},
            "best_of": {f"{m}_{c}": v for (m, c), v in best.items()},
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
