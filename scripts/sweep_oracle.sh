#!/usr/bin/env bash
# Full oracle-parity sweep at a given scale factor (default sf0.1) —
# VERDICT r4 "Next round" #8: one command, output suitable for
# committing into PROGRESS.jsonl / COVERAGE.md as sweep provenance.
#
#   scripts/sweep_oracle.sh            # sf0.1
#   scripts/sweep_oracle.sh sf0.01     # any sf dir under /root/testdata
#
# Runs every catalog query on Spark AND its DuckDB oracle over the same
# parquet and compares full sorted cell matrices (stricter than the
# driver's value hash).
set -euo pipefail
SF="${1:-sf0.1}"
cd "$(dirname "$0")/.."
export SPARK_GRAFT_ORACLE_SF_DIR="/root/testdata/${SF}"
echo "== oracle parity sweep @ ${SPARK_GRAFT_ORACLE_SF_DIR} =="
python -m pytest tests/test_oracle_parity.py -q --no-header -p no:cacheprovider
