#!/usr/bin/env bash
# Top-level round gate: fails loudly on ANY red anywhere in the surface.
#
#   bash tools/ci_gate.sh [sf_dir]
#
# 1. tools/oracle_check.py over the WHOLE query registry (all entries, not
#    just the driver-visible head) — Spark vs DuckDB differential with
#    rowcount + schema + dtype + value equality; writes the full artifact
#    to CORRECTNESS_FULL.json so driver-side truncation can never hide the
#    tail again (CORRECTNESS_r02.json covered only the first 50 entries).
# 2. pytest tests/ — includes the physical-plan sweep (tests/test_plans.py)
#    that rejects CartesianProduct / non-allow-listed BroadcastNestedLoopJoin
#    across every registered query.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
python tools/oracle_check.py "$SF_DIR" --json CORRECTNESS_FULL.json
python -m pytest tests/ -q
echo "ci_gate: all green"
