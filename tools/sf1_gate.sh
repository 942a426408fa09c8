#!/usr/bin/env bash
# sf1 decade gate (VERDICT r7 "next" #7): one command that regenerates
# the sf1 testdata and re-verifies the full registry against DuckDB at
# 10x the driver's bench scale.
#
#   tools/sf1_gate.sh                  # regen + verify, ~15 min
#   tools/sf1_gate.sh --verify-only    # skip regen if testdata-sf1 is current
#
# testdata-sf1 is GenScale output derived from /root/testdata/sf0.1 and
# is gitignored — it MUST be regenerated after any driver testdata
# regeneration (the driver rewrites /root/testdata between rounds).
# The gate excludes five queries from the DuckDB compare —
# q43_dedup_ngram_jaccard, q45_dedup_resolve, q112_incremental_dedup,
# q114_stream_neardup, q137_prefix_jaccard — whose ORACLES are O(n^2) brute force
# (hour-scale at sf1; all exact at sf0.01/0.1, and the Spark side
# still runs them here via Verify). Everything else must be
# hash-exact. Artifacts: /tmp/graft_verify_sf1 + the check.py output.
set -euo pipefail
cd "$(dirname "$0")/.."

SF01=/root/testdata/sf0.1
SF1=$PWD/testdata-sf1
VDIR=/tmp/graft_verify_sf1
MEM=${SPARK_DRIVER_MEM:-16g}

if [[ "${1:-}" != "--verify-only" ]]; then
  echo "== GenScale: $SF01 -> $SF1 (deterministic 10x) =="
  SPARK_DRIVER_MEM=$MEM sbt -batch "runMain graft.tools.GenScale $SF01 $SF1"
elif [[ ! -d "$SF1" ]]; then
  echo "testdata-sf1 missing — run without --verify-only to regenerate" >&2
  exit 1
fi

echo "== Verify: full registry at sf1 =="
SPARK_DRIVER_MEM=$MEM SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Verify $SF1 $VDIR"

echo "== DuckDB oracle compare (q43/q45 excluded: O(n^2) oracles) =="
QUERIES=$(python3 - "$VDIR" <<'EOF'
import json, sys
qs = json.load(open(sys.argv[1] + "/oracle_sql.json"))
skip = {"q43_dedup_ngram_jaccard", "q45_dedup_resolve",
        "q112_incremental_dedup", "q114_stream_neardup",
        "q137_prefix_jaccard"}  # O(n^2) oracles
print(" ".join(sorted(q for q in qs if q not in skip)))
EOF
)
# shellcheck disable=SC2086
python3 tools/check.py "$SF1" "$VDIR" $QUERIES
echo "== sf1 gate PASSED =="
