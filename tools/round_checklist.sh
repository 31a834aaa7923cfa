#!/usr/bin/env bash
# Round-end checklist (committed so every round runs the same gate):
#   1. full pytest — INCLUDING the sf0.1 parity job (default since r6;
#      it is the only local check at the driver's bench scale factor)
#   2. bench.py at the driver SF — per-query error isolation means a
#      single broken query yields 34 timings + an err field, not rc:1
#      with zero evidence (the round-5 failure mode)
# Exit nonzero if either gate fails.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== gate 1/3: pytest (incl. sf01 parity) =="
python -m pytest tests/ -q || exit 1

echo "== gate 2/3: write_shards at bench scale =="
# Shard sf0.1 lineitem (~600k rows) and assert the cap held on every
# shard and that rows were conserved — the sink's contract, demonstrated
# beyond the unit fixture.
python tools/check_shards.py || exit 1

echo "== gate 3/3: bench at ${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} =="
# BENCH_OUT: bench.py writes the JSON payload to the file itself, so a
# stray Spark/py4j warning on stdout can't corrupt the captured copy.
BENCH_OUT=/tmp/bench_local.json python bench.py || exit 1
python -c "import json; json.load(open('/tmp/bench_local.json'))" || exit 1

echo "== checklist green =="
