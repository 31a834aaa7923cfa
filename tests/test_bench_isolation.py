"""bench.py per-query error isolation (round-5 lesson).

Round 5's bench died at ``sessionize``'s analysis error and recorded ZERO
timings for the 34 healthy queries (``rc: 1`` was the only evidence).  The
fix: each headline query runs under its own try/except, failures land in an
``errors`` field, the loop continues, and the process exits nonzero at the
end so the driver still sees the failure.

This test plants a deliberately-broken query next to two healthy ones in a
subprocess (so the shared test SparkSession is untouched) and asserts the
emitted JSON has timings for the healthy pair + an err entry + rc != 0.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import json, sys
sys.path.insert(0, {repo!r})
import bench

def _boom(spark, sf_dir):
    raise RuntimeError("planted failure")

good = dict(list(bench.ALL_QUERIES.items()))
good["planted_broken"] = (_boom, None)
bench.ALL_QUERIES = good
bench.HEADLINE = ["count_star", "planted_broken", "items_by_type"]
bench.main()
"""


def test_bench_survives_broken_query(tmp_path):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    env.setdefault("SPARK_SHUFFLE_PARTITIONS", "4")
    proc = subprocess.run(
        [sys.executable, "-c", DRIVER.format(repo=REPO)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
        env=env,
    )
    # nonzero exit: the failure is still visible to the driver
    assert proc.returncode != 0
    json_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    # r16 contract: the LAST line is the scalars-only tail-survivable
    # record (no per-query map, <300 bytes), preceded by the full
    # headline(s) carrying the queries/errors maps.
    tail = json.loads(json_lines[-1])
    assert "queries" not in tail
    assert len(json_lines[-1]) < 300
    assert tail["n_queries"] == 2
    assert tail["n_errors"] == 1
    # r17 verdict item 5: the lines immediately before the scalars tail
    # are one self-contained {"q": name, "s": sec} record per timed
    # query (<250 bytes each, ascending by seconds) so the driver's
    # tail window always contains parseable per-query timings.
    per_q = [json.loads(l) for l in json_lines[-3:-1]]
    assert {r["q"] for r in per_q} == {"count_star", "items_by_type"}
    assert all(r["s"] > 0 for r in per_q)
    assert all(len(l) < 250 for l in json_lines[-3:-1])
    assert per_q[0]["s"] <= per_q[1]["s"]
    out = json.loads(json_lines[-4])
    # healthy queries still timed
    assert set(out["queries"]) == {"count_star", "items_by_type"}
    assert all(v > 0 for v in out["queries"].values())
    # the broken one recorded as an err, not a crash
    assert "planted_broken" in out["errors"]
    assert "planted failure" in out["errors"]["planted_broken"]


def test_scalars_headline_format():
    # r16 verdict item 4: BENCH_r16 was the first driver record to parse
    # in 16 rounds — pin the emission path so the `parsed: null` streak
    # cannot silently return.  The last stdout line must be standalone
    # JSON, <300 bytes, scalars only, with every key the round checklist
    # reads.
    import bench

    line = bench.scalars_headline(
        total=12345.678,
        sf=0.1,
        n_queries=999,
        runs_per_query=3,
        n_errors=0,
        n_rerun_errors=0,
        loadavg_end=[1.234567, 2.345678, 3.456789],
    )
    assert len(line) < 300
    rec = json.loads(line)
    assert rec["metric"] == "headline_queries_total_wall"
    assert rec["value"] == 12345.678
    assert rec["unit"] == "sec"
    assert rec["sf"] == 0.1
    assert rec["n_queries"] == 999
    assert rec["runs_per_query"] == 3
    assert rec["agg"] == "min"
    assert rec["n_errors"] == 0
    assert rec["n_rerun_errors"] == 0
    # no bulky maps may creep back into the tail line
    assert "queries" not in rec and "samples" not in rec
    # loadavg rounded to 2 dp so the line length stays bounded
    assert rec["loadavg_end"] == [1.23, 2.35, 3.46]
