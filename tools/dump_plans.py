"""Regenerate PLANS.md: the formatted physical plan of each headline query
with the scale-relevant properties called out.  Run from the repo root:

    python tools/dump_plans.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline2_0_spark.plans.registry import ALL_QUERIES  # noqa: E402
from etl_pipeline2_0_spark.session import get_spark  # noqa: E402

# Every bench key gets a dossier (r13 verdict item 3: the hand-kept list
# drifted behind the bench suite every round — derive it instead).  The
# order is the bench HEADLINE order; EXTRA_BENCH composed pipelines are
# dossiered through their bench callables.  Streaming rows cannot print a
# batch physical plan (the query only exists once started) — they carry a
# prose dossier in NOTES instead.
import bench  # noqa: E402  (repo root on sys.path above)

STREAMING_SKIP = {
    "stream_sessionize_sf01",
    "stream_join_sf01",
    "stream_enrich_sf01",
}
QUERIES = [k for k in bench.HEADLINE if k not in STREAMING_SKIP]

# Prose notes regenerated into PLANS.md verbatim (design facts a plan dump
# alone can't show).
NOTES = """\
## Notes: skew controls on the banded dedup joins (r11)

- **Auto-salting** (`lsh_candidate_pairs(salt="auto")`): the salt factor
  derives from measured bucket concentration — top surviving bucket size
  (upper-bounded from the CMS sketch when `bucket_freq_source="cms"`,
  min-over-hash-rows of the row's max cell, ≤ d·w rows read; else one
  exact (band,bucket) aggregate) divided by `auto_salt_target_rows`,
  clamped to [1,16].  Salted ≡ unsalted output is pinned
  (tests/test_scale_ops.py); over-estimation only over-salts the layout.
- **CMS doc-freq caps** (`jaccard_pairs(freq_source="cms")`,
  `lsh_candidate_pairs(bucket_freq_source="cms")`): the exact per-key
  frequency aggregate (a full shuffle of the shingle/banded table) is
  replaced by a broadcast count-min sketch probed MAP-SIDE
  (`sketches.cms_estimate_map_side`) — the probed table never moves, and
  the plan has no Window (pinned: test_cms_bucket_cap_plan_has_no_window_
  shuffle).  One-sided error ⇒ the cap can only over-prune (superset of
  the exact cap's dropped keys), never under-prune.

## Dossier: stream_sessionize_sf01 (streaming — no batch plan to dump)

- One availableNow drain of the events table through
  `applyInPandasWithState` (per-user GroupState, update mode) into a
  memory sink.  The stateful operator's shape: ONE exchange hash-keyed
  by user_id feeding FlatMapGroupsInPandasWithState — no window, no
  join, state rows are (n_sessions, last_ts, n_events) triples.
  Batch ≡ stream row-exactness and the in-order contract are pinned in
  tests/test_streaming_windows.py; the bench row times the drain.

## Dossier: stream_join_sf01 (streaming — no batch plan to dump)

- Purchase→click attribution as a watermarked stream-stream INNER
  interval join (both sides of the same file stream, watermark 1 h,
  click within 30 min after the purchase, equi-key user_id), drained in
  one availableNow run into a memory sink.  Physical shape:
  StreamingSymmetricHashJoin — BOTH sides exchange hash-partitioned on
  user_id and buffer rows in the state store only until
  watermark+interval expiry (the bounded-state requirement for an
  unbounded stream⋈stream join); the event-time range condition prunes
  state per micro-batch.  Batch ≡ stream row-exactness, cross-micro-
  batch matching, and late-row eviction under a shared checkpoint are
  pinned in tests/test_streaming_windows.py; the bench row times the
  drain.

## Dossier: stream_enrich_sf01 (streaming — no batch plan to dump)

- Stream-static broadcast enrichment: the events file stream joined per
  micro-batch to the broadcast customer dimension (c_custkey =
  user_id; nation key + market segment), drained in one availableNow
  run into a memory sink.  Physical shape: BroadcastHashJoin with the
  dimension on the build side in EVERY micro-batch plan — the static
  side holds no streaming state and needs no watermark, and the fact
  stream never shuffles for the join (the 100 TB enrichment shape:
  bounded dimension ships once per plan; facts stay put).  Left join
  preserves unmatched facts.  Batch ≡ stream row-exactness and the
  per-micro-batch broadcast pin live in
  tests/test_streaming_windows.py; the bench row times the drain.
"""

CHECKS = [
    ("PushedFilters: \\[(?!\\])", "filter pushed to parquet scan"),
    ("BroadcastHashJoin", "broadcast hash join (no dim shuffle)"),
    ("WholeStageCodegen|\\*\\(\\d+\\)", "whole-stage codegen"),
    ("HashAggregate", "hash aggregate (map-side partial combine)"),
    ("CartesianProduct", "!! CARTESIAN PRODUCT (scale bug)"),
    # Every BroadcastNestedLoopJoin in this repo is a deliberate bounded
    # cross (a broadcast 1-row aggregate or <=n_centroids-row frame — the
    # W1 crossJoin-agg discipline); test_plan_shape pins the bounded sides
    # and separately bans corpus-sized nested loops per query family.
    ("BroadcastNestedLoopJoin",
     "bounded broadcast cross (1-row/centroid frame; pinned)"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="dump-plans")
    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        f"Generated by `tools/dump_plans.py` at `{sf_dir}`.  Properties the",
        "plan-shape tests (`tests/test_plan_shape.py`) enforce are marked.",
        "",
        NOTES,
    ]
    for name in QUERIES:
        if name in bench.EXTRA_BENCH:
            fn = bench.EXTRA_BENCH[name]
        else:
            fn, _ = ALL_QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        props = []
        for pat, label in CHECKS:
            hit = re.search(pat, plan)
            if hit and label.startswith("!!"):
                props.append(f"**{label}**")
            elif hit:
                props.append(label)
        out.append(f"## {name}")
        out.append("")
        out.append("Properties: " + "; ".join(props) + ".")
        out.append("")
        out.append("```")
        out.append(plan.strip()[:4000])
        out.append("```")
        out.append("")
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(QUERIES)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
