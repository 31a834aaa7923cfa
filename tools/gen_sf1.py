#!/usr/bin/env python3
"""Generate a deterministic sf1 dataset (10x sf0.1) at /tmp/sf1 for the
scale-headroom measurement (r16 verdict item 2).

The driver's sf* generator is not available, so sf1 is synthesized to
match sf0.1's MEASURED distributions rather than replicated row-wise
(naive 10x replication would plant a 90% exact-dup rate and a
pathological near-dup band that quadratically inflates every LSH
candidate join — the opposite of a fair scaling probe):

- documents: the sf0.1 corpus is a ~31-word unigram soup; sf1 samples
  50k docs i.i.d. from the measured word-frequency, doc-length (in
  words), and (lang, source) joint distributions.  Natural near-dup
  rates follow the same birthday statistics as the original.
- embeddings: 20k vectors from per-label Gaussian fits (per-dimension
  mean/std measured per label on sf0.1), float32, labels from the
  measured marginal — preserves the cluster structure IVF/semantic
  operators key on.
- events: 1M rows bootstrapped from sf0.1's (ts, event_type, value,
  props) marginals over the SAME 30-day span (10x density), user_id
  uniform over a 10x range, event_id sequential.
- TPC-H tables: attribute columns bootstrapped with replacement from
  sf0.1 (marginals preserved exactly), primary keys sequential over
  10x ranges, foreign keys uniform over the scaled parent ranges
  (fan-outs become Poisson with the original means — join
  selectivities preserved to first order).

Everything is numpy seed-42 deterministic.  Output: /tmp/sf1/*.parquet
(~110 MB total; NOT committed).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SF1_OUT", "/tmp/sf1")
SCALE = 10
rng = np.random.default_rng(42)
con = duckdb.connect()


def table(name: str) -> pa.Table:
    return con.sql(
        f"SELECT * FROM read_parquet('{SRC}/{name}.parquet')"
    ).arrow()


def write(name: str, tbl: pa.Table) -> None:
    pq.write_table(tbl, os.path.join(OUT, f"{name}.parquet"))
    print(f"{name}: {tbl.num_rows} rows")


def bootstrap_indices(n_src: int, n_out: int) -> np.ndarray:
    return rng.integers(0, n_src, size=n_out)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    # Fixed dims: copy verbatim.
    for name in ("region", "nation"):
        shutil.copy(f"{SRC}/{name}.parquet", f"{OUT}/{name}.parquet")
        print(f"{name}: copied")

    # ----- documents: unigram-soup regeneration -----
    docs = table("documents").to_pandas()
    texts = docs["text"].tolist()
    all_words = [w for t in texts for w in t.split(" ") if w]
    vocab, counts = np.unique(all_words, return_counts=True)
    word_p = counts / counts.sum()
    lengths = np.array([len([w for w in t.split(" ") if w]) for t in texts])
    n_docs = len(docs) * SCALE
    out_lens = rng.choice(lengths, size=n_docs, replace=True)
    flat = rng.choice(vocab, size=int(out_lens.sum()), p=word_p)
    offsets = np.concatenate([[0], np.cumsum(out_lens)])
    new_texts = [
        " ".join(flat[offsets[i]:offsets[i + 1]]) for i in range(n_docs)
    ]
    ls_idx = bootstrap_indices(len(docs), n_docs)
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs), pa.int64()),
                "text": pa.array(new_texts, pa.string()),
                "lang": pa.array(docs["lang"].to_numpy()[ls_idx]),
                "source": pa.array(docs["source"].to_numpy()[ls_idx]),
                "n_chars": pa.array(
                    np.array([len(t) for t in new_texts]), pa.int64()
                ),
            }
        ),
    )

    # ----- embeddings: per-label Gaussian fit -----
    emb = table("embeddings").to_pandas()
    mat = np.stack(emb["embedding"].to_numpy())  # (n, 64) float32
    labels = emb["label"].to_numpy()
    n_vecs = len(emb) * SCALE
    out_labels = rng.choice(labels, size=n_vecs, replace=True)
    dim = mat.shape[1]
    out_mat = np.empty((n_vecs, dim), dtype=np.float32)
    for lbl in np.unique(labels):
        rows = mat[labels == lbl]
        mu, sd = rows.mean(axis=0), rows.std(axis=0)
        mask = out_labels == lbl
        out_mat[mask] = rng.normal(
            mu, np.maximum(sd, 1e-6), size=(int(mask.sum()), dim)
        ).astype(np.float32)
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
                "embedding": pa.array(
                    list(out_mat), pa.list_(pa.float32())
                ),
                "label": pa.array(out_labels.astype(np.int32), pa.int32()),
            }
        ),
    )

    # ----- events: bootstrap over the same span, 10x density -----
    ev = table("events").to_pandas()
    n_ev = len(ev) * SCALE
    idx = bootstrap_indices(len(ev), n_ev)
    # keep per-row (ts, type, value, props) tuples intact; re-sort by ts
    # so the table stays time-ordered like the original
    boot = ev.iloc[idx].reset_index(drop=True)
    boot = boot.sort_values("ts", kind="mergesort").reset_index(drop=True)
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev), pa.int64()),
                "ts": pa.array(boot["ts"]),
                "user_id": pa.array(
                    rng.integers(0, 1500 * SCALE, size=n_ev), pa.int64()
                ),
                "event_type": pa.array(boot["event_type"]),
                "value": pa.array(boot["value"], pa.float64()),
                "props": pa.array(boot["props"]),
            }
        ),
    )

    # ----- TPC-H: bootstrap attributes, sequential PKs, uniform FKs -----
    sup = table("supplier").to_pandas()
    n_sup = len(sup) * SCALE
    idx = bootstrap_indices(len(sup), n_sup)
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_sup), pa.int64()),
                "s_name": pa.array(
                    [f"Supplier#{i:09d}" for i in range(n_sup)]
                ),
                "s_nationkey": pa.array(
                    sup["s_nationkey"].to_numpy()[idx], pa.int32()
                ),
                "s_acctbal": pa.array(
                    sup["s_acctbal"].to_numpy()[idx], pa.float64()
                ),
            }
        ),
    )

    part = table("part").to_pandas()
    n_part = len(part) * SCALE
    idx = bootstrap_indices(len(part), n_part)
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part), pa.int64()),
                "p_name": pa.array(part["p_name"].to_numpy()[idx]),
                "p_brand": pa.array(part["p_brand"].to_numpy()[idx]),
                "p_type": pa.array(part["p_type"].to_numpy()[idx]),
                "p_size": pa.array(
                    part["p_size"].to_numpy()[idx], pa.int32()
                ),
                "p_retailprice": pa.array(
                    part["p_retailprice"].to_numpy()[idx], pa.float64()
                ),
            }
        ),
    )

    cust = table("customer").to_pandas()
    n_cust = len(cust) * SCALE
    idx = bootstrap_indices(len(cust), n_cust)
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(n_cust)]
                ),
                "c_nationkey": pa.array(
                    cust["c_nationkey"].to_numpy()[idx], pa.int32()
                ),
                "c_acctbal": pa.array(
                    cust["c_acctbal"].to_numpy()[idx], pa.float64()
                ),
                "c_mktsegment": pa.array(
                    cust["c_mktsegment"].to_numpy()[idx]
                ),
            }
        ),
    )

    orders = table("orders").to_pandas()
    n_ord = len(orders) * SCALE
    idx = bootstrap_indices(len(orders), n_ord)
    write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, size=n_ord), pa.int64()
                ),
                "o_orderstatus": pa.array(
                    orders["o_orderstatus"].to_numpy()[idx]
                ),
                "o_totalprice": pa.array(
                    orders["o_totalprice"].to_numpy()[idx], pa.float64()
                ),
                "o_orderdate": pa.array(orders["o_orderdate"].iloc[idx]),
                "o_orderpriority": pa.array(
                    orders["o_orderpriority"].to_numpy()[idx]
                ),
            }
        ),
    )

    li = table("lineitem").to_pandas()
    n_li = len(li) * SCALE
    idx = bootstrap_indices(len(li), n_li)
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(
                    rng.integers(0, n_ord, size=n_li), pa.int64()
                ),
                "l_partkey": pa.array(
                    rng.integers(0, n_part, size=n_li), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(0, n_sup, size=n_li), pa.int64()
                ),
                "l_linenumber": pa.array(
                    li["l_linenumber"].to_numpy()[idx], pa.int32()
                ),
                "l_quantity": pa.array(
                    li["l_quantity"].to_numpy()[idx], pa.float64()
                ),
                "l_extendedprice": pa.array(
                    li["l_extendedprice"].to_numpy()[idx], pa.float64()
                ),
                "l_discount": pa.array(
                    li["l_discount"].to_numpy()[idx], pa.float64()
                ),
                "l_tax": pa.array(
                    li["l_tax"].to_numpy()[idx], pa.float64()
                ),
                "l_returnflag": pa.array(li["l_returnflag"].to_numpy()[idx]),
                "l_linestatus": pa.array(li["l_linestatus"].to_numpy()[idx]),
                "l_shipdate": pa.array(li["l_shipdate"].iloc[idx]),
            }
        ),
    )
    print("done ->", OUT)


if __name__ == "__main__":
    main()
