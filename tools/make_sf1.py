"""True-sf1 fixture generator (VERDICT r3 item #8).

The 10×-replication heavy-tail probe grows every original document
into a 10-member near-dup family, which inflates TRUE pair output
~45× — useful as a worst-case dedup load, but it conflates
output-growth with input-growth. This generator builds a
STATISTICALLY scaled sf1 instead: 10× rows drawn fresh from the
sf0.1 empirical distributions with 10× key spaces — so per-key
densities, join fan-outs, and near-dup rates stay at their natural
sf0.1 levels while the input grows 10×.

Method per table (seed 777, deterministic):

* documents: bootstrap a source text, then SHUFFLE its words with a
  per-row RNG — length/vocab/unigram stats preserved, but the
  shingle sets decorrelate, so the corpus does NOT inherit the
  source's near-dup pairs 100× over;
* orders/lineitem: fresh key spaces (1.5M orders, 150K customers,
  10K suppliers, 200K parts), per-order line counts and all value
  columns bootstrap-resampled from the sf0.1 marginals;
* events: fresh event ids, 15K users, ts/type/value/props
  bootstrapped;
* embeddings (r7): fresh seeded Gaussians per scale tier (norm and
  label marginals bootstrapped) — pairwise near-orthogonal by
  construction — plus near-dup pairs PLANTED at the source's
  measured pair rate × SCALE, so true-pair output grows like the
  input instead of ~200× (the r6 noisy-copy degeneracy);
* customer/supplier/part: scaled key spaces, value columns
  bootstrapped; nation/region copied (fixed 25/5 like TPC-H).

Writes parquet to /tmp/sf1_true/ (~10× sf0.1). Usage:
    python tools/make_sf1.py [out_dir] [scale]

``scale`` (default 10 = true sf1) generalizes the generator — the
round-6 df-cap saturation probe uses scale=30 (sf3) to measure the
exact-mining cost curve past the point where gram document
frequencies cross the 256 cap.
"""

from __future__ import annotations

import json
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SCALE = 10  # overridden by argv[2]


def _read(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def main() -> None:
    global SCALE
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_true"
    if len(sys.argv) > 2:
        SCALE = int(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(777)
    py_rng = random.Random(777)

    # nation/region: fixed dimensions, copy verbatim
    for t in ("nation", "region"):
        pq.write_table(_read(t), f"{out}/{t}.parquet")

    # --- documents ---------------------------------------------------
    d = _read("documents").to_pydict()
    n_src = len(d["doc_id"])
    n_out = n_src * SCALE
    texts, langs, sources, n_chars = [], [], [], []
    for i in range(n_out):
        j = py_rng.randrange(n_src)
        words = d["text"][j].split()
        py_rng.shuffle(words)
        t = " ".join(words)
        texts.append(t)
        langs.append(d["lang"][py_rng.randrange(n_src)])
        sources.append(d["source"][py_rng.randrange(n_src)])
        n_chars.append(len(t))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_out), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs),
                "source": pa.array(sources),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        f"{out}/documents.parquet",
    )

    # --- dimensions with scaled key spaces ---------------------------
    def scaled_dim(name, key_col, n_src_rows, name_col=None, name_fmt=None):
        src = _read(name).to_pydict()
        n_o = n_src_rows * SCALE
        cols = {}
        idx = rng.randint(0, n_src_rows, size=n_o)
        for c in src:
            if c == key_col:
                cols[c] = pa.array(range(n_o), pa.int64())
            elif name_col and c == name_col:
                cols[c] = pa.array([name_fmt % i for i in range(n_o)])
            else:
                vals = src[c]
                cols[c] = pa.array([vals[i] for i in idx])
        pq.write_table(pa.table(cols), f"{out}/{name}.parquet")
        return n_o

    n_cust = scaled_dim("customer", "c_custkey", 15000, "c_name", "Customer#%09d")
    n_supp = scaled_dim("supplier", "s_suppkey", 1000, "s_name", "Supplier#%09d")
    n_part = scaled_dim("part", "p_partkey", 20000)

    # --- orders ------------------------------------------------------
    o = _read("orders").to_pydict()
    n_osrc = len(o["o_orderkey"])
    n_oout = n_osrc * SCALE
    oidx = rng.randint(0, n_osrc, size=n_oout)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_oout), pa.int64()),
                "o_custkey": pa.array(
                    rng.randint(0, n_cust, size=n_oout), pa.int64()
                ),
                "o_orderstatus": pa.array([o["o_orderstatus"][i] for i in oidx]),
                "o_totalprice": pa.array([o["o_totalprice"][i] for i in oidx]),
                "o_orderdate": pa.array(
                    [o["o_orderdate"][i] for i in oidx],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(
                    [o["o_orderpriority"][i] for i in oidx]
                ),
            }
        ),
        f"{out}/orders.parquet",
    )

    # --- lineitem: resample per-order line-count distribution --------
    li = _read("lineitem").to_pydict()
    n_lsrc = len(li["l_orderkey"])
    # empirical lines-per-order from the source
    from collections import Counter

    per_order = Counter(li["l_orderkey"])
    line_counts = np.array(list(per_order.values()))
    cols = {k: [] for k in li}
    for ok in range(n_oout):
        n_lines = int(line_counts[py_rng.randrange(len(line_counts))])
        for ln in range(1, n_lines + 1):
            j = py_rng.randrange(n_lsrc)
            cols["l_orderkey"].append(ok)
            cols["l_partkey"].append(py_rng.randrange(n_part))
            cols["l_suppkey"].append(py_rng.randrange(n_supp))
            cols["l_linenumber"].append(ln)
            for c in (
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_returnflag",
                "l_linestatus",
                "l_shipdate",
            ):
                cols[c].append(li[c][j])
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(cols["l_orderkey"], pa.int64()),
                "l_partkey": pa.array(cols["l_partkey"], pa.int64()),
                "l_suppkey": pa.array(cols["l_suppkey"], pa.int64()),
                "l_linenumber": pa.array(cols["l_linenumber"], pa.int32()),
                "l_quantity": pa.array(cols["l_quantity"], pa.float64()),
                "l_extendedprice": pa.array(
                    cols["l_extendedprice"], pa.float64()
                ),
                "l_discount": pa.array(cols["l_discount"], pa.float64()),
                "l_tax": pa.array(cols["l_tax"], pa.float64()),
                "l_returnflag": pa.array(cols["l_returnflag"]),
                "l_linestatus": pa.array(cols["l_linestatus"]),
                "l_shipdate": pa.array(cols["l_shipdate"], pa.timestamp("us")),
            }
        ),
        f"{out}/lineitem.parquet",
    )

    # --- events ------------------------------------------------------
    e = _read("events").to_pydict()
    n_esrc = len(e["event_id"])
    n_eout = n_esrc * SCALE
    eidx = rng.randint(0, n_esrc, size=n_eout)
    n_users = 1500 * SCALE
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n_eout), pa.int64()),
                "ts": pa.array([e["ts"][i] for i in eidx], pa.timestamp("us")),
                "user_id": pa.array(
                    rng.randint(0, n_users, size=n_eout), pa.int64()
                ),
                "event_type": pa.array([e["event_type"][i] for i in eidx]),
                "value": pa.array([e["value"][i] for i in eidx], pa.float64()),
                "props": pa.array([e["props"][i] for i in eidx]),
            }
        ),
        f"{out}/events.parquet",
    )

    # --- embeddings --------------------------------------------------
    # VERDICT r6 #6: the old generator bootstrapped SOURCE vectors and
    # re-noised them — every time the same base row was resampled
    # twice (expected ~SCALE times per row), the two noisy copies were
    # cos≈0.995 near-dups of each other, so sf1's "near-dup pair"
    # output grew ~209x for 10x input: a fixture artifact that
    # polluted the scale signal for the whole embedding family.
    # Now: GENUINELY NOVEL fresh Gaussians per scale tier (norm and
    # label marginals bootstrapped from the source), which in
    # d-dimensional space are pairwise near-orthogonal — plus near-dup
    # pairs PLANTED at exactly the source's measured per-row pair
    # rate, so output growth tracks input growth by construction.
    em = _read("embeddings").to_pydict()
    n_vsrc = len(em["vec_id"])
    n_vout = n_vsrc * SCALE
    base = np.array(em["embedding"], dtype=np.float64)
    dim = base.shape[1]
    src_norms = np.linalg.norm(base, axis=1)
    # source near-dup pair count at the catalog threshold (0.4)
    unit = base / np.maximum(src_norms[:, None], 1e-300)
    cos_src = unit @ unit.T
    np.fill_diagonal(cos_src, 0.0)
    p_src = int(np.count_nonzero(np.triu(cos_src >= 0.4, k=1)))
    fresh = rng.randn(n_vout, dim)
    fresh /= np.maximum(np.linalg.norm(fresh, axis=1, keepdims=True), 1e-300)
    fresh *= src_norms[rng.randint(0, n_vsrc, size=n_vout)][:, None]
    # plant SCALE * p_src disjoint near-dup pairs: partner = seed +
    # small gaussian noise, renormalized — cos well above threshold,
    # each seed used once so every plant adds exactly one true pair
    n_plant = min(p_src * SCALE, n_vout // 2)
    perm = rng.permutation(n_vout)
    seeds, partners = perm[:n_plant], perm[n_plant: 2 * n_plant]
    pn = np.linalg.norm(fresh[seeds], axis=1, keepdims=True)
    plant = fresh[seeds] + rng.randn(n_plant, dim) * 0.05 * pn
    plant *= pn / np.maximum(
        np.linalg.norm(plant, axis=1, keepdims=True), 1e-300
    )
    fresh[partners] = plant
    labels = np.array(em["label"])[rng.randint(0, n_vsrc, size=n_vout)]
    labels[partners] = labels[seeds]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_vout), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in fresh],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels.tolist(), pa.int32()),
            }
        ),
        f"{out}/embeddings.parquet",
    )

    sizes = {
        t: pq.read_metadata(f"{out}/{t}.parquet").num_rows
        for t in (
            "region",
            "nation",
            "customer",
            "supplier",
            "part",
            "orders",
            "lineitem",
            "events",
            "documents",
            "embeddings",
        )
    }
    print(json.dumps({"out": out, "rows": sizes}))


if __name__ == "__main__":
    main()
