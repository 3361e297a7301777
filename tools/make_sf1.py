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

* documents (r8): SYNTHETIC ZIPFIAN corpus — the source fixture
  draws from a ~31-word vocabulary, so its trigram universe is tiny
  and flat-df (29,551 distinct trigrams, max df 137 at sf1) and
  every exact n-gram miner pays an irreducible Σ C(df,2) candidate
  space (4 of 13 SF1_TRIAGE_r7 rows were this fixture property, not
  code). Now each doc's tokens are drawn from a 30k-word vocabulary
  with a Zipf(1.07) rank-frequency law (lengths, lang and source
  marginals still bootstrapped from the source), which gives a
  LONG-TAILED gram df distribution like a real corpus: the few
  stop-gram-like head trigrams cross the df cap and are dropped (by
  design), the tail is rare, and candidate space grows ~linearly
  with the corpus. Near-dup pairs are PLANTED (10% word-dropout
  copies, 1% of docs) so dedup output stays non-trivial and grows
  linearly with input;
* orders/lineitem: fresh key spaces (1.5M orders, 150K customers,
  10K suppliers, 200K parts), per-order line counts and all value
  columns bootstrap-resampled from the sf0.1 marginals;
* events: fresh event ids, 15K users, ts/type/value/props
  bootstrapped;
* embeddings (r7): fresh seeded Gaussians per scale tier (norm and
  label marginals bootstrapped) — removing the r6 noisy-copy
  artifact, which added ~209× output on top of the geometry — plus
  near-dup pairs PLANTED at the source's measured pair rate × SCALE.
  Note (ADVICE r7): this restores the NATURAL quadratic tail, not
  linear output growth — accidental cos≥0.4 pairs among fresh d=64
  Gaussians occur at a scale-invariant ~4.6e-4 per pair and grow as
  C(n,2), dominating the planted (linear) minority at sf1+;
* customer/supplier/part: scaled key spaces, value columns
  bootstrapped; nation/region copied (fixed 25/5 like TPC-H);
* part names (r8): regenerated from a 384-word vocabulary (4 words
  each) instead of bootstrapping the source's 64 distinct names —
  the old names made blocking_candidate_pairs' TRUE ed≤2 answer
  13.5M pairs at sf1 (a fixture property); realistic name entropy
  restores a natural collision rate.

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

    # --- documents (r8: Zipfian synthetic corpus, VERDICT r7 #2) -----
    # Deterministic pronounceable vocabulary: word i = 1-2 syllables
    # from i's base-2160 digits. 30k words; rank-frequency follows
    # Zipf(1.07) like a natural corpus, so gram document frequencies
    # are long-tailed instead of flat — stop-gram heads cross the
    # miners' df cap and drop, the tail is rare, and exact-mining
    # candidate space grows ~linearly with the corpus.
    # The syllable inventory must be RICH (onset clusters + codas,
    # 2160 distinct syllables) for CHARACTER-level entropy too: a
    # first cut used 80 plain CV syllables and the char-5-gram
    # universe collapsed, sending the winnowing fingerprint join
    # quadratic at sf1 — the same degeneracy the word-level fix
    # removes, one level down.
    d = _read("documents").to_pydict()
    n_src = len(d["doc_id"])
    n_out = n_src * SCALE
    onsets = [
        "b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p",
        "r", "s", "t", "v", "w", "z", "bl", "br", "ch", "cl", "cr",
        "dr", "fl", "fr", "gl", "gr", "ph", "pl", "pr", "qu", "sc",
        "sh", "sk", "sl", "sm", "sn", "sp", "st", "sw", "th", "tr",
        "tw", "wh", "wr", "sch", "str",
    ]  # 48
    codas = ["", "n", "r", "s", "t", "l", "m", "k", "x"]  # 9
    syll = [o + v + c for o in onsets for v in "aeiou" for c in codas]
    n_syll = len(syll)  # 2160
    vocab_n = 30_000

    def _word(i: int) -> str:
        parts = [syll[i % n_syll]]
        i //= n_syll
        while i:
            parts.append(syll[i % n_syll])
            i //= n_syll
        return "".join(parts)

    vocab = [_word(i) for i in range(vocab_n)]
    # decouple Zipf rank from word identity: sequential indices make
    # the head of the distribution a cluster of lexical SIBLINGS
    # ("ba","ban","bar",...), collapsing the char-gram universe the
    # frequent words dominate; a seeded shuffle scatters the head
    # across the whole syllable space like a natural lexicon.
    rng.shuffle(vocab)
    probs = 1.0 / np.arange(1, vocab_n + 1) ** 1.07
    probs /= probs.sum()
    src_lens = np.array([len(t.split()) for t in d["text"]], dtype=np.int64)
    lens = src_lens[rng.randint(0, n_src, size=n_out)]
    draws = rng.choice(vocab_n, size=int(lens.sum()), p=probs)
    offs = np.concatenate(([0], np.cumsum(lens)))
    doc_words = [
        [vocab[t] for t in draws[offs[i]: offs[i + 1]]] for i in range(n_out)
    ]
    # plant near-dup pairs: 1% of docs become a 10% word-dropout copy
    # of a disjoint seed doc — trigram Jaccard ≈ 0.7, comfortably over
    # the catalog's 0.2 threshold — so dedup output is non-trivial and
    # grows LINEARLY with input (each seed used once = one true pair).
    # lang/source stay independently sampled, so a plant whose source
    # differs from its seed's is natural cross-source contamination.
    n_plant = n_out // 100
    perm = rng.permutation(n_out)
    for s_i, p_i in zip(perm[:n_plant], perm[n_plant: 2 * n_plant]):
        seed_words = doc_words[s_i]
        keep = rng.rand(len(seed_words)) >= 0.10
        if keep.sum() < 4:  # keep at least one shingle
            keep[:4] = True
        doc_words[p_i] = [w for w, k in zip(seed_words, keep) if k]
    texts = [" ".join(ws) for ws in doc_words]
    lidx = rng.randint(0, n_src, size=n_out)
    sidx = rng.randint(0, n_src, size=n_out)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_out), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array([d["lang"][i] for i in lidx]),
                "source": pa.array([d["source"][i] for i in sidx]),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{out}/documents.parquet",
    )

    # --- dimensions with scaled key spaces ---------------------------
    def scaled_dim(
        name, key_col, n_src_rows, name_col=None, name_fmt=None, name_gen=None
    ):
        src = _read(name).to_pydict()
        n_o = n_src_rows * SCALE
        cols = {}
        idx = rng.randint(0, n_src_rows, size=n_o)
        for c in src:
            if c == key_col:
                cols[c] = pa.array(range(n_o), pa.int64())
            elif name_col and c == name_col:
                cols[c] = pa.array(
                    name_gen(n_o) if name_gen else [name_fmt % i for i in range(n_o)]
                )
            else:
                vals = src[c]
                cols[c] = pa.array([vals[i] for i in idx])
        pq.write_table(pa.table(cols), f"{out}/{name}.parquet")
        return n_o

    # part names (r8, VERDICT r7 #2): the source fixture has 64
    # DISTINCT p_name values built on a 16-word vocabulary; at sf1
    # bootstrap that made blocking_candidate_pairs' TRUE ed<=2 answer
    # 13.5M pairs (and edit_distance_pairs_parts similar) — the
    # answer itself was quadratic in the fixture, not the plan. A
    # TPC-H-style name = 4 words drawn from a 384-word vocabulary
    # restores realistic name entropy: blocks (first token x brand)
    # stay small and near-identical names are rare.
    part_vocab = [
        f"{a}{v}{b}"
        for a in "bcdfghjklmnprstvwz"  # 18
        for v in "aeiou"  # x5
        for b in ("le", "ro", "ski", "ta")  # x4 -> 360
    ] + ["amber", "azure", "beige", "coral", "ivory", "khaki",
         "mauve", "ochre", "olive", "peach", "plum", "rose",
         "rust", "sage", "teal", "umber", "violet", "wheat",
         "aqua", "jade", "onyx", "opal", "pearl", "ruby"]  # 384

    def part_names(n_o):
        picks = rng.randint(0, len(part_vocab), size=(n_o, 4))
        return [" ".join(part_vocab[j] for j in row) for row in picks]

    n_cust = scaled_dim("customer", "c_custkey", 15000, "c_name", "Customer#%09d")
    n_supp = scaled_dim("supplier", "s_suppkey", 1000, "s_name", "Supplier#%09d")
    n_part = scaled_dim("part", "p_partkey", 20000, "p_name", name_gen=part_names)

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
    # label marginals bootstrapped from the source) plus near-dup
    # pairs PLANTED at the source's measured pair rate x SCALE. This
    # removes the noisy-copy ARTIFACT; it does NOT make output linear
    # (ADVICE r7): accidental cos>=0.4 pairs among fresh d=64
    # Gaussians occur at a scale-invariant ~4.6e-4 per pair and grow
    # as C(n,2) — the natural quadratic tail dominates the planted
    # (linear) minority at sf1+ (measured: 920 -> 105,526 pairs for
    # 10x input).
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
