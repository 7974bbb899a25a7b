"""Build a larger-scale measurement dataset approximating the driver's
sf1.0 generator output (measurement only — never used by bench.py or
the oracle; correctness is graded at the small SFs against
/root/testdata, which this script does not touch).

Scaling rules inferred from sf0.01 -> sf0.1 (TESTDATA.md + inspection):
  x10 rows: customer, orders, lineitem, part, supplier, events, documents
  x4  rows: embeddings
  fixed:    nation, region

TPC-H-ish tables are scaled by replicating the sf0.1 tables K times
with shifted keys (fan-outs and value distributions identical per
replica).  documents/embeddings are synthesized fresh with the observed
vocabulary / length / lang / source / label distributions plus injected
near-dup clusters at the observed per-doc density, so the dedup and ANN
queries see realistic candidate volumes rather than degenerate 10x
exact-duplicate explosions.

Usage: python scripts/make_sfscale.py [--out /root/sfscale/sf1.0] [--k 10]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"


def scale_tpch(out: str, k: int) -> None:
    cust = pd.read_parquet(f"{SRC}/customer.parquet")
    orders = pd.read_parquet(f"{SRC}/orders.parquet")
    li = pd.read_parquet(f"{SRC}/lineitem.parquet")
    part = pd.read_parquet(f"{SRC}/part.parquet")
    supp = pd.read_parquet(f"{SRC}/supplier.parquet")
    ev = pd.read_parquet(f"{SRC}/events.parquet")

    n_cust = int(cust.c_custkey.max()) + 1
    n_ord = int(orders.o_orderkey.max()) + 1
    n_part = int(part.p_partkey.max()) + 1
    n_supp = int(supp.s_suppkey.max()) + 1
    n_user = int(ev.user_id.max()) + 1
    n_evid = int(ev.event_id.max()) + 1

    def rep(df: pd.DataFrame, shifts: dict[str, int]) -> pd.DataFrame:
        outs = []
        for i in range(k):
            d = df.copy()
            for col, base in shifts.items():
                d[col] = d[col] + i * base
            outs.append(d)
        return pd.concat(outs, ignore_index=True)

    rep(cust, {"c_custkey": n_cust}).to_parquet(f"{out}/customer.parquet", index=False)
    rep(orders, {"o_orderkey": n_ord, "o_custkey": n_cust}).to_parquet(
        f"{out}/orders.parquet", index=False)
    rep(li, {"l_orderkey": n_ord, "l_partkey": n_part, "l_suppkey": n_supp}
        ).to_parquet(f"{out}/lineitem.parquet", index=False)
    rep(part, {"p_partkey": n_part}).to_parquet(f"{out}/part.parquet", index=False)
    rep(supp, {"s_suppkey": n_supp}).to_parquet(f"{out}/supplier.parquet", index=False)
    rep(ev, {"event_id": n_evid, "user_id": n_user}).to_parquet(
        f"{out}/events.parquet", index=False)
    for t in ("nation", "region"):
        pd.read_parquet(f"{SRC}/{t}.parquet").to_parquet(
            f"{out}/{t}.parquet", index=False)


def synth_documents(out: str, k: int, rng: np.random.Generator) -> None:
    src = pd.read_parquet(f"{SRC}/documents.parquet")
    vocab = sorted({w for t in src.text for w in t.split()})
    lens = src.text.str.split().str.len().to_numpy()
    langs = src.lang.value_counts(normalize=True)
    n_src = src.source.nunique()
    n = len(src) * k  # 50k at k=10

    # Observed near-dup density: ~234 high-jaccard pairs per 5000 docs
    # (clusters of 2-4).  Inject clusters covering the same per-doc rate.
    n_cluster = int(n * 0.022)  # ~1100 clusters at 50k -> ~2300 pairs
    texts: list[str] = []
    base_lens = rng.choice(lens, size=n)
    for i in range(n):
        L = int(base_lens[i])
        toks = rng.choice(vocab, size=L)
        texts.append(" ".join(toks))
    # overwrite cluster members with perturbed copies of a base doc
    idx = rng.choice(n, size=n_cluster * 4, replace=False)
    pos = 0
    for _ in range(n_cluster):
        size = int(rng.integers(2, 5))
        members = idx[pos:pos + size]
        pos += size
        if len(members) < 2:
            break
        base = texts[members[0]].split()
        for m in members[1:]:
            t = list(base)
            n_edit = max(1, int(len(t) * 0.05))
            for _ in range(n_edit):
                j = int(rng.integers(0, len(t)))
                t[j] = vocab[int(rng.integers(0, len(vocab)))]
            texts[m] = " ".join(t)
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(langs.index.to_numpy(), size=n, p=langs.to_numpy()),
        "source": [f"src{int(x)}" for x in rng.integers(0, n_src, size=n)],
    })
    df["n_chars"] = df.text.str.len().astype("int64")
    df.to_parquet(f"{out}/documents.parquet", index=False)


def synth_embeddings(out: str, k: int, rng: np.random.Generator) -> None:
    src = pd.read_parquet(f"{SRC}/embeddings.parquet")
    dim = len(src.embedding.iloc[0])
    n_label = src.label.nunique()
    # x4 per x10 sf (500 -> 2000 -> 8000)
    n = len(src) * max(1, k * 4 // 10)
    centers = rng.normal(0, 1, size=(n_label, dim)).astype(np.float32)
    labels = rng.integers(0, n_label, size=n).astype(np.int32)
    vecs = (0.4 * centers[labels]
            + rng.normal(0, 1, size=(n, dim)).astype(np.float32))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            * np.abs(rng.normal(1.0, 0.1, size=(n, 1)))).astype(np.float32)
    # inject a few within-label near-dup pairs (q34's result population)
    n_pairs = max(2, n // 300)
    a = rng.choice(n, size=n_pairs, replace=False)
    for i in a:
        j = int(rng.integers(0, n))
        if j == i:
            continue
        labels[j] = labels[i]
        vecs[j] = vecs[i] + rng.normal(0, 0.02, size=dim).astype(np.float32)
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v for v in vecs],
        "label": labels,
    })
    df.to_parquet(f"{out}/embeddings.parquet", index=False)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/sfscale/sf1.0")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    scale_tpch(args.out, args.k)
    synth_documents(args.out, args.k, rng)
    synth_embeddings(args.out, args.k, rng)
    for f in sorted(os.listdir(args.out)):
        print(f, os.path.getsize(os.path.join(args.out, f)) // 1024, "KB")


if __name__ == "__main__":
    main()
