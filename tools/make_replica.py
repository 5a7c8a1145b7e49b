#!/usr/bin/env python3
"""Scale-replica builder for the README 8x/64x probes (driver-side
tooling only — NOT part of the shipped library).

Usage: python3 tools/make_replica.py <srcSfDir> <outDir> <factor>

Replication recipe (the README scale-notes conventions):
- documents: doc_id += 100_000*r (preserves mod-10 splits), every-10th
  token rewritten with a replica tag so cross-replica Jaccard stays ~0.5
  (dup density constant as the corpus grows);
- embeddings: vec_id += 100_000*r, vectors kept (cost probes measure
  scan/topk shape; fixed probe ids stay in replica 0 so query load is
  constant while the corpus grows);
- events: event_id/user_id += 100_000*r (corpus growth means MORE
  users, not denser ones — per-key window width constant).

All outputs use bounded row groups so scans stay splittable (a single
row group serializes the whole scan into one task — README gotcha).
"""
import sys

import pandas as pd


def rewrite_text(text: str, r: int) -> str:
    if r == 0:
        return text
    toks = text.split(" ")
    return " ".join(
        f"r{r}x{i % 7}" if i % 10 == 0 else t for i, t in enumerate(toks))


def main() -> None:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(out, exist_ok=True)
    docs = pd.read_parquet(f"{src}/documents.parquet")
    reps = []
    for r in range(factor):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + 100_000 * r
        if r > 0:
            d["text"] = d["text"].map(lambda t, r=r: rewrite_text(t, r))
        reps.append(d)
    pd.concat(reps, ignore_index=True).to_parquet(
        f"{out}/documents.parquet", row_group_size=10_000)

    emb = pd.read_parquet(f"{src}/embeddings.parquet")
    reps = []
    for r in range(factor):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + 100_000 * r
        reps.append(e)
    pd.concat(reps, ignore_index=True).to_parquet(
        f"{out}/embeddings.parquet", row_group_size=10_000)

    ev = pd.read_parquet(f"{src}/events.parquet")
    reps = []
    for r in range(factor):
        e = ev.copy()
        e["event_id"] = e["event_id"] + 100_000 * r
        e["user_id"] = e["user_id"] + 100_000 * r
        reps.append(e)
    pd.concat(reps, ignore_index=True).to_parquet(
        f"{out}/events.parquet", row_group_size=10_000)
    print(f"wrote {out} at {factor}x")


if __name__ == "__main__":
    main()
