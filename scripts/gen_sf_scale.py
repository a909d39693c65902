"""Scale-replicate a driver testdata dir for superlinearity sweeps.

    python scripts/gen_sf_scale.py --base /root/testdata/sf0.1 \
        --out .scratch/sf1 --factor 10

Builds an N× copy of a base scale-factor dir by stacking N key-remapped
replicas — the same scaling pattern the driver uses between its own SFs
(rows per day grow, the date range does not). Used for the one-time sf1
superlinearity sweep (VERDICT r4 ask #3): the output is for WALL-TIME
ratio measurement only, not for oracle comparison.

Replica construction, per table:
- dims that don't scale (region, nation): copied as-is.
- entity/fact tables: every key column is offset by replica·(max+1) so
  referential integrity holds within each replica and entity counts
  (customers, users, orders, docs) scale with rows, like the driver's SFs.
- documents: every 3rd word of replica i>0 gets an ``ri`` suffix, pushing
  cross-replica Jaccard to ~0.5 — below near-dup thresholds — so dedup
  workloads see 10× the corpus at roughly the base dup-pair rate instead
  of every doc acquiring N-1 artificial near-copies (which would make any
  pair-forming query superlinear BY CONSTRUCTION and poison the sweep).
  n_chars is recomputed from the perturbed text.
- embeddings: replica i's vectors are circularly shifted by i components —
  norm and coordinate distribution preserved, directions decorrelated, so
  ANN/SemDeDup see new points instead of distance-0 clones.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_TABLES = ["region", "nation"]
# offsets must be consistent ACROSS tables (o_custkey must match
# customer.c_custkey), so each logical key space gets one stride
KEY_SPACE = {
    "c_custkey": "customer", "o_custkey": "customer",
    "s_suppkey": "supplier", "l_suppkey": "supplier",
    "p_partkey": "part", "l_partkey": "part",
    "o_orderkey": "orders", "l_orderkey": "orders",
    "event_id": "events.event_id", "user_id": "events.user_id",
    "doc_id": "documents", "vec_id": "embeddings",
}


def _strides(base: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for col, space in KEY_SPACE.items():
        if space in out:
            continue
        table = space.split(".")[0]
        src = next(c for c, s in KEY_SPACE.items() if s == space)
        t = pq.read_table(os.path.join(base, f"{table}.parquet"), columns=[src])
        out[space] = int(pc.max(t[src]).as_py()) + 1
    return out


def _perturb_texts(texts: list[str], replica: int) -> list[str]:
    suffix = f"r{replica}"
    out = []
    for t in texts:
        words = t.split(" ")
        out.append(
            " ".join(
                w + suffix if j % 3 == 0 else w for j, w in enumerate(words)
            )
        )
    return out


def scale_table(base: str, out: str, name: str, factor: int, strides) -> int:
    src = pq.read_table(os.path.join(base, f"{name}.parquet"))
    replicas = []
    for i in range(factor):
        t = src
        for col in KEY_COLS.get(name, []):
            stride = strides[KEY_SPACE[col]]
            shifted = pc.add(t[col], pa.scalar(i * stride, type=t.schema.field(col).type))
            t = t.set_column(t.schema.get_field_index(col), t.schema.field(col), shifted)
        if name == "documents" and i > 0:
            texts = _perturb_texts(t["text"].to_pylist(), i)
            t = t.set_column(
                t.schema.get_field_index("text"),
                t.schema.field("text"),
                pa.array(texts, type=pa.string()),
            )
            t = t.set_column(
                t.schema.get_field_index("n_chars"),
                t.schema.field("n_chars"),
                pa.array([len(x) for x in texts], type=pa.int64()),
            )
        if name == "embeddings" and i > 0:
            mat = np.array(t["embedding"].to_pylist(), dtype=np.float32)
            mat = np.roll(mat, i, axis=1)
            emb_type = t.schema.field("embedding").type
            t = t.set_column(
                t.schema.get_field_index("embedding"),
                t.schema.field("embedding"),
                pa.array([row.tolist() for row in mat], type=emb_type),
            )
        replicas.append(t)
    big = pa.concat_tables(replicas).combine_chunks()
    pq.write_table(big, os.path.join(out, f"{name}.parquet"))
    return big.num_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    strides = _strides(args.base)
    for name in COPY_TABLES:
        t = pq.read_table(os.path.join(args.base, f"{name}.parquet"))
        pq.write_table(t, os.path.join(args.out, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} (copied)")
    for name in KEY_COLS:
        n = scale_table(args.base, args.out, name, args.factor, strides)
        print(f"{name}: {n}")


if __name__ == "__main__":
    main()
