#!/usr/bin/env python
"""Generate sf0.3 / sf1 scale-test tables by tiling the driver's sf0.1
parquet with key offsets (round-5 verdict #3: MEASURE the scaling curve
instead of asserting it).

The driver's own generator (TESTDATA.md, read-only) scales key DOMAINS
linearly with sf while holding time spans and vocabularies fixed
(verified sf0.01 → sf0.1: custkey 0..1499 → 0..14999, orders span
1995-2001 at both, events span Jan-2024 at both, 31-token document
vocabulary at both).  Tiling K offset replicas of sf0.1 reproduces
exactly that growth law:

- every key domain grows ×K with referential integrity intact per
  replica (custkey/orderkey/partkey/suppkey/user_id/doc_id/vec_id all
  offset by replica × sf0.1-domain-size);
- time columns are untouched — densification, not extension, matching
  the driver;
- document TEXT repeats (vocabulary stays fixed), so corpus-level
  duplication stays high — the regime the driver's fixed-vocab corpus
  is already in;
- embeddings are perturbed PER-COMPONENT by a deterministic
  (replica, position)-dependent epsilon (round-6 ADVICE #4: a single
  per-replica scalar left every replica collinear with its source, so
  cosine ties survived 4-decimal rounding) — replica vectors are
  near- but genuinely not collinear duplicates (cosine structure
  preserved, degenerate exact ties avoided);
- region/nation are fixed dimensions and copy through.

Output layout mirrors /root/testdata: one parquet FILE per table, so
every reader (including the streaming pathGlobFilter=events.parquet
source) works unchanged.

Usage: python tools_gen_scale_data.py [outroot] [sf ...]
       defaults: /tmp/scaledata 0.3 1
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> {column: offset_per_replica}; domain sizes of sf0.1
OFFSETS: dict[str, dict[str, int]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000,
                 "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
FIXED_DIMS = ("region", "nation")


def _replica(tbl: pa.Table, name: str, i: int) -> pa.Table:
    cols = []
    for field in tbl.schema:
        col = tbl.column(field.name)
        off = OFFSETS[name].get(field.name)
        if off:
            col = pc.add(col, pa.scalar(i * off, type=field.type))
        elif name == "embeddings" and field.name == "embedding" and i:
            import numpy as np

            chunk = col.combine_chunks()
            offsets = chunk.offsets
            flat = pc.list_flatten(chunk).to_numpy(zero_copy_only=False)
            # per-(replica, position) epsilon in ±i·1e-3: position runs
            # over the flattened values, so no two components of a
            # vector scale identically and the replica is NOT a scalar
            # multiple of its source (cosine < 1 by a real margin)
            pos = np.arange(flat.shape[0], dtype=np.int64)
            eps = ((pos * 2654435761 + i * 97) % 2001 - 1000) / 1000.0
            flat = flat * (1.0 + i * 1e-3 * eps)
            col = pa.chunked_array(
                [
                    pa.ListArray.from_arrays(
                        offsets, pa.array(flat).cast(pa.float32())
                    )
                ]
            )
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=tbl.schema)


def generate(outroot: str, sf: float) -> str:
    k = round(sf / 0.1)
    assert k >= 1 and abs(k * 0.1 - sf) < 1e-9, f"sf must be a 0.1 multiple: {sf}"
    out = os.path.join(outroot, f"sf{sf:g}")
    os.makedirs(out, exist_ok=True)
    for name in OFFSETS:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        if name in FIXED_DIMS or k == 1:
            pieces = [src]
        else:
            pieces = [_replica(src, name, i) for i in range(k)]
        pq.write_table(
            pa.concat_tables(pieces),
            f"{out}/{name}.parquet",
            compression="snappy",
        )
        print(f"  {name}: {sum(p.num_rows for p in pieces):,} rows", flush=True)
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    outroot = args[0] if args else "/tmp/scaledata"
    sfs = [float(a) for a in args[1:]] or [0.3, 1.0]
    for sf in sfs:
        print(f"sf{sf:g} -> {generate(outroot, sf)}")
