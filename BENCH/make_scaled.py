"""Build a scaled timing-only copy of a testdata dir (guide §1: measure
at the scale that matters — the driver's round-end bench ran at sf=1.0,
10x the local sf0.1 tables).

NOT correctness data: replicas get offset keys, perturbed text and
jittered embeddings so dedup/similarity operators see realistic
diversity instead of 10 exact copies. Oracle checks stay on the real
driver-generated /root/testdata SFs.

Usage: python BENCH/make_scaled.py /root/testdata/sf0.1 /root/scratch/sf1sim 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

KEY_OFFSET = 100_000_000


def scale_table(name: str, tbl: pa.Table, k: int) -> pa.Table:
    """Replica k of a table: integer id/key columns offset by
    k*KEY_OFFSET (consistently on both sides of every join), text
    perturbed with a replica-unique suffix, embeddings jittered."""
    if k == 0:
        return tbl
    cols = {}
    for i, field in enumerate(tbl.schema):
        col = tbl.column(i)
        nm = field.name
        if pa.types.is_integer(field.type) and (
            nm.endswith("key") or nm.endswith("_id")
        ):
            col = pc.cast(pc.add(col, k * KEY_OFFSET), field.type)
        elif nm == "text":
            # Perturb token SETS without growing the vocabulary: the
            # real corpus vocabulary is ~31 words and jaccard_pairs'
            # exact-bitmask path keys on that bound — appending novel
            # tokens would silently reroute it to the fallback join and
            # time the wrong plan. Append two existing-vocab words
            # chosen per (doc, replica).
            vocab = sorted({w for tx in tbl.column("text").to_pylist()[:2000]
                            for w in (tx or "").split()})
            ids = tbl.column("doc_id").to_pylist()
            texts = tbl.column("text").to_pylist()
            nv = max(len(vocab), 1)
            col = pa.array(
                [f"{tx} {vocab[(d + 3 * k) % nv]} {vocab[(7 * d + k) % nv]}"
                 for d, tx in zip(ids, texts)], pa.string())
        elif nm == "embedding":
            arrs = col.combine_chunks()
            if isinstance(arrs, pa.ChunkedArray):
                arrs = arrs.chunk(0)
            vals = np.array(arrs.values.to_numpy(zero_copy_only=False),
                            dtype=np.float32, copy=True)
            # deterministic per-replica jitter: breaks exact-vector
            # collapse without moving vectors far
            vals += np.float32(k) * np.float32(1e-3) * (
                (np.arange(len(vals)) % 7 == 0).astype(np.float32))
            col = pa.ListArray.from_arrays(arrs.offsets, pa.array(
                vals, type=pa.float32()))
        cols[nm] = col
    return pa.table(cols, schema=tbl.schema) if all(
        cols[f.name].type == f.type for f in tbl.schema
    ) else pa.Table.from_pydict(cols)


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for fn in sorted(os.listdir(src)):
        if not fn.endswith(".parquet"):
            continue
        tbl = pq.read_table(os.path.join(src, fn))
        reps = [scale_table(fn[:-8], tbl, k) for k in range(factor)]
        out = pa.concat_tables(reps)
        pq.write_table(out, os.path.join(dst, fn),
                       row_group_size=1 << 20, compression="zstd")
        print(fn, tbl.num_rows, "->", out.num_rows, flush=True)
    open(os.path.join(dst, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
