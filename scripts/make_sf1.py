"""Synthesize /root/testdata/sf1.0 from sf0.1 for LOCAL perf measurement.

The driver generates its own sf1.0 for the round-end measurement; this
script recreates an equivalent-scale dataset locally (10x rows per table,
10x entity cardinality) so optimizations can be validated at the scale the
driver actually times. It is measurement tooling only — no query reads it
unless SPARK_GRAFT_SF_DIR points at it.

Scaling rules (deterministic, no RNG):
- Ten copies of every scaled table; copy 0 is the original rows verbatim.
- Integer entity keys are offset per copy by i*(max_key+1), so per-entity
  row counts and key-distribution shapes are preserved while entity
  cardinality scales 10x (matching how linear sf scaling behaves).
- documents.text: per-copy Caesar rotation of a-z. An injective word map
  preserves every within-copy exact/near-duplicate relationship and
  shingle statistics exactly, while making cross-copy shingle overlap
  zero — a naive 10x replication would instead create ~45 spurious
  near-dup pairs per document and blow up every LSH bucket quadratically,
  which would misrepresent the driver's workload.
- embeddings.embedding: per-copy cyclic dimension shift by (7*i) % dim.
  A coordinate permutation is an isometry: within-copy pairwise cosines
  (and norms) are preserved bit-for-bit in structure, while cross-copy
  cluster directions decorrelate — same reasoning as the text rotation.
- nation/region are fixed-size dimension tables in TPC-H; copied as is.

Single file, single row group per table, mirroring the driver's layout
(one scan task per table unless the reader repartitions — that layout is
exactly what several r6 optimizations address, so we keep it).
"""
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("MAKE_SF1_DST", "/root/testdata/sf1.0")
COPIES = int(os.environ.get("MAKE_SF1_COPIES", "10"))


def _offset(col: pa.ChunkedArray, i: int) -> pa.ChunkedArray:
    mx = pc.max(col).as_py()
    return pc.add(col, i * (mx + 1))


def _rot_text(col: pa.ChunkedArray, i: int) -> pa.Array:
    if i == 0:
        return col
    k = i % 26
    src = "abcdefghijklmnopqrstuvwxyz"
    table = str.maketrans(src, src[k:] + src[:k])
    return pa.array([t.translate(table) for t in col.to_pylist()], pa.string())


def _shift_vecs(col: pa.ChunkedArray, i: int) -> pa.Array:
    if i == 0:
        return col
    out = []
    for v in col.to_pylist():
        if v is None:
            out.append(None)
            continue
        s = (7 * i) % len(v)
        out.append(v[s:] + v[:s])
    return pa.array(out, pa.list_(pa.float32()))


# table -> {col: transform kind}; kinds: off (key offset), rot (text),
# shift (vector). Unlisted columns are carried verbatim.
RULES = {
    "events": {"event_id": "off", "user_id": "off"},
    "documents": {"doc_id": "off", "text": "rot"},
    "embeddings": {"vec_id": "off", "embedding": "shift"},
    "customer": {"c_custkey": "off"},
    "orders": {"o_orderkey": "off", "o_custkey": "off"},
    "lineitem": {"l_orderkey": "off", "l_partkey": "off", "l_suppkey": "off"},
    "supplier": {"s_suppkey": "off"},
    "part": {"p_partkey": "off"},
}
FIXED = ["nation", "region"]


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for t in FIXED:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
        print(f"{t}: copied (fixed dimension table)")
    for t, rules in RULES.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        base = base.replace_schema_metadata(None)
        parts = []
        for i in range(COPIES):
            cols = []
            for name in base.column_names:
                col = base[name]
                kind = rules.get(name)
                if kind == "off":
                    cols.append(_offset(col, i).cast(base.schema.field(name).type))
                elif kind == "rot":
                    cols.append(_rot_text(col, i))
                elif kind == "shift":
                    cols.append(_shift_vecs(col, i))
                else:
                    cols.append(col)
            parts.append(pa.table(dict(zip(base.column_names, cols)), schema=base.schema))
        out = pa.concat_tables(parts)
        pq.write_table(
            out,
            f"{DST}/{t}.parquet",
            row_group_size=max(out.num_rows, 1),
            compression="snappy",
        )
        print(f"{t}: {base.num_rows} -> {out.num_rows} rows")
    with open(f"{DST}/_DONE", "w") as f:
        f.write("synthesized from sf0.1 by scripts/make_sf1.py\n")
    print("done:", DST)


if __name__ == "__main__":
    main()
