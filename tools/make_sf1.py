"""Scale-rehearsal data generator: a deterministic ~10x corpus from
sf0.1, written to /tmp/sf1 (documents + embeddings — the tables the
dedup/similarity family reads).

Design: naive 10x replication would EXPLODE quadratic structure
(every near-dup cluster x10 copies -> x100 pairs), measuring pair
inflation instead of scaling. Instead each copy k is made disjoint
from the others while preserving within-copy structure:

- documents: every token gets a per-copy suffix (``tok_k``), so
  cross-copy shingles never match but a planted near-dup pair inside
  copy k still shares its shingles (pair volume scales ~10x, like a
  real 10x crawl with its own duplicates);
- embeddings: vectors are np.roll'ed by k positions (random gaussians
  rolled are effectively independent; cosine structure within a copy
  is preserved exactly). vec_id/doc_id offset by copy stride.

Usage: python tools/make_sf1.py [src_sf_dir] [dst_dir] [n_copies]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def make(src: str, dst: str, n_copies: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    docs = con.sql(
        f"SELECT * FROM read_parquet('{src}/documents.parquet')"
    ).df()
    n_docs = len(docs)
    out = []
    for k in range(n_copies):
        c = docs.copy()
        c["doc_id"] = c["doc_id"] + k * n_docs
        if k > 0:  # copy 0 keeps original text (and ids) verbatim
            suf = f"_{k}"
            c["text"] = [
                " ".join(t + suf for t in txt.split()) for txt in c["text"]
            ]
            c["n_chars"] = [len(t) for t in c["text"]]
        out.append(c)
    big = out[0] if n_copies == 1 else __import__("pandas").concat(out)
    pq.write_table(pa.Table.from_pandas(big, preserve_index=False),
                   f"{dst}/documents.parquet")

    emb = con.sql(
        f"SELECT * FROM read_parquet('{src}/embeddings.parquet')"
    ).df()
    n_vec = len(emb)
    mats = np.array(list(emb["embedding"]), dtype=np.float32)
    # roll-by-k decorrelation is modulo the dimension: copy k and
    # copy k+dim would be IDENTICAL vectors under fresh ids, handing
    # every vector an exact cosine-1 twin and re-creating the pair
    # inflation this corpus exists to avoid. Second decorrelation
    # axis past dim copies: a GLOBAL sign flip per dim-sized block —
    # cosine(v, -v) = -1 (maximally far, never a near-dup) and
    # -roll(a) vs -roll(b) is as decorrelated as the unflipped pair,
    # so blocks 0..dim-1 and dim..2*dim-1 stay structurally disjoint.
    if n_copies > 2 * mats.shape[1]:
        raise SystemExit(
            f"n_copies={n_copies} exceeds 2*dim={2 * mats.shape[1]}: "
            "roll+sign-flip decorrelation is exhausted; add a third axis"
        )
    parts = []
    for k in range(n_copies):
        c = emb.copy()
        c["vec_id"] = c["vec_id"] + k * n_vec
        if k > 0:
            sign = -1.0 if (k // mats.shape[1]) % 2 else 1.0
            c["embedding"] = list(sign * np.roll(mats, k % mats.shape[1], axis=1))
        parts.append(c)
    bige = parts[0] if n_copies == 1 else __import__("pandas").concat(parts)
    tbl = pa.Table.from_pandas(bige, preserve_index=False)
    # embedding column must stay list<float32> (the driver's schema)
    idx = tbl.schema.get_field_index("embedding")
    tbl = tbl.set_column(
        idx, "embedding",
        pa.array([list(map(float, v)) for v in bige["embedding"]],
                 type=pa.list_(pa.float32())),
    )
    pq.write_table(tbl, f"{dst}/embeddings.parquet")

    # events: copy k offsets user_id by a disjoint stride (per-user
    # attribution chains stay intact within a copy; the KEY cardinality
    # scales 10x — the axis the attribution window sums shuffle on)
    # and event_id by k*n_events (uniqueness). ts/type/value untouched,
    # so every copy re-creates the same per-user touch structure.
    ev = con.sql(f"SELECT * FROM read_parquet('{src}/events.parquet')").df()
    # a regenerated file with NULL ids would round-trip BIGINT ->
    # float64 through pandas and write DOUBLE columns the pinned
    # bigint reader schema cannot scan — keep ids nullable-integer
    # (review r05)
    for c_ in ("user_id", "event_id"):
        ev[c_] = ev[c_].astype("Int64")
    # stride = max-min+1, NOT max+1 or len(ev): a regenerated events
    # file with sparse/1-based ids — or NEGATIVE ids, which max+1
    # would remap onto copy 0's positive range — would otherwise
    # collide copies, flipping the sf1 uniqueness expectation and
    # merging distinct users' attribution chains (review r05)
    user_stride = int(ev["user_id"].max()) - int(ev["user_id"].min()) + 1
    event_stride = int(ev["event_id"].max()) - int(ev["event_id"].min()) + 1
    eparts = []
    for k in range(n_copies):
        c = ev.copy()
        if k > 0:
            c["user_id"] = c["user_id"] + k * user_stride
            c["event_id"] = c["event_id"] + k * event_stride
        eparts.append(c)
    bigev = eparts[0] if n_copies == 1 else __import__("pandas").concat(eparts)
    pq.write_table(
        pa.Table.from_pandas(bigev, preserve_index=False),
        f"{dst}/events.parquet",
    )

    # dims referenced by fact-side entries (the quality contract's
    # referential check reads customer): copied VERBATIM — dims stay
    # fixed while facts scale, the realistic 10x-crawl shape, and the
    # rehearsal must be reproducible from this tool alone (review r05)
    dim = con.sql(f"SELECT * FROM read_parquet('{src}/customer.parquet')").arrow()
    pq.write_table(dim, f"{dst}/customer.parquet")

    # orders scale 10x with o_custkey UNCHANGED (fact rows grow, key
    # domain fixed — the realistic crawl shape, and exactly the
    # map-side-collapse claim the bloom rehearsal tests: 10x scan into
    # the same <=1024 filter lanes); o_orderkey strides for
    # uniqueness. DuckDB COPY keeps parquet types, no pandas
    # round-trip. nation is a verbatim dim like customer.
    okey = con.sql(
        f"SELECT max(o_orderkey) - min(o_orderkey) + 1 AS s "
        f"FROM read_parquet('{src}/orders.parquet')"
    ).fetchone()[0]
    con.sql(
        f"""
        COPY (
          SELECT o.* REPLACE (
            o.o_orderkey + g.k * {int(okey)} AS o_orderkey)
          FROM read_parquet('{src}/orders.parquet') o,
               (SELECT unnest(generate_series(0, {n_copies - 1})) AS k) g
        ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.sql(
        f"COPY (SELECT * FROM read_parquet('{src}/nation.parquet')) "
        f"TO '{dst}/nation.parquet' (FORMAT PARQUET)"
    )
    # lineitem rides its order: l_orderkey strides by the SAME okey
    # stride per copy so every scaled order keeps its own lineitems
    # (and therefore its own close date — the backlog rehearsal's
    # interval structure), while the DAY domain stays the original
    # span: deltas grow 10x into a fixed-size running-sum window.
    # Orphan lineitems OUTSIDE the orders keyspan would stride into a
    # NEIGHBORING copy's order range and silently merge into the
    # wrong order (the events stride-collision class, review r06) —
    # refuse rather than corrupt the rehearsal structure.
    li_span = con.sql(
        f"SELECT min(l_orderkey), max(l_orderkey) "
        f"FROM read_parquet('{src}/lineitem.parquet')"
    ).fetchone()
    o_span = con.sql(
        f"SELECT min(o_orderkey), max(o_orderkey) "
        f"FROM read_parquet('{src}/orders.parquet')"
    ).fetchone()
    if li_span[0] is not None and (
        li_span[0] < o_span[0] or li_span[1] > o_span[1]
    ):
        raise SystemExit(
            f"lineitem keyspan {li_span} escapes the orders keyspan "
            f"{o_span}: striding would collide orphan lineitems into a "
            "neighboring copy's orders — regenerate or re-key first"
        )
    con.sql(
        f"""
        COPY (
          SELECT l.* REPLACE (
            l.l_orderkey + g.k * {int(okey)} AS l_orderkey)
          FROM read_parquet('{src}/lineitem.parquet') l,
               (SELECT unnest(generate_series(0, {n_copies - 1})) AS k) g
        ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    n_orders = con.sql(
        f"SELECT count(*) FROM read_parquet('{dst}/orders.parquet')"
    ).fetchone()[0]
    n_li = con.sql(
        f"SELECT count(*) FROM read_parquet('{dst}/lineitem.parquet')"
    ).fetchone()[0]
    print(
        f"wrote {len(big)} docs, {len(bige)} vectors, "
        f"{len(bigev)} events, {n_orders} orders, {n_li} lineitems to {dst}"
    )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make(src, dst, n)
