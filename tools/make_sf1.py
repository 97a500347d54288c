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
    # STREAM one copy per row group through a single ParquetWriter:
    # a 300-copy (sf30) concat of the text column would hold ~30 GB
    # in pandas at once; the streamed file carries the identical rows
    # in the identical order (round 8, fifth decade)
    n_docs_out, dw = 0, None
    for k in range(n_copies):
        c = docs.copy()
        c["doc_id"] = c["doc_id"] + k * n_docs
        if k > 0:  # copy 0 keeps original text (and ids) verbatim
            suf = f"_{k}"
            c["text"] = [
                " ".join(t + suf for t in txt.split()) for txt in c["text"]
            ]
            c["n_chars"] = [len(t) for t in c["text"]]
        t = pa.Table.from_pandas(c, preserve_index=False)
        if dw is None:
            dw = pq.ParquetWriter(f"{dst}/documents.parquet", t.schema)
        dw.write_table(t)
        n_docs_out += len(c)
    dw.close()

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
    # THIRD axis past 2*dim copies (round 8, sf30): a deterministic
    # elementwise sign PATTERN per 2*dim-sized superblock — patterns
    # cancel inside a copy (dot(s·v, s·w) = dot(v, w), within-copy
    # cosine structure EXACT) while cross-superblock products pick up
    # ~dim/2 random sign flips (decorrelated like a fresh gaussian).
    # Copies below 2*dim use pattern 0 (all ones), so sf3/sf10
    # corpora regenerate byte-identically.
    dim_e = mats.shape[1]
    if n_copies > 2 * dim_e * 64:
        raise SystemExit(
            f"n_copies={n_copies} exceeds 2*dim*64={2 * dim_e * 64}: "
            "roll+flip+pattern decorrelation is exhausted; add an axis"
        )
    n_vec_out, ew = 0, None
    for k in range(n_copies):
        c = emb.copy()
        c["vec_id"] = c["vec_id"] + k * n_vec
        if k > 0:
            sign = -1.0 if (k // dim_e) % 2 else 1.0
            m = sign * np.roll(mats, k % dim_e, axis=1)
            block = k // (2 * dim_e)
            if block > 0:
                pat = np.random.RandomState(7700 + block).choice(
                    np.array([-1.0, 1.0], dtype=np.float32), size=dim_e
                )
                m = m * pat
            c["embedding"] = list(m.astype(np.float32))
        tbl = pa.Table.from_pandas(c, preserve_index=False)
        # embedding column must stay list<float32> (driver's schema)
        idx = tbl.schema.get_field_index("embedding")
        tbl = tbl.set_column(
            idx, "embedding",
            pa.array([list(map(float, v)) for v in c["embedding"]],
                     type=pa.list_(pa.float32())),
        )
        if ew is None:
            ew = pq.ParquetWriter(f"{dst}/embeddings.parquet", tbl.schema)
        ew.write_table(tbl)
        n_vec_out += len(c)
    ew.close()

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
    n_ev_out, vw = 0, None
    for k in range(n_copies):
        c = ev.copy()
        if k > 0:
            c["user_id"] = c["user_id"] + k * user_stride
            c["event_id"] = c["event_id"] + k * event_stride
        t = pa.Table.from_pandas(c, preserve_index=False)
        if vw is None:
            vw = pq.ParquetWriter(f"{dst}/events.parquet", t.schema)
        vw.write_table(t)
        n_ev_out += len(c)
    vw.close()

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
        f"wrote {n_docs_out} docs, {n_vec_out} vectors, "
        f"{n_ev_out} events, {n_orders} orders, {n_li} lineitems to {dst}"
    )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make(src, dst, n)
