#!/usr/bin/env python
"""Generate a scaled-up copy of a driver testdata directory for scale
checkpoints (e.g. sf0.1 -> sf1 at 10x), preserving schema, foreign-key
consistency, and distributional shape. NEVER writes into /root/testdata
— output goes to a scratch dir the caller owns.

Scaling rules per table (replicas r = 0..R-1, replica 0 = original):

- region/nation: copied once (dimension tables don't grow with sf).
- customer/supplier/part/orders/lineitem: keys offset by r * (max+1)
  on BOTH sides of every FK, payload columns copied — a 10x corpus
  with the same join fan-out and value distributions.
- events: event_id/user_id offset; timestamps unchanged (10x rows per
  hour window = the realistic growth mode for a busier stream).
- documents: replica 0 verbatim; replicas r>0 get a doc-unique token
  injected after every 4th word. This keeps per-doc length/shape while
  destroying >= 3/4 of each doc's 3-gram shingles w.r.t. its twin, so
  replication does NOT create an artificial wall of cross-replica
  near-duplicates (the token is the replica's OUTPUT doc_id — unique
  across chained scalings too, so candidate structure stays
  proportionate, not quadratic in R; see the inline comment for the
  chained-collision failure mode the previous (r, source-id) token
  keying had).
- embeddings: replica 0 verbatim; replicas get FRESH unit-norm Gaussian
  vectors (the source table is uniform-on-sphere — coord std 1/sqrt(d))
  with the original label column replicated — same distribution, no
  fake cosine-0.99+ twins.

Usage::

    python tools/make_sf_scale.py /root/testdata/sf0.1 /tmp/sf1 10
"""
from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260814


def main(src: str, dst: str, factor: int) -> None:
    src_p, dst_p = Path(src), Path(dst)
    if str(dst_p.resolve()).startswith("/root/testdata"):
        raise SystemExit("refusing to write into /root/testdata")
    dst_p.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    def t(name: str) -> str:
        return f"read_parquet('{src_p}/{name}.parquet')"

    def write(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{dst_p}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst_p}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    for dim in ("region", "nation"):
        write(dim, f"SELECT * FROM {t(dim)}")

    # key strides = max+1 per keyed table, applied on both FK sides
    stride = {
        "c": con.execute(f"SELECT max(c_custkey)+1 FROM {t('customer')}").fetchone()[0],
        "s": con.execute(f"SELECT max(s_suppkey)+1 FROM {t('supplier')}").fetchone()[0],
        "p": con.execute(f"SELECT max(p_partkey)+1 FROM {t('part')}").fetchone()[0],
        "o": con.execute(f"SELECT max(o_orderkey)+1 FROM {t('orders')}").fetchone()[0],
        "e": con.execute(f"SELECT max(event_id)+1 FROM {t('events')}").fetchone()[0],
        "u": con.execute(f"SELECT max(user_id)+1 FROM {t('events')}").fetchone()[0],
        "d": con.execute(f"SELECT max(doc_id)+1 FROM {t('documents')}").fetchone()[0],
        "v": con.execute(f"SELECT max(vec_id)+1 FROM {t('embeddings')}").fetchone()[0],
    }
    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({factor})) AS r")

    write("customer", f"""
        SELECT c_custkey + r * {stride['c']} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM {t('customer')} CROSS JOIN reps""")
    write("supplier", f"""
        SELECT s_suppkey + r * {stride['s']} AS s_suppkey,
               s_name, s_nationkey, s_acctbal
        FROM {t('supplier')} CROSS JOIN reps""")
    write("part", f"""
        SELECT p_partkey + r * {stride['p']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {t('part')} CROSS JOIN reps""")
    write("orders", f"""
        SELECT o_orderkey + r * {stride['o']} AS o_orderkey,
               o_custkey + r * {stride['c']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t('orders')} CROSS JOIN reps""")
    write("lineitem", f"""
        SELECT l_orderkey + r * {stride['o']} AS l_orderkey,
               l_partkey + r * {stride['p']} AS l_partkey,
               l_suppkey + r * {stride['s']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {t('lineitem')} CROSS JOIN reps""")
    write("events", f"""
        SELECT event_id + r * {stride['e']} AS event_id, ts,
               user_id + r * {stride['u']} AS user_id,
               event_type, value, props
        FROM {t('events')} CROSS JOIN reps""")
    write("documents", f"""
        WITH w AS (
          SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS words,
                 lang, source, r
          FROM {t('documents')} CROSS JOIN reps
        ), rebuilt AS (
          SELECT doc_id + r * {stride['d']} AS doc_id,
                 -- replica 0 keeps the ORIGINAL text column byte-for-byte
                 -- (so fingerprints/chunk boundaries line up with the
                 -- source directory); only r > 0 replicas are rebuilt
                 -- with doc-unique perturbation tokens. The token is
                 -- keyed on the OUTPUT doc_id (globally unique in the
                 -- scaled corpus), not (r, source doc_id): a chained
                 -- scaling (sf1 -> sf10 -> sf100) re-replicates docs
                 -- whose text already carries first-pass tokens, and a
                 -- (r, source-id)-keyed token collides between pass-2
                 -- replica r of a pass-1 replica-0 doc and pass-1
                 -- replica r of the same doc — producing byte-identical
                 -- "replicas" (measured: 540k jaccard-1.0 phantom pairs
                 -- in a chained 5M-doc corpus). Output-id keying makes
                 -- every replica's token set unique under any chain.
                 CASE WHEN r = 0 THEN text
                 ELSE array_to_string(
                   flatten(list_transform(range(1, len(words) + 1),
                     i -> CASE WHEN i > 1 AND (i - 1) % 4 = 0
                          THEN ['zq' || (w.doc_id + r * {stride['d']}), words[i]]
                          ELSE [words[i]] END)), ' ')
                 END AS text,
                 lang, source
          FROM w
        )
        SELECT doc_id, text, lang, source, length(text) AS n_chars
        FROM rebuilt""")

    # embeddings: numpy path (fresh unit-norm replicas, float32 list col)
    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM {t('embeddings')} ORDER BY vec_id"
    ).df()
    base = np.array(emb.embedding.tolist(), dtype=np.float32)
    labels = emb.label.to_numpy()
    n, d = base.shape
    rng = np.random.default_rng(SEED)
    mats, vids, labs = [base], [emb.vec_id.to_numpy()], [labels]
    for r in range(1, factor):
        m = rng.standard_normal((n, d))
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        mats.append(m.astype(np.float32))
        vids.append(emb.vec_id.to_numpy() + r * stride["v"])
        labs.append(labels)
    tbl = pa.table({
        "vec_id": pa.array(np.concatenate(vids), type=pa.int64()),
        "embedding": pa.array(
            [row for mat in mats for row in mat.tolist()],
            type=pa.list_(pa.float32()),
        ),
        "label": pa.array(np.concatenate(labs), type=pa.int64()),
    })
    pq.write_table(tbl, dst_p / "embeddings.parquet")
    print(f"embeddings: {tbl.num_rows} rows")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
