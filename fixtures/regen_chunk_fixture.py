#!/usr/bin/env python
"""Regenerate the chunk_documents golden fixture for the sf0.01 oracle.

The fixture is the pure-Python reference-parity chunker
(mlx_vector_db_spark.functions.text.chunk_text — golden-tested against
the reference's break rules in tests/test_text.py) applied to every
sf0.01 document, written with the exact arrow types the Spark operator
emits (document_id int64, chunk_index int32, chunk_text string,
chunk_length int32). The driver's correctness gate always compares at
sf=0.01, so one fixture suffices; re-run this script whenever chunk_text
or the testdata changes.
"""
from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mlx_vector_db_spark.functions.text import chunk_text  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
OUT = Path(__file__).resolve().parent / "chunk_documents_sf0.01.parquet"


def main() -> None:
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetchall()
    ids: list[int] = []
    idxs: list[int] = []
    texts: list[str] = []
    lens: list[int] = []
    for doc_id, text in docs:
        for i, ch in enumerate(chunk_text(text, 400, 50)):
            ids.append(doc_id)
            idxs.append(i)
            texts.append(ch)
            lens.append(len(ch))
    table = pa.table(
        {
            "document_id": pa.array(ids, pa.int64()),
            "chunk_index": pa.array(idxs, pa.int32()),
            "chunk_text": pa.array(texts, pa.string()),
            "chunk_length": pa.array(lens, pa.int32()),
        }
    )
    pq.write_table(table, OUT)
    print(f"wrote {len(ids)} chunk rows to {OUT}")


if __name__ == "__main__":
    main()
