"""Invariants of the scale-corpus generator (tools/make_sf_scale.py).

The generator's whole value is that replication does NOT manufacture
near-duplicate structure: per-replica perturbation tokens must make
every replica's shingle set unique, INCLUDING under chained scalings
(sf1 -> sf10 -> sf100). Round 6's sf100 checkpoint caught the chained
failure mode — (r, source-id)-keyed tokens collided between scaling
passes and produced 495k byte-identical "replicas" — so these tests
pin the fixed contract at a scale small enough for CI.
"""
from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
GEN = REPO / "tools" / "make_sf_scale.py"
SRC = "/root/testdata/sf0.001"


def _scale(src: str, dst: Path, factor: int) -> None:
    subprocess.run(
        [sys.executable, str(GEN), src, str(dst), str(factor)],
        check=True,
        capture_output=True,
    )


@pytest.fixture(scope="module")
def chained(tmp_path_factory) -> tuple[Path, Path]:
    """One direct x5 corpus and a x5 re-scaling of it (chained x25)."""
    root = tmp_path_factory.mktemp("sfchain")
    a, b = root / "a", root / "b"
    _scale(SRC, a, 5)
    _scale(str(a), b, 5)
    return a, b


def test_direct_scaling_row_counts(chained):
    a, _ = chained
    con = duckdb.connect()
    n_src = con.execute(
        f"SELECT count(*) FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    n_a = con.execute(
        f"SELECT count(*) FROM read_parquet('{a}/documents.parquet')"
    ).fetchone()[0]
    assert n_a == 5 * n_src


def test_replica_zero_is_verbatim(chained):
    a, _ = chained
    con = duckdb.connect()
    diff = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{SRC}/documents.parquet') s
        JOIN read_parquet('{a}/documents.parquet') d USING (doc_id)
        WHERE s.text <> d.text
        """
    ).fetchone()[0]
    assert diff == 0


def test_no_duplicate_texts_direct(chained):
    a, _ = chained
    con = duckdb.connect()
    n, d = con.execute(
        f"SELECT count(*), count(DISTINCT text) FROM read_parquet('{a}/documents.parquet')"
    ).fetchone()
    assert n == d, f"{n - d} byte-identical replica texts in a direct scaling"


def test_no_duplicate_texts_chained(chained):
    """The round-6 regression: chained scaling must not collide token
    namespaces between passes (old (r, source-id) keying made pass-2
    replica r of a pass-1 replica-0 doc byte-identical to pass-1
    replica r of the same doc)."""
    _, b = chained
    con = duckdb.connect()
    n, d = con.execute(
        f"SELECT count(*), count(DISTINCT text) FROM read_parquet('{b}/documents.parquet')"
    ).fetchone()
    assert n == d, f"{n - d} byte-identical replica texts in a chained scaling"


def test_chained_fk_consistency(chained):
    """Key offsetting must keep FKs valid through a chain: every
    lineitem order key resolves, every order customer key resolves."""
    _, b = chained
    con = duckdb.connect()
    orphans = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{b}/lineitem.parquet') l
        LEFT JOIN read_parquet('{b}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL
        """
    ).fetchone()[0]
    assert orphans == 0
