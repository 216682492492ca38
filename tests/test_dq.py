"""Unit tests for the data-quality audit; the mixed pass/fail fixture on
real testdata is the `dq_audit` catalog oracle."""

from __future__ import annotations

import pytest

from mlx_vector_db_spark.operators.dq import Check, dq_audit


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "a", 10.0, "US"),
        (2, "b", -5.0, "DE"),       # range violation
        (2, "c", 20.0, "FR"),       # duplicate id
        (3, None, 30.0, "XX"),      # null name + bad country
        (4, "dd", 5.0, "US"),       # regex violation (2 letters is fine: ^[a-z]+$ ok) -> adjust below
        (5, "E9", 7.0, "US"),       # regex violation (uppercase+digit)
    ]
    return spark.createDataFrame(rows, "id long, name string, amount double, country string")


def _report(df):
    return {
        (r.constraint, r.column): (r.violations, r.checked, r.passed)
        for r in df.collect()
    }


def test_all_constraint_kinds(spark, frame):
    parent = spark.createDataFrame([(1,), (2,), (3,), (4,)], "pid long")
    rep = _report(
        dq_audit(
            frame,
            Check(
                completeness=["name", "id"],
                uniqueness=["id", ("id", "name")],
                in_range={"amount": (0.0, None)},
                accepted_values={"country": ["US", "DE", "FR"]},
                matches={"name": r"^[a-z]+$"},
                fk={"id": (parent, "pid")},
            ),
        )
    )
    n = 6
    assert rep[("completeness", "name")] == (1, n, False)
    assert rep[("completeness", "id")] == (0, n, True)
    # duplicate id=2 appears twice -> 2 violating rows
    assert rep[("uniqueness", "id")] == (2, n, False)
    assert rep[("uniqueness", "id,name")] == (0, n, True)
    assert rep[("in_range", "amount")] == (1, n, False)
    assert rep[("accepted_values", "country")] == (1, n, False)
    # NULL name is NOT a regex violation (completeness's job); "E9" is
    assert rep[("matches", "name")] == (1, n, False)
    # id=5 has no parent
    assert rep[("fk", "id")] == (1, n, False)


def test_null_never_counts_for_predicates(spark):
    df = spark.createDataFrame([(None,), (1.0,)], "x double")
    rep = _report(dq_audit(df, Check(in_range={"x": (0.0, 2.0)})))
    assert rep[("in_range", "x")] == (0, 2, True)


def test_validation_errors(spark, frame):
    with pytest.raises(ValueError, match="no constraints"):
        dq_audit(frame, Check())
    with pytest.raises(ValueError, match="at least one bound"):
        dq_audit(frame, Check(in_range={"amount": (None, None)}))
    with pytest.raises(ValueError, match="is empty"):
        dq_audit(frame, Check(accepted_values={"country": []}))


def test_empty_table_reports_zero_not_null(spark):
    """Row-predicate sums over zero rows are NULL in SQL; the report
    must coalesce them to violations=0 / passed=true (checked=0)."""
    df = spark.createDataFrame([], "id long, name string, amount double")
    rep = _report(
        dq_audit(
            df,
            Check(
                completeness=["name"],
                in_range={"amount": (0.0, None)},
                matches={"name": "^[a-z]+$"},
                uniqueness=["id"],
            ),
        )
    )
    assert rep[("completeness", "name")] == (0, 0, True)
    assert rep[("in_range", "amount")] == (0, 0, True)
    assert rep[("matches", "name")] == (0, 0, True)
    assert rep[("uniqueness", "id")] == (0, 0, True)
