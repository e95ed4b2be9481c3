"""Unit tests for the oracle comparator itself (scripts/check_oracle.py)
— the most load-bearing code in the repo's verification story. These pin
the detector behaviors that each shipped a driver hash-fail before they
existed: full-precision float comparison (round 3) and coarse
type-category mismatch detection for DuckDB HUGEINT sums (round 4)."""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from check_oracle import (  # noqa: E402
    _cells_close,
    canon,
    norm_cell,
    type_mismatches,
)


def test_type_mismatch_flags_hugeint_decimal_vs_bigint():
    """The exact round-4 bug class: DuckDB leaves sum(bigint) as
    decimal128(38,0) while Spark emits bigint — values stringify
    identically, but the driver's hash layer distinguishes them."""
    spark_dtypes = [("doc_id", "bigint"), ("total_n", "bigint")]
    oracle = pa.schema([("doc_id", pa.int64()), ("total_n", pa.decimal128(38, 0))])
    out = type_mismatches(spark_dtypes, oracle)
    assert out == ["total_n: spark=int oracle=decimal"]


def test_type_mismatch_accepts_matching_and_null_wildcard():
    spark_dtypes = [("a", "bigint"), ("b", "double"), ("c", "string")]
    oracle = pa.schema([("a", pa.int64()), ("b", pa.float64()), ("c", pa.null())])
    assert type_mismatches(spark_dtypes, oracle) == []


def test_norm_cell_full_precision_floats():
    """%.6g hid a one-cent divergence on 7-digit money in round 3;
    repr() must distinguish doubles that differ in the last place."""
    assert norm_cell(185899.54) != norm_cell(185899.55)
    assert norm_cell(float("nan")) == "nan"
    assert norm_cell(None) == "\0"
    # bools normalize to ints so engine bool-vs-int display can't differ
    assert norm_cell(True) == "1"


def test_canon_is_column_and_row_order_insensitive():
    rows_a = [(1, "x"), (2, "y")]
    rows_b = [("y", 2), ("x", 1)]
    assert canon(rows_a, ["n", "s"]) == canon(rows_b, ["s", "n"])


def test_cells_close_classifies_eps_only_agreement():
    # bit-identical: close; last-ulp apart: close (FRAGILE class);
    # a real cent apart on money-sized values: NOT close
    assert _cells_close("1.5", "1.5")
    assert _cells_close(repr(0.1 + 0.2), repr(0.3))
    assert not _cells_close("185899.54", "185899.55")
    # identical normalized cells match (both engines emitted NaN)...
    assert _cells_close("nan", "nan")
    # ...but NaN never passes an EPS comparison against anything else
    assert not _cells_close("nan", "0.0")
    assert not _cells_close("abc", "abd")
