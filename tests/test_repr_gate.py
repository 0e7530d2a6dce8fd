"""The representation-faithful compare gate (VERDICT r13 "What's wrong"
#4): the driver hashes canonicalized value strings, so the local mirror
must fail on representation splits that are invisible to numeric
equality — Decimal-typed columns, signed-zero splits, and dtype
mismatches. These unit tests plant each split class and assert the
hardened ``tools.check_oracle.compare`` flags it HARD (and that the one
benign class — integer-width-only dtype diffs — stays a soft note).

Round-13 forensics these encode:
- ``graph_modularity``: 82/267 rows where DuckDB emitted ``-0.0`` and
  Spark ``+0.0`` after ``ROUND(x, 6)`` — numerically equal, hash-red.
- ``agg_bh_fdr``: Spark returned ``Decimal('0.010000')`` where DuckDB
  returned double ``0.01`` — bit-identical as floats, hash-red.
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np
import pandas as pd

from tools.check_oracle import _canon, compare


def _hard(problems):
    return [p for p in problems if ": dtype spark=" not in p]


def test_identical_frames_pass():
    a = pd.DataFrame({"k": [1, 2], "v": [0.5, 1.25]})
    assert _hard(compare(a, a.copy())) == []


def test_decimal_column_fails_even_when_it_prints_alike():
    # Decimal('0.5') stringifies '0.5' — formatting luck; must still fail
    spark = pd.DataFrame({"v": [Decimal("0.5")]})
    duck = pd.DataFrame({"v": [0.5]})
    hard = _hard(compare(spark, duck))
    assert hard and "DECIMAL" in hard[0]


def test_decimal_trailing_zero_fails():
    # the agg_bh_fdr shape: Decimal('0.010000') vs 0.01
    spark = pd.DataFrame({"v": [Decimal("0.010000")]})
    duck = pd.DataFrame({"v": [0.01]})
    assert any("DECIMAL" in p for p in _hard(compare(spark, duck)))


def test_signed_zero_split_fails():
    # the graph_modularity shape: -0.0 (libm round) vs +0.0 (HALF_UP)
    spark = pd.DataFrame({"v": [0.0, 1.5]})
    duck = pd.DataFrame({"v": [-0.0, 1.5]})
    hard = _hard(compare(spark, duck))
    assert hard and "signed-zero" in hard[0]


def test_signed_zero_both_negative_passes():
    a = pd.DataFrame({"v": [-0.0, 1.5]})
    assert _hard(compare(a, a.copy())) == []


def test_integer_width_diff_is_soft():
    spark = pd.DataFrame({"v": np.array([1, 2], dtype=np.int32)})
    duck = pd.DataFrame({"v": np.array([1, 2], dtype=np.int64)})
    problems = compare(spark, duck)
    assert _hard(problems) == []
    assert any(": dtype spark=" in p for p in problems)


def test_int_vs_float_dtype_fails():
    spark = pd.DataFrame({"v": np.array([1, 2], dtype=np.int64)})
    duck = pd.DataFrame({"v": np.array([1.0, 2.0])})
    assert any("DTYPE MISMATCH" in p for p in _hard(compare(spark, duck)))


def test_float_value_mismatch_still_fails():
    spark = pd.DataFrame({"v": [1.0]})
    duck = pd.DataFrame({"v": [1.0000001]})
    assert _hard(compare(spark, duck))


def test_nan_on_both_sides_passes():
    a = pd.DataFrame({"v": [float("nan"), 2.0]})
    assert _hard(compare(a, a.copy())) == []


def test_canon_distinguishes_the_split_classes():
    assert _canon(-0.0) != _canon(0.0)
    assert _canon(Decimal("0.010000")) != _canon(0.01)
    assert _canon(np.int32(5)) == _canon(np.int64(5)) == "5"
    assert _canon(float("nan")) == _canon(None) == "<null>"
    assert _canon(np.float64(0.5)) == _canon(0.5)


def test_all_null_column_dtype_is_exempt():
    # a null BOOLEAN materializes as object-None on Spark and
    # float64-NaN on DuckDB; the driver hashes both as null
    spark = pd.DataFrame({"k": [1], "v": np.array([None], dtype=object)})
    duck = pd.DataFrame({"k": [1], "v": [float("nan")]})
    assert _hard(compare(spark, duck)) == []


def test_partially_null_dtype_mismatch_still_fails():
    spark = pd.DataFrame({"v": np.array([None, True], dtype=object)})
    duck = pd.DataFrame({"v": [float("nan"), 1.0]})
    assert _hard(compare(spark, duck))


def test_multi_column_canon_splits_both_reported():
    # ADVICE r14 / VERDICT r14 #3: the canonical-string layer used to be
    # gated on the GLOBAL problems list, so the first failing column
    # suppressed canon checks for every later column. Plant canon-only
    # splits (signed zero — numerically equal, representation-red) in
    # TWO columns and require BOTH in the report.
    spark = pd.DataFrame({"a": [0.0], "b": [0.0]})
    duck = pd.DataFrame({"a": [-0.0], "b": [-0.0]})
    hard = _hard(compare(spark, duck))
    assert any("col a" in p for p in hard), hard
    assert any("col b" in p for p in hard), hard


def test_later_column_canon_split_reported_after_value_failure():
    # a VALUE failure in column a must not hide column b's canon split
    spark = pd.DataFrame({"a": [1.0], "b": [0.0]})
    duck = pd.DataFrame({"a": [2.0], "b": [-0.0]})
    hard = _hard(compare(spark, duck))
    assert any("col a" in p and "mismatch" in p for p in hard), hard
    assert any("col b" in p and "zero" in p for p in hard), hard


def test_all_nan_vs_value_mismatch_reports_without_warning():
    # ADVICE r14: when every float mismatch is NaN-vs-value, the old
    # np.nanmax over the all-NaN diff slice warned and printed nan;
    # the report must instead say the mismatch class and still fail.
    import warnings

    spark = pd.DataFrame({"v": [float("nan"), float("nan")]})
    duck = pd.DataFrame({"v": [1.0, 3.0]})
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning -> test failure
        hard = _hard(compare(spark, duck))
    assert any("NaN-vs-value" in p for p in hard), hard
