"""Negative controls for the correctness gate itself.

Every parity test in this suite trusts ``oracle_check.compare`` to ring
when Spark and DuckDB disagree.  Until round 13 that trust was untested:
a regression in the compare (a broken row sort, a normalization that
started coercing a real difference away, a dropped column check) would
turn the whole suite quietly green.  These tests inject known mismatches
through tiny pandas shims — no Spark, no DuckDB connection — and assert
the alarm rings, plus pin the deliberate equivalences (row/column order,
column-name case, None-vs-NaN, integral float vs int) so a future
"fix" cannot silently tighten them either.
"""

from __future__ import annotations

import decimal
import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.oracle_check import _neg_zero_count, _signed_zero_rows, compare, normalize_frame


class _Spark:
    """Shim for the only method compare calls on a Spark DataFrame."""

    def __init__(self, pdf: pd.DataFrame):
        self._pdf = pdf

    def toPandas(self) -> pd.DataFrame:
        return self._pdf.copy()


class _Duck:
    """Shim for the only method compare calls on a DuckDB relation."""

    def __init__(self, pdf: pd.DataFrame):
        self._pdf = pdf

    def fetchdf(self) -> pd.DataFrame:
        return self._pdf.copy()


def _frame(**cols) -> pd.DataFrame:
    return pd.DataFrame(dict(cols))


BASE = _frame(
    k=["a", "b", "c"],
    n=[1, 2, 3],
    x=[0.5, 1.25, -2.75],
)


def test_identical_frames_pass():
    ok, msg = compare(_Spark(BASE), _Duck(BASE))
    assert ok, msg


def test_row_order_and_column_order_are_normalized():
    shuffled = BASE.iloc[[2, 0, 1]][["x", "k", "n"]]
    ok, msg = compare(_Spark(BASE), _Duck(shuffled))
    assert ok, msg


def test_column_name_case_is_insensitive():
    upper = BASE.rename(columns={"k": "K", "x": "X"})
    ok, msg = compare(_Spark(upper), _Duck(BASE))
    assert ok, msg


def test_none_and_nan_are_equivalent_and_integral_float_matches_int():
    a = _frame(k=["a", "b"], v=[float("nan"), 2.0])
    b = _frame(k=["a", "b"], v=[None, 2])
    ok, msg = compare(_Spark(a), _Duck(b))
    assert ok, msg


def test_one_ulp_float_drift_rings():
    """The exact (rel_tol=0) contract: the smallest representable
    difference must fail — a tolerance regression here is exactly the
    masked-divergence failure mode the round-10 census retired."""
    drift = BASE.copy()
    drift.loc[1, "x"] = math.nextafter(1.25, 2.0)
    ok, msg = compare(_Spark(BASE), _Duck(drift))
    assert not ok
    assert "value mismatch" in msg and "'x'" in msg


def test_row_count_mismatch_rings():
    ok, msg = compare(_Spark(BASE), _Duck(BASE.iloc[:2]))
    assert not ok
    assert "row count mismatch" in msg


def test_schema_mismatch_rings():
    renamed = BASE.rename(columns={"x": "y"})
    ok, msg = compare(_Spark(BASE), _Duck(renamed))
    assert not ok
    assert "schema mismatch" in msg


def test_decimal_vs_float_representation_rings():
    """The round-2 hypertable failure mode: numerically identical cells
    whose materialized classes differ (Decimal vs float64) hash-differ at
    the driver, so the local gate must flag them even though a
    cell-by-cell value compare would pass."""
    dec = _frame(k=["a"], v=[decimal.Decimal("1.5")])
    flt = _frame(k=["a"], v=[1.5])
    ok, msg = compare(_Spark(dec), _Duck(flt))
    assert not ok
    assert "representation mismatch" in msg


def test_declared_exact_col_absent_rings():
    ok, msg = compare(_Spark(BASE), _Duck(BASE), exact_cols=("ghost",))
    assert not ok
    assert "exact_cols" in msg


def test_none_vs_value_rings():
    a = _frame(k=["a", "b"], v=[1.0, None])
    b = _frame(k=["a", "b"], v=[1.0, 2.0])
    ok, msg = compare(_Spark(a), _Duck(b))
    assert not ok


def test_float_vs_numeric_string_rings():
    """A float against a numeric-LOOKING string (1.5 vs '1.5') is a
    type-class mismatch the driver's value hash would reject; coercing
    both through float() silently equated them (ADVICE r13 — the r13 fix
    only caught strings float() REJECTS, and the perturbation property
    deliberately uses non-numeric strings so it cannot see this)."""
    flt = _frame(k=["a"], v=pd.Series([1.5], dtype=object))
    for textual in ("1.5", b"1.5"):  # float() parses BOTH
        txt = _frame(k=["a"], v=pd.Series([textual], dtype=object))
        ok, msg = compare(_Spark(flt), _Duck(txt))
        assert not ok, f"float 1.5 vs {textual!r} must ring"
        assert "value mismatch" in msg


def test_bool_vs_int_rings():
    """Python equates True == 1 and float(True) == 1.0, but the driver's
    value hash sees 'True' vs '1' — a boolean column on one engine
    against a numeric column on the other must ring locally too
    (round-14 self-review)."""
    for num in (1, 1.0):
        boo = _frame(k=["a"], v=pd.Series([True], dtype=object))
        ints = _frame(k=["a"], v=pd.Series([num], dtype=object))
        ok, msg = compare(_Spark(boo), _Duck(ints))
        assert not ok, f"bool True vs {num!r} must ring"
        assert "value mismatch" in msg


def test_duplicate_columns_after_case_folding_ring_cleanly():
    """Two result columns differing only in case collapse into one label
    after the lowercase normalization; the reindex below would then
    duplicate columns and per-column access would return a DataFrame
    instead of a Series (ADVICE r13).  Must be a clean reported error,
    not a crash or a silent pass."""
    dup = pd.DataFrame([[1, 2]], columns=["V", "v"])
    ok, msg = compare(_Spark(dup), _Duck(dup))
    assert not ok
    assert "duplicate column names after case-folding" in msg


def test_scaled_decimal_vs_int_rings():
    """Decimal('3.00') == 3 in Python, so the cell compare alone would
    equate a scale-bearing DECIMAL column with an int column — but a
    representation-sensitive value hash sees '3.00' vs '3' (the round-2
    decimal/float failure family; round-15 census hardening)."""
    import decimal

    dec = _frame(k=["a"], v=pd.Series([decimal.Decimal("3.00")], dtype=object))
    ints = _frame(k=["a"], v=pd.Series([3], dtype=object))
    ok, msg = compare(_Spark(dec), _Duck(ints))
    assert not ok
    assert "representation mismatch" in msg
    # symmetric: decimal on the duckdb side must ring too
    ok, msg = compare(_Spark(ints), _Duck(dec))
    assert not ok
    assert "representation mismatch" in msg


def test_scale_zero_decimal_vs_int_passes():
    """A scale-0 Decimal renders identically to the int ('3' vs '3'), so
    the tripwire must NOT fire — only trailing-zero scales diverge."""
    import decimal

    dec = _frame(k=["a"], v=pd.Series([decimal.Decimal("3")], dtype=object))
    ints = _frame(k=["a"], v=pd.Series([3], dtype=object))
    ok, msg = compare(_Spark(dec), _Duck(ints))
    assert ok, msg


def test_nonfinite_decimal_reports_instead_of_crashing():
    """Decimal('NaN')/Decimal('Infinity') store a str exponent ('n'/'F'),
    so the pre-r16 scale probe raised TypeError on 'exponent < 0' instead
    of letting the compare report the mismatch (ADVICE r15).  Unreachable
    from engine-materialized DECIMAL columns (SQL DECIMAL has no NaN),
    but the probe scans arbitrary object cells — it must stay a clean
    reported mismatch, never a crash."""
    import decimal

    for special in (decimal.Decimal("NaN"), decimal.Decimal("Infinity")):
        dec = _frame(k=["a"], v=pd.Series([special], dtype=object))
        ints = _frame(k=["a"], v=pd.Series([3], dtype=object))
        ok, msg = compare(_Spark(dec), _Duck(ints))
        assert not ok, f"{special!r} vs 3 must ring, not crash"
        assert "mismatch" in msg


def test_positive_exponent_decimal_vs_int_rings():
    """Decimal('3E+2') renders '3E+2' while int 300 renders '300' — a
    render divergence the pre-r16 'exponent < 0' test missed (ADVICE
    r15).  Theoretical for engine materializations (always exponent <=
    0), closed because the probe scans arbitrary object cells."""
    import decimal

    dec = _frame(k=["a"], v=pd.Series([decimal.Decimal("3E+2")], dtype=object))
    ints = _frame(k=["a"], v=pd.Series([300], dtype=object))
    ok, msg = compare(_Spark(dec), _Duck(ints))
    assert not ok
    assert "representation mismatch" in msg


def test_decimal_vs_decimal_scale_divergence_rings():
    """Decimal('3.00') == Decimal('3.0') in Python, so the cell compare
    equates them, but a representation-sensitive value hash sees '3.00'
    vs '3.0' (ADVICE r15 — the nearest remaining shape in the round-2
    failure family; plausible when the engines infer different result
    scales for decimal division or AVG)."""
    import decimal

    a = _frame(k=["a"], v=pd.Series([decimal.Decimal("3.00")], dtype=object))
    b = _frame(k=["a"], v=pd.Series([decimal.Decimal("3.0")], dtype=object))
    ok, msg = compare(_Spark(a), _Duck(b))
    assert not ok
    assert "differing scales" in msg
    # symmetric
    ok, msg = compare(_Spark(b), _Duck(a))
    assert not ok
    assert "differing scales" in msg
    # same scale on both sides stays green — uniform DECIMAL(p,s)
    # materializations must not false-positive
    ok, msg = compare(_Spark(a), _Duck(a.copy()))
    assert ok, msg


def test_negative_zero_divergence_rings():
    """-0.0 == 0.0 in Python (and _normalize_cell folds the whole float
    -0.0 to int 0), so the cell compare alone equates a signed-zero
    divergence — but a representation-sensitive value hash sees '-0.0'
    vs '0.0' (round-16 self-review; same family as the round-2
    decimal/float case).  Counts are compared per column: equal counts
    mean the sorted multisets render identically, and no materialization
    can conjure -0.0 from an int column."""
    neg = _frame(k=["a"], v=pd.Series([-0.0], dtype=float))
    pos = _frame(k=["a"], v=pd.Series([0.0], dtype=float))
    ok, msg = compare(_Spark(neg), _Duck(pos))
    assert not ok
    assert "negative-zero" in msg
    # symmetric
    ok, msg = compare(_Spark(pos), _Duck(neg))
    assert not ok
    assert "negative-zero" in msg
    # -0.0 against an INT zero diverges too ('-0.0' vs '0')
    intz = _frame(k=["a"], v=pd.Series([0], dtype=object))
    negobj = _frame(k=["a"], v=pd.Series([-0.0], dtype=object))
    ok, msg = compare(_Spark(negobj), _Duck(intz))
    assert not ok
    assert "negative-zero" in msg
    # matched signed zeros on both sides stay green (same expression on
    # both engines yields the same sign) — as does plain 0.0-vs-0.0
    ok, msg = compare(_Spark(neg), _Duck(neg.copy()))
    assert ok, msg
    ok, msg = compare(_Spark(pos), _Duck(pos.copy()))
    assert ok, msg
    # NaN cells must not perturb the count (signbit(NaN) is undefined)
    nan_a = _frame(k=["a", "b"], v=pd.Series([float("nan"), 0.0], dtype=float))
    nan_b = _frame(k=["a", "b"], v=pd.Series([float("nan"), 0.0], dtype=float))
    ok, msg = compare(_Spark(nan_a), _Duck(nan_b))
    assert ok, msg


def test_negative_zero_decimal_divergence_rings():
    """The Decimal sibling of the float signed-zero gap:
    Decimal('-0.00') == Decimal('0.00') is True (and both carry the same
    exponent, so the scale-set ring stays silent) yet they render
    '-0.00' vs '0.00' to a representation-sensitive value hash."""
    import decimal

    neg = _frame(k=["a"], v=pd.Series([decimal.Decimal("-0.00")], dtype=object))
    pos = _frame(k=["a"], v=pd.Series([decimal.Decimal("0.00")], dtype=object))
    ok, msg = compare(_Spark(neg), _Duck(pos))
    assert not ok
    assert "negative-zero" in msg
    # matched signs on both sides stay green
    ok, msg = compare(_Spark(neg), _Duck(neg.copy()))
    assert ok, msg
    # a NEGATIVE non-zero decimal is not a negative zero
    negval = _frame(k=["a"], v=pd.Series([decimal.Decimal("-1.00")], dtype=object))
    ok, msg = compare(_Spark(negval), _Duck(negval.copy()))
    assert ok, msg


def test_negative_zero_positional_divergence_rings():
    """ADVICE r16: the per-column negative-zero COUNT tripwire is blind
    to signs sitting on differently-keyed rows — spark (a,-0.0),(b,0.0)
    vs duckdb (a,0.0),(b,-0.0) has matching counts and every cell
    compares equal, yet the driver's sorted-render hash sees
    {'a,-0.0','b,0.0'} vs {'a,0.0','b,-0.0'} and diverges.  The
    _signed_zero_rows multiset backstop in compare() must ring."""
    sp = _frame(k=["a", "b"], v=pd.Series([-0.0, 0.0], dtype=float))
    du = _frame(k=["a", "b"], v=pd.Series([0.0, -0.0], dtype=float))
    ok, msg = compare(_Spark(sp), _Duck(du))
    assert not ok
    assert "differently-keyed rows" in msg
    # symmetric
    ok, msg = compare(_Spark(du), _Duck(sp))
    assert not ok
    assert "differently-keyed rows" in msg
    # the multi-zero-column shape where even per-column (row-key, sign)
    # multisets would agree: spark rows (-0.0, 0.0),(0.0, -0.0) vs duck
    # (0.0, 0.0),(-0.0, -0.0) — only the full augmented-row multiset
    # separates them
    sp2 = _frame(
        x=pd.Series([-0.0, 0.0], dtype=float), y=pd.Series([0.0, -0.0], dtype=float)
    )
    du2 = _frame(
        x=pd.Series([0.0, -0.0], dtype=float), y=pd.Series([0.0, -0.0], dtype=float)
    )
    ok, msg = compare(_Spark(sp2), _Duck(du2))
    assert not ok
    assert "differently-keyed rows" in msg
    # identically-distributed signs in a different INPUT order stay green
    # (ties sort as multisets, exactly like the driver's sorted renders)
    sp3 = _frame(k=["a", "a"], v=pd.Series([-0.0, 0.0], dtype=float))
    du3 = _frame(k=["a", "a"], v=pd.Series([0.0, -0.0], dtype=float))
    ok, msg = compare(_Spark(sp3), _Duck(du3))
    assert ok, msg


def test_pandas_null_singletons_equal_none():
    """pd.NA (nullable-dtype frames) and pd.NaT (null timestamps) are
    nulls: NA-vs-None used to report a false MISMATCH on a null-vs-null
    pair, and NaT — a datetime instance — normalized to the string
    'NaT' instead of null (round-17 self-review; unreachable from
    toPandas()/fetchdf() today, same reachability tier as the
    nullable-Float64 fix)."""
    sp = _frame(k=["a", "b"], v=pd.array([1, None], dtype="Int64"))
    du = _frame(k=["a", "b"], v=[1.0, float("nan")])
    ok, msg = compare(_Spark(sp), _Duck(du))
    assert ok, msg
    spt = _frame(k=["a"], v=pd.Series([pd.NaT], dtype="datetime64[ns]"))
    dut = _frame(k=["a"], v=pd.Series([None], dtype=object))
    ok, msg = compare(_Spark(spt), _Duck(dut))
    assert ok, msg
    # a null singleton against a real value still rings
    du_real = _frame(k=["a", "b"], v=[1.0, 2.0])
    ok, msg = compare(_Spark(sp), _Duck(du_real))
    assert not ok
    # and inside arrays
    sp_arr = _frame(k=["a"], v=pd.Series([[pd.NaT, 1]], dtype=object))
    du_arr = _frame(k=["a"], v=pd.Series([[None, 1]], dtype=object))
    ok, msg = compare(_Spark(sp_arr), _Duck(du_arr))
    assert ok, msg


def test_neg_zero_count_handles_nullable_float_dtype():
    """ADVICE r16: pandas NULLABLE Float64 satisfies is_float_dtype, but
    its bare to_numpy() yields an object array carrying pd.NA — signbit
    on that raised TypeError and would crash the compare instead of
    reporting.  The na_value=np.nan conversion keeps the fast path
    total: nulls never count (nan == 0.0 is False)."""
    s = pd.Series([-0.0, None, 0.0, -0.0], dtype="Float64")
    assert _neg_zero_count(s) == 2
    assert _neg_zero_count(pd.Series([None, None], dtype="Float64")) == 0
    # numpy-backed float64 path unchanged
    assert _neg_zero_count(pd.Series([-0.0, float("nan"), 0.0], dtype=float)) == 1


def test_array_cells_compare_instead_of_crashing():
    """Array-valued result cells (Spark ArrayType → ndarray per cell,
    DuckDB LIST → numpy MaskedArray per cell) used to CRASH the compare:
    _normalize_cell's .item() raised ValueError on size>1 and silently
    SCALARIZED size 1 (round-17 self-review, same crash-instead-of-
    report family as the nullable-Float64 and non-finite-Decimal
    fixes).  Arrays now normalize to tuples and compare exactly."""
    import numpy as np

    # ndarray vs plain list vs MaskedArray — all equal
    sp = _frame(k=["a"], v=pd.Series([np.array([1.0, 2.0])], dtype=object))
    du = _frame(k=["a"], v=pd.Series([[1.0, 2.0]], dtype=object))
    ok, msg = compare(_Spark(sp), _Duck(du))
    assert ok, msg
    masked = np.ma.MaskedArray([1.0, 2.0], mask=[False, False])
    du_m = _frame(k=["a"], v=pd.Series([masked], dtype=object))
    ok, msg = compare(_Spark(sp), _Duck(du_m))
    assert ok, msg
    # element value mismatch rings (reported, not crashed)
    du_bad = _frame(k=["a"], v=pd.Series([[1.0, 2.5]], dtype=object))
    ok, msg = compare(_Spark(sp), _Duck(du_bad))
    assert not ok
    assert "value mismatch" in msg
    # length mismatch rings
    du_short = _frame(k=["a"], v=pd.Series([[1.0]], dtype=object))
    ok, msg = compare(_Spark(sp), _Duck(du_short))
    assert not ok
    # a 1-element array is NOT its bare scalar ('[1.0]' vs '1.0')
    one = _frame(k=["a"], v=pd.Series([np.array([1.0])], dtype=object))
    scal = _frame(k=["a"], v=pd.Series([1.0], dtype=object))
    ok, msg = compare(_Spark(one), _Duck(scal))
    assert not ok
    # an array is not NULL
    nul = _frame(k=["a"], v=pd.Series([None], dtype=object))
    ok, msg = compare(_Spark(one), _Duck(nul))
    assert not ok
    # masked (NULL) elements equal None elements; NaN folds to null too
    sp_n = _frame(k=["a"], v=pd.Series([[1.0, None]], dtype=object))
    du_n = _frame(
        k=["a"],
        v=pd.Series([np.ma.MaskedArray([1.0, 9.0], mask=[False, True])], dtype=object),
    )
    ok, msg = compare(_Spark(sp_n), _Duck(du_n))
    assert ok, msg
    nan_n = _frame(k=["a"], v=pd.Series([[1.0, float("nan")]], dtype=object))
    ok, msg = compare(_Spark(sp_n), _Duck(nan_n))
    assert ok, msg
    # nested arrays recurse
    sp2 = _frame(k=["a"], v=pd.Series([[[1, 2], [3]]], dtype=object))
    du2 = _frame(k=["a"], v=pd.Series([[[1, 2], [3]]], dtype=object))
    ok, msg = compare(_Spark(sp2), _Duck(du2))
    assert ok, msg
    du2_bad = _frame(k=["a"], v=pd.Series([[[1, 2], [4]]], dtype=object))
    ok, msg = compare(_Spark(sp2), _Duck(du2_bad))
    assert not ok


def test_array_interiors_are_type_class_sensitive():
    """Array elements keep their engine types (no pandas null-coercion
    ever retypes them), so class divergences INSIDE arrays are genuine
    render divergences with no column-level hook — the element compare
    rings where the scalar path deliberately equates: [3.0] vs [3]
    ('[3.0]' vs '[3]'), [true] vs [1], Decimal interiors with differing
    scales, and Decimal-vs-float."""
    import decimal

    fl = _frame(k=["a"], v=pd.Series([[3.0]], dtype=object))
    it = _frame(k=["a"], v=pd.Series([[3]], dtype=object))
    ok, msg = compare(_Spark(fl), _Duck(it))
    assert not ok
    # matched classes stay green
    ok, msg = compare(_Spark(fl), _Duck(fl.copy()))
    assert ok, msg
    ok, msg = compare(_Spark(it), _Duck(it.copy()))
    assert ok, msg
    bl = _frame(k=["a"], v=pd.Series([[True]], dtype=object))
    one = _frame(k=["a"], v=pd.Series([[1]], dtype=object))
    ok, msg = compare(_Spark(bl), _Duck(one))
    assert not ok
    d300 = _frame(k=["a"], v=pd.Series([[decimal.Decimal("3.00")]], dtype=object))
    d30 = _frame(k=["a"], v=pd.Series([[decimal.Decimal("3.0")]], dtype=object))
    ok, msg = compare(_Spark(d300), _Duck(d30))
    assert not ok
    ok, msg = compare(_Spark(d300), _Duck(d300.copy()))
    assert ok, msg
    dvf = _frame(k=["a"], v=pd.Series([[decimal.Decimal("3.0")]], dtype=object))
    ok, msg = compare(_Spark(dvf), _Duck(fl))
    assert not ok


def test_negative_zero_inside_arrays_rings():
    """-0.0 INSIDE an array: the element compare passes (-0.0 == 0.0 by
    design, same as scalars) but _zero_sign/_neg_zeros_in recurse into
    array cells, so the positional backstop gate opens and the sign
    divergence rings — without the recursion it passed silently."""
    import numpy as np

    neg = _frame(k=["a"], v=pd.Series([np.array([-0.0, 1.0])], dtype=object))
    pos = _frame(k=["a"], v=pd.Series([[0.0, 1.0]], dtype=object))
    ok, msg = compare(_Spark(neg), _Duck(pos))
    assert not ok
    assert "negative-zero" in msg or "negative zeros" in msg
    # matched signs stay green
    ok, msg = compare(_Spark(neg), _Duck(neg.copy()))
    assert ok, msg
    # positional WITHIN the array: [-0.0, 0.0] vs [0.0, -0.0]
    ab = _frame(k=["a"], v=pd.Series([[-0.0, 0.0]], dtype=object))
    ba = _frame(k=["a"], v=pd.Series([[0.0, -0.0]], dtype=object))
    ok, msg = compare(_Spark(ab), _Duck(ba))
    assert not ok


def test_duplicate_columns_before_case_folding_say_so():
    """Labels that were ALREADY duplicated before lowercasing must not be
    blamed on case-folding — the message drops the 'after case-folding'
    qualifier for that cause (ADVICE r14)."""
    dup = pd.DataFrame([[1, 2]], columns=["v", "v"])
    ok, msg = compare(_Spark(dup), _Duck(dup))
    assert not ok
    assert "duplicate column names" in msg
    assert "after case-folding" not in msg


_CELL = st.one_of(
    st.integers(min_value=-5, max_value=5),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(alphabet="xyz", max_size=3),
)


@settings(max_examples=200, deadline=None)
@given(
    rows=st.lists(st.tuples(_CELL, _CELL), min_size=1, max_size=6),
    idx=st.data(),
)
def test_any_single_cell_perturbation_rings(rows, idx):
    """Property: perturbing exactly one cell of an otherwise identical
    result must always be detected, regardless of row order, duplicate
    rows, or mixed cell types — the sorted-row zip walk has no blind
    spot."""
    # dtype=object keeps raw Python cells, so perturbing one never
    # silently retypes a whole column.
    pdf = pd.DataFrame(rows, columns=["a", "b"], dtype=object)
    i = idx.draw(st.integers(min_value=0, max_value=len(rows) - 1))
    col = idx.draw(st.sampled_from(["a", "b"]))
    perturbed = pdf.copy()
    v = perturbed.at[i, col]
    if isinstance(v, str):
        perturbed.at[i, col] = v + "!"
    elif isinstance(v, float):
        # nextafter always yields a bit-different float; for integral
        # floats normalization maps both to exact (distinct) ints.  A
        # naive +1.0 is a NO-OP at 2**53 — hypothesis found exactly that.
        perturbed.at[i, col] = math.nextafter(v, math.inf)
    else:
        perturbed.at[i, col] = v + 1
    ok, _ = compare(_Spark(pdf), _Duck(pdf))
    assert ok
    ok, msg = compare(_Spark(pdf), _Duck(perturbed))
    assert not ok, f"perturbation at ({i},{col}) went undetected: {msg}"


@settings(max_examples=200, deadline=None)
@given(
    left=st.lists(st.tuples(_CELL, _CELL), min_size=0, max_size=5),
    right=st.lists(st.tuples(_CELL, _CELL), min_size=0, max_size=5),
)
def test_compare_is_exactly_normalized_multiset_equality(left, right):
    """Two-sided property: for arbitrary PAIRS of same-schema frames,
    compare passes iff the normalized row multisets are equal AND the
    signed-zero-augmented row multisets are equal — sound (no false
    alarm on a reordered-but-equal result) AND complete (any multiset
    difference rings, including row-association breaks that per-column
    hashing would miss).  The second conjunct entered with the round-16
    signed-zero rings: -0.0 normalizes to int 0, so plain multiset
    equality calls a signed-zero divergence 'equal' while compare (and
    the driver's render hash) correctly rejects it — the strategy DOES
    generate -0.0, so the old one-conjunct claim was latently flaky
    (round-17 self-review).  The cell strategy keeps str(cell)
    collision-free across types ('xyz' strings never look numeric), so
    sort ties only occur between genuinely equal cells."""
    lf = pd.DataFrame(left, columns=["a", "b"], dtype=object)
    rf = pd.DataFrame(right, columns=["a", "b"], dtype=object)
    expected = normalize_frame(lf) == normalize_frame(rf) and _signed_zero_rows(
        lf
    ) == _signed_zero_rows(rf)
    ok, msg = compare(_Spark(lf), _Duck(rf))
    assert ok == expected, f"compare={ok} multiset_equal={expected}: {msg}"


def test_normalize_frame_sorts_total_order_with_nones():
    """Rows containing None sort deterministically (None-last per cell via
    the (is None, str) key), so the zip walk compares like with like."""
    pdf = _frame(a=[None, "b", "a"], b=[1, None, 2])
    rows = normalize_frame(pdf)
    assert rows == sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))
