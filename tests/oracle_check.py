"""Local replica of the driver's DuckDB-oracle comparison.

For each registered query with an oracle: run the Spark builder and the
DuckDB SQL on the same parquet tables, sort columns by name and rows by all
values, and compare cell-by-cell — EXACT on every column including floats
(rel_tol=0 since the round-10 census; see compare()'s docstring). This is
intentionally *stricter* than a value-hash: it localizes the first
differing cell for debugging, and the representation tripwires
(check_repr_parity + the signed-zero backstop) ring on render divergences
the cell compare would equate.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
from typing import Any

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize_cell(v: Any) -> Any:
    # pd.NA (nullable-dtype frames) and pd.NaT (null timestamps) are
    # nulls and must equal None/NaN — without the fold, NA-vs-None
    # reported a false MISMATCH on a null-vs-null pair, and NaT (a
    # datetime instance) rendered as the string 'NaT' (round-17
    # self-review; unreachable from toPandas()/fetchdf() today, the
    # same reachability tier as the nullable-Float64 fix).
    if v is None or v is pd.NaT or v is pd.NA:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, np.ndarray):
        # Array-valued result cells: DuckDB LIST reaches fetchdf as a
        # numpy (Masked)ndarray per cell, Spark ArrayType reaches
        # toPandas as an ndarray per cell.  The .item() path below would
        # CRASH on size>1 ('can only convert an array of size 1') and
        # silently SCALARIZE size 1 (a 1-element array would equal a
        # bare scalar) — round-17 self-review, same crash-instead-of-
        # report family as the nullable-Float64 and non-finite-Decimal
        # fixes.  Normalize to a tuple of per-ELEMENT normalized values:
        # order is part of an array's value, and MaskedArray.tolist()
        # yields None for masked elements, matching NULL.
        return tuple(_normalize_array_element(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_normalize_array_element(x) for x in v)
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):
        v = v.item()
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and v.is_integer():
        return int(v)
    return v


def _normalize_array_element(x: Any) -> Any:
    """Per-element normalization for ARRAY interiors — like
    _normalize_cell but WITHOUT the whole-float → int fold.

    The scalar fold exists to absorb a pandas artifact: a SCALAR int
    column acquires float dtype when any row is null, so 3.0-vs-3 across
    engines is usually toPandas coercion, not a render divergence.
    Array elements keep their engine types inside the object cell — no
    coercion ever retypes them — so a float-vs-int divergence inside an
    array ('[3.0]' vs '[3]') is genuine and must stay visible to the
    class-sensitive element compare.  NaN → None (both engines render
    array nulls as absent values), timestamps/dates → isoformat, numpy
    scalars unwrap, nested arrays recurse."""
    if x is None or x is pd.NaT or x is pd.NA:
        return None
    if isinstance(x, float) and math.isnan(x):
        return None
    if isinstance(x, (pd.Timestamp, dt.datetime)):
        ts = pd.Timestamp(x)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(x, dt.date):
        return x.isoformat()
    if isinstance(x, np.ndarray):
        return tuple(_normalize_array_element(e) for e in x.tolist())
    if isinstance(x, (list, tuple)):
        return tuple(_normalize_array_element(e) for e in x)
    if hasattr(x, "item") and not isinstance(x, (str, bytes)):
        x = x.item()
    return x


def normalize_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = df[cols].copy()
    rows = [tuple(_normalize_cell(v) for v in row) for row in out.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def _array_elements_equal(a: Any, b: Any) -> bool:
    """Exact, type-CLASS-sensitive equality for array interiors.

    The scalar cell path deliberately equates 3.0 with 3 and leaves
    representation policing to the column-level tripwires
    (check_repr_parity), because pandas null-coercion retypes whole
    SCALAR columns.  Array elements suffer no such artifact, and no
    column hook exists for them — so any class divergence (float vs
    int, Decimal vs anything, bool vs int, str vs bytes) is a genuine
    render divergence the driver hash rejects, and rings HERE at the
    cell.  Decimal pairs additionally require equal exponents
    (render identity: '3.00' vs '3.0' hash-differs though == is True).
    Signed zeros stay the backstop's job: -0.0 == 0.0 passes here and
    _zero_sign's recursion rings positionally, same as scalars."""
    if a is None and b is None:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(
            _array_elements_equal(x, y) for x, y in zip(a, b)
        )
    for cls in (tuple, bool, int, float, str, bytes, decimal.Decimal):
        if isinstance(a, cls) != isinstance(b, cls):
            return False
    if isinstance(a, decimal.Decimal) and isinstance(b, decimal.Decimal):
        if not (a.is_finite() and b.is_finite()):
            return str(a) == str(b)
        return a == b and a.as_tuple().exponent == b.as_tuple().exponent
    return a == b


def _cells_equal(a: Any, b: Any, exact: bool = False) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, tuple) or isinstance(b, tuple):
        # Normalized array cells (tuples after _normalize_cell).  Bare
        # ``a == b`` would compare tuples elementwise with Python ==,
        # equating inside arrays every shape the harness polices at the
        # scalar level (True == 1, 3.0 == 3, Decimal('3.00') == 3).  A
        # tuple against a non-tuple (1-element array vs bare scalar,
        # array vs NULL) is a shape mismatch, reported not crashed.
        if not (isinstance(a, tuple) and isinstance(b, tuple)):
            return False
        return _array_elements_equal(a, b)
    if isinstance(a, bool) != isinstance(b, bool):
        # Python equates True == 1 (and float(True) == 1.0), but the
        # driver's value hash sees 'True' vs '1' — a boolean column on one
        # engine against an int column on the other must ring here too.
        # _normalize_cell never produces bools from numerics, so this only
        # fires on genuine type divergence (round-14 self-review).
        return False
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        if isinstance(a, (str, bytes)) != isinstance(b, (str, bytes)):
            # A float against a numeric-LOOKING string (1.5 vs '1.5') is a
            # type-class mismatch the driver's value hash would reject;
            # coercing both through float() silently equated them (ADVICE
            # r13).  The non-numeric-string case below only caught strings
            # float() rejects.  bytes included: float(b'1.5') also parses.
            return False
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            # A float against a non-numeric cell (a mixed-type object
            # column whose rows sorted differently after a real mismatch)
            # is a MISMATCH, not a crash — float('x') used to raise here
            # and abort the compare instead of localizing the difference
            # (found by the round-13 perturbation property).
            return False
        if exact:
            # Bit-identity contract (EngineQuery.exact_float_cols): the
            # query's docstring claims both engines execute the identical
            # IEEE expression sequence, so the driver's value hash — and
            # therefore this compare — tolerates zero ulps of drift.
            return af == bf
        return math.isclose(af, bf, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def _repr_class(series: pd.Series) -> str:
    """Coarse materialized-representation class of a result column.

    The driver's value hash sees raw cell objects, so a column that
    materializes as Python Decimal on one engine and float64 on the other
    hash-differs even when every cell is numerically identical (the round-2
    hypertable_rollup failure mode). Detect that divergence here, where the
    cell-by-cell compare would otherwise paper over it.
    """
    if pd.api.types.is_float_dtype(series):
        return "float"
    if series.dtype == object:
        for v in series:
            if isinstance(v, decimal.Decimal):
                return "decimal"
            if isinstance(v, float):
                return "float"
            if v is not None:
                break
    return "other"


def _has_scaled_decimal(series: pd.Series) -> bool:
    """True if any cell is a finite Decimal whose render diverges from the
    int render of the same value: negative exponent (trailing zeros,
    '3.00' vs '3') or positive exponent (engineering notation, '3E+2' vs
    '300').  Only exponent-0 Decimals render exactly like ints.  The
    is_finite() guard matters: Decimal('NaN')/Decimal('Infinity') store a
    str exponent ('n'/'F'), so the comparison would raise instead of
    reporting (ADVICE r15); a non-finite Decimal can never cell-equal a
    non-float 'other' value, so the ordinary value compare reports it."""
    if series.dtype != object:
        return False
    return any(
        isinstance(v, decimal.Decimal)
        and v.is_finite()
        and v.as_tuple().exponent != 0
        for v in series
    )


def _decimal_exponents(series: pd.Series) -> set:
    """Distinct exponents among finite Decimal cells (empty if none)."""
    if series.dtype != object:
        return set()
    return {
        v.as_tuple().exponent
        for v in series
        if isinstance(v, decimal.Decimal) and v.is_finite()
    }


def _neg_zero_count(series: pd.Series) -> int:
    """Count of negative-zero cells: float -0.0 and Decimal('-0') alike
    (np.float64 subclasses float; Decimal('-0.00') == Decimal('0.00')
    is True yet renders '-0.00').

    Vectorized for float dtypes so the sf0.1 parity tier's wall doesn't
    grow; the object-dtype fallback loops (mixed columns are small)."""
    if pd.api.types.is_float_dtype(series):
        # is_float_dtype is also True for pandas NULLABLE Float64, whose
        # bare to_numpy() yields an object array carrying pd.NA — signbit
        # would then raise TypeError and crash the compare instead of
        # reporting (ADVICE r16).  Converting with na_value=np.nan keeps
        # the fast path total: signbit(nan) may be anything, but nan ==
        # 0.0 is False, so the mask excludes nulls either way.
        arr = series.to_numpy(dtype=float, na_value=np.nan)
        return int((np.signbit(arr) & (arr == 0.0)).sum())
    if series.dtype != object:
        return 0
    return sum(_neg_zeros_in(v) for v in series)


def _neg_zeros_in(v: Any) -> int:
    """Negative zeros in one cell — recursing into array cells (ndarray/
    list/tuple) so a -0.0 INSIDE an array opens the positional backstop
    gate in compare() just like a scalar one (round-17 self-review;
    without the recursion the gate stayed closed and array-interior
    signed-zero divergence passed silently)."""
    if isinstance(v, float):
        return 1 if v == 0.0 and math.copysign(1.0, v) < 0.0 else 0
    if isinstance(v, decimal.Decimal):
        return 1 if v.is_finite() and v == 0 and v.is_signed() else 0
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return sum(_neg_zeros_in(x) for x in v)
    return 0


def _zero_sign(v: Any) -> str | tuple:
    """'-' for a negative zero (float -0.0 or a signed Decimal zero), ''
    for everything else — including positive zeros, so the deliberate
    0.0-vs-int-0 equivalence is untouched.  Array cells yield the tuple
    of their elements' signs.  np.float64 subclasses float; NaN fails
    ``v == 0.0`` so signbit(NaN) never matters."""
    if isinstance(v, float):
        return "-" if v == 0.0 and math.copysign(1.0, v) < 0.0 else ""
    if isinstance(v, decimal.Decimal):
        return "-" if v.is_finite() and v == 0 and v.is_signed() else ""
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        # Array cells carry a POSITIONAL sign pattern (order is part of
        # the array's render): [-0.0, 0.0] vs [0.0, -0.0] hash-differs.
        return tuple(_zero_sign(x) for x in v)
    return ""


def _signed_zero_rows(df: pd.DataFrame) -> list[tuple]:
    """Rows as sorted multisets of (normalized sort key, zero sign) cell
    pairs — the positional companion to the per-column negative-zero
    COUNT tripwire in check_repr_parity.

    Equal counts alone are not positional (ADVICE r16): with spark rows
    (a, -0.0), (b, 0.0) and duckdb rows (a, 0.0), (b, -0.0) the
    per-column counts match and every cell compares equal (-0.0 == 0.0),
    yet the driver's order-insensitive value hash sees the multiset
    {'a,-0.0', 'b,0.0'} vs {'a,0.0', 'b,-0.0'} and diverges.  Comparing
    the multiset of rows AUGMENTED with each cell's zero sign is exact
    for that shape: two sides agree iff the rows can be matched 1:1 with
    identical normalized renders AND an identical signed-zero pattern —
    which also covers the multi-zero-column shape where per-column
    multisets of (row-key, sign) would still pass.  Ties sort as
    multisets, so sides that distribute the same signs across
    identically-keyed rows in a different input order stay equal, exactly
    as the driver's sorted-render hash would."""
    cols = sorted(df.columns)
    rows = [
        tuple(
            ((x is None, str(x)), _zero_sign(v))
            for v, x in ((v, _normalize_cell(v)) for v in row)
        )
        for row in df[cols].itertuples(index=False)
    ]
    return sorted(rows)


def check_repr_parity(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str | None:
    """Return an error string if any shared column materializes as Decimal
    on one side and float on the other (driver hash-red even when values
    match). Fix pattern: CAST the final projection to DOUBLE on BOTH sides,
    keeping DECIMAL internal where order-independence matters.

    Also rings on Decimal-with-scale vs int: Decimal('3.00') == 3 in
    Python, so the cell compare would equate them, but a
    representation-sensitive value hash sees '3.00' vs '3' — the same
    failure family as the round-2 decimal/float case.  A scale-0 Decimal
    against an int is allowed (both render '3'); a positive-exponent
    Decimal ('3E+2' vs '300') rings too.  Decimal-vs-Decimal with
    differing materialized scales ('3.00' vs '3.0') also rings (ADVICE
    r15), as does a per-column negative-zero count divergence ('-0.0' vs
    '0.0', round-16 self-review).  The round-15/16 censuses measured
    zero occurrences of any of these shapes across all 161 oracled
    queries at all three SF tiers, so these are tripwires for future
    queries, not live fixes."""
    for col in spark_pdf.columns:
        if col not in duck_pdf.columns:
            continue
        s_cls, d_cls = _repr_class(spark_pdf[col]), _repr_class(duck_pdf[col])
        if {s_cls, d_cls} == {"decimal", "float"}:
            return (
                f"representation mismatch in col '{col}': spark={s_cls} "
                f"duckdb={d_cls} — driver value-hash will fail even if cells "
                f"are equal; CAST the final projection to DOUBLE on both sides"
            )
        if {s_cls, d_cls} == {"decimal", "other"}:
            dec_side = spark_pdf[col] if s_cls == "decimal" else duck_pdf[col]
            if _has_scaled_decimal(dec_side):
                return (
                    f"representation mismatch in col '{col}': spark={s_cls} "
                    f"duckdb={d_cls} — a scale-bearing DECIMAL renders with "
                    f"trailing zeros ('3.00' vs '3'), so the driver value-hash "
                    f"will fail even if cells are numerically equal; CAST both "
                    f"sides to the same type"
                )
        if s_cls == d_cls == "decimal":
            # Decimal on BOTH sides but with differing materialized scales:
            # Decimal('3.00') == Decimal('3.0') in Python, so the cell
            # compare equates them, yet a representation-sensitive value
            # hash sees '3.00' vs '3.0' — the nearest remaining shape in
            # the round-2 failure family (ADVICE r15).  Plausible whenever
            # the engines infer different result scales (decimal division,
            # AVG over DECIMAL).  Engine-materialized DECIMAL(p,s) columns
            # carry one uniform exponent per side, so comparing the
            # exponent SETS is exact, not heuristic.
            s_exp = _decimal_exponents(spark_pdf[col])
            d_exp = _decimal_exponents(duck_pdf[col])
            if s_exp and d_exp and s_exp != d_exp:
                return (
                    f"representation mismatch in col '{col}': both sides "
                    f"materialize Decimal but with differing scales "
                    f"(spark exponents {sorted(s_exp)} vs duckdb "
                    f"{sorted(d_exp)}) — '3.00' vs '3.0' hash-differs even "
                    f"though the cells compare equal; align the result "
                    f"scale (CAST/quantize) on both sides"
                )
        # Signed zero: -0.0 == 0.0 (and _normalize_cell folds the whole
        # float -0.0 to int 0), so the cell compare equates a signed-zero
        # divergence — but a representation-sensitive value hash sees
        # '-0.0' vs '0.0' (round-16 self-review, same round-2 family).
        # A count divergence is always render-divergent (no
        # materialization can conjure -0.0 from an int column), so this
        # ring never false-alarms — but equal counts are NOT sufficient
        # for multi-column results (ADVICE r16): signs can sit on
        # differently-keyed rows on each side with the counts matching.
        # That positional shape is caught by the _signed_zero_rows
        # multiset backstop in compare(); this per-column count stays as
        # the fast, column-localizing first alarm.  Deliberately NOT
        # a cell-level ring: the whole-float-vs-int equivalence (3.0 vs
        # 3, pandas null-coercion symmetry) stays allowed.
        s_nz = _neg_zero_count(spark_pdf[col])
        d_nz = _neg_zero_count(duck_pdf[col])
        if s_nz != d_nz:
            return (
                f"representation mismatch in col '{col}': negative-zero "
                f"count differs (spark={s_nz} duckdb={d_nz}) — -0.0 "
                f"renders '-0.0' vs '0.0'/'0', so the driver value-hash "
                f"will fail even though -0.0 == 0.0; normalize the sign "
                f"(e.g. + 0.0, or abs() where the value is provably zero) "
                f"on both sides"
            )
    return None


def compare(
    spark_df, duck_rel, exact_cols: tuple[str, ...] = ()
) -> tuple[bool, str]:
    """Cell-by-cell Spark-vs-DuckDB compare, EXACT (rel_tol=0) on every
    float column — the faithful local replica of the driver's value
    hash.

    Until round 10 only declared ``exact_cols`` were exact and the rest
    got a 1e-9 tolerance; the round-10 census (SPARK_GRAFT_EXACT_SWEEPS)
    then measured every float column of all 161 oracled queries
    bit-identical on every corpus the suite runs — standard at
    sf0.001/0.01/0.1 AND the null/extreme/unicode/tz/layout sweeps —
    once the single genuine divergence was fixed (multimodal_embed's
    ``** 0.5``).  The tolerance was therefore hiding nothing and could
    only ever mask a regression the driver would reject.  New
    float-emitting oracles must keep the bit-identity bar: DECIMAL
    partials, identical IEEE op order, correctly-rounded sqrt (never
    pow), round/quantize on BOTH sides where order-independence needs
    it.

    ``exact_cols`` (the query's ``exact_float_cols``) is now subsumed by
    the default but still validated — a declared name absent from the
    result fails loudly, keeping the docstring-claim declarations
    honest."""
    spark_pdf = spark_df.toPandas()
    duck_pdf = duck_rel.fetchdf()
    # Lowercase BEFORE sorting: DuckDB lowercases unquoted aliases while
    # Spark preserves the written case, and ASCII sorts uppercase before
    # lowercase — sorting the original-case names made column ALIGNMENT
    # depend on the case mix (a one-column case difference passed while a
    # three-column one false-alarmed as a schema mismatch).  Lowercased
    # sort is computed identically on both sides, so this cannot mask a
    # value difference — it only makes the alignment deterministic.
    orig_cols = {"spark": list(spark_pdf.columns), "duckdb": list(duck_pdf.columns)}
    spark_pdf.columns = [c.lower() for c in spark_pdf.columns]
    duck_pdf.columns = [c.lower() for c in duck_pdf.columns]
    # Fail fast if the labels are not unique: the df[cols] reindex below
    # would then duplicate columns and the per-column access would return a
    # DataFrame instead of a Series, misbehaving instead of reporting a
    # clean schema error (ADVICE r13).  Say whether the duplicates existed
    # before lowercasing or were introduced by it (ADVICE r14).
    for side, pdf in (("spark", spark_pdf), ("duckdb", duck_pdf)):
        if len(set(pdf.columns)) != len(pdf.columns):
            dupes = sorted({c for c in pdf.columns if list(pdf.columns).count(c) > 1})
            orig = orig_cols[side]
            cause = (
                "duplicate column names"
                if len(set(orig)) != len(orig)
                else "duplicate column names after case-folding"
            )
            return False, f"{cause} ({side}): {dupes}"
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return False, f"schema mismatch: spark={s_cols} duckdb={d_cols}"
    repr_err = check_repr_parity(spark_pdf, duck_pdf)
    if repr_err is not None:
        return False, repr_err
    if len(spark_pdf) != len(duck_pdf):
        return False, f"row count mismatch: spark={len(spark_pdf)} duckdb={len(duck_pdf)}"
    s_rows = normalize_frame(spark_pdf)
    d_rows = normalize_frame(duck_pdf)
    cols_sorted = sorted(spark_pdf.columns)
    declared = {c.lower() for c in exact_cols}
    unknown = declared - set(cols_sorted)
    if unknown:
        return False, f"exact_cols name absent columns: {sorted(unknown)}"
    # Exact on EVERY column (floats are the ones the flag affects in
    # _cells_equal); the declared set above is a naming contract only.
    exact = set(cols_sorted)
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for j, (sv, dv) in enumerate(zip(sr, dr)):
            if not _cells_equal(sv, dv, exact=cols_sorted[j] in exact):
                col = cols_sorted[j]
                return False, (
                    f"value mismatch at sorted-row {i} col '{col}': "
                    f"spark={sv!r} duckdb={dv!r} (spark row: {sr}, duck row: {dr})"
                )
    # Positional signed-zero backstop (ADVICE r16): the per-column
    # negative-zero COUNT tripwire in check_repr_parity already ran and
    # agreed, but equal counts can still hide signs sitting on
    # differently-keyed rows in a multi-column result (every cell
    # compares equal because -0.0 == 0.0, yet the sorted rendered
    # multisets the driver hashes diverge).  Gated on any negative zero
    # being present at all, so the 161-query census (zero occurrences)
    # pays one vectorized signbit pass and nothing more.
    if any(_neg_zero_count(spark_pdf[c]) > 0 for c in cols_sorted):
        s_aug = _signed_zero_rows(spark_pdf)
        d_aug = _signed_zero_rows(duck_pdf)
        if s_aug != d_aug:
            diff_cols = sorted(
                {
                    cols_sorted[j]
                    for sr, dr in zip(s_aug, d_aug)
                    for j in range(len(cols_sorted))
                    if sr[j] != dr[j]
                }
            )
            return False, (
                f"representation mismatch: negative zeros sit on "
                f"differently-keyed rows (cols {diff_cols}) — per-column "
                f"counts match and every cell compares equal, but the "
                f"sorted rendered multisets the driver hashes diverge "
                f"('a,-0.0' vs 'a,0.0'); normalize the sign (e.g. + 0.0) "
                f"on both sides"
            )
    return True, f"ok ({len(s_rows)} rows)"
