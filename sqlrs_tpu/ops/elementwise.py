"""Vectorized elementwise kernels with validity-mask propagation.

The device half of the expression evaluator (reference evaluates expressions
with arrow compute kernels, src/executor/evaluator.rs:13 and
src/executor/array_compute.rs:70-90; v2 via function impls,
src/function/scalar/*). Everything here is (data, valid) -> (data, valid)
pure jnp — XLA fuses chains of these into single kernels.

NULL semantics:
- arithmetic/comparison: NULL if any input is NULL;
- AND/OR: Kleene three-valued logic (reference
  src/function/conjunction/default_conjunction.rs:59, and_kleene/or_kleene);
- VARCHAR ordering comparisons run on lexicographic-rank projections of the
  dictionary codes (sqlrs_tpu/data/strings.py), equality directly on codes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sqlrs_tpu.data import Column
from sqlrs_tpu.data.strings import GLOBAL_STRINGS, NULL_CODE
from sqlrs_tpu.errors import ExecutorError, TypeError_
from sqlrs_tpu.types import Interval, LogicalType, numpy_dtype_for

# ---- casts -----------------------------------------------------------------


def cast_column(col: Column, dst: LogicalType, safe: bool = False) -> Column:
    src = col.type
    if src == dst:
        return col
    if src == LogicalType.SQLNULL:
        dt = numpy_dtype_for(dst)
        return Column(dst, jnp.zeros(len(col), dtype=dt), jnp.zeros(len(col), dtype=jnp.bool_))
    if src.is_numeric() and dst.is_numeric():
        valid = col.valid
        if dst.is_integral():
            from sqlrs_tpu.types.types import INT_RANGES, can_implicit_cast

            if not can_implicit_cast(src, dst):
                # narrowing: arrow checked-cast semantics — error on overflow
                # (what makes `insert into t3(v1) values (1481)` on TINYINT
                # UNSIGNED a statement error). Bounds are clamped to the
                # source dtype's own range so the comparison constants are
                # representable (e.g. UBIGINT's 2^64-1 vs an int64 source).
                lo, hi = INT_RANGES[dst]
                if src.is_integral():
                    slo, shi = INT_RANGES[src]
                else:
                    slo, shi = -(2**63), 2**63 - 1
                checks = []
                if lo > slo:
                    checks.append(col.data < lo)
                if hi < shi:
                    checks.append(col.data > hi)
                if not checks:
                    return Column(dst, col.data.astype(numpy_dtype_for(dst)), valid)
                bad = checks[0]
                for c in checks[1:]:
                    bad = jnp.logical_or(bad, c)
                bad = jnp.logical_and(valid, bad)
                if safe:
                    valid = jnp.logical_and(valid, jnp.logical_not(bad))
                elif bool(jnp.any(bad)):
                    raise TypeError_(f"cast overflow: {src} value out of {dst} range")
        return Column(dst, col.data.astype(numpy_dtype_for(dst)), valid)
    if src == LogicalType.BOOLEAN and dst.is_numeric():
        return Column(dst, col.data.astype(numpy_dtype_for(dst)), col.valid)
    # string-involved casts run on host through the dictionary (cold path)
    from sqlrs_tpu.types import ScalarValue

    scalars = [col.scalar_at(i) for i in range(len(col))]
    out = []
    for sv in scalars:
        try:
            out.append(sv.cast_to(dst, safe=safe))
        except TypeError_:
            if safe:
                out.append(ScalarValue(dst, None))
            else:
                raise
    return Column.from_scalars(dst, out)


# ---- arithmetic --------------------------------------------------------------

_ARITH = {"+", "-", "*", "/", "%"}


def arithmetic(op: str, t: LogicalType, left: Column, right: Column) -> Column:
    """Both inputs already cast to the common type t; output type t."""
    valid = jnp.logical_and(left.valid, right.valid)
    l, r = left.data, right.data
    if op == "+":
        data = l + r
    elif op == "-":
        data = l - r
    elif op == "*":
        data = l * r
    elif op == "/":
        if t.is_integral():
            # SQL integer division truncates toward zero; x/0 -> NULL
            safe_r = jnp.where(r == 0, jnp.ones_like(r), r)
            q = jnp.abs(l) // jnp.abs(safe_r)
            sign = jnp.sign(l) * jnp.sign(safe_r)
            data = (q * sign).astype(l.dtype)
            valid = jnp.logical_and(valid, r != 0)
        else:
            data = l / r
    elif op == "%":
        safe_r = jnp.where(r == 0, jnp.ones_like(r), r)
        data = l - (jnp.abs(l) // jnp.abs(safe_r)) * jnp.sign(l) * jnp.abs(safe_r)
        data = data.astype(l.dtype)
        valid = jnp.logical_and(valid, r != 0)
    else:
        raise ExecutorError(f"unknown arithmetic op {op}")
    return Column(t, data.astype(numpy_dtype_for(t)), valid)


def negate(col: Column) -> Column:
    return Column(col.type, -col.data, col.valid)


# ---- comparisons -------------------------------------------------------------


def _orderable_view(col: Column):
    """Data array on which <,> are meaningful; VARCHAR goes through ranks."""
    if col.type == LogicalType.VARCHAR:
        ranks = jnp.asarray(GLOBAL_STRINGS.ranks())
        codes = jnp.clip(col.data, 0, max(len(ranks) - 1, 0))
        if len(ranks) == 0:
            return jnp.zeros_like(col.data, dtype=jnp.int64)
        return ranks[codes]
    return col.data


def compare(op: str, left: Column, right: Column) -> Column:
    """Inputs already cast to a common type; returns BOOLEAN column."""
    valid = jnp.logical_and(left.valid, right.valid)
    if op == "=":
        data = left.data == right.data
    elif op == "!=":
        data = left.data != right.data
    else:
        l, r = _orderable_view(left), _orderable_view(right)
        if op == "<":
            data = l < r
        elif op == "<=":
            data = l <= r
        elif op == ">":
            data = l > r
        elif op == ">=":
            data = l >= r
        else:
            raise ExecutorError(f"unknown comparison op {op}")
    return Column(LogicalType.BOOLEAN, data, valid)


# ---- Kleene logic ------------------------------------------------------------


def kleene_and(left: Column, right: Column) -> Column:
    l = jnp.logical_and(left.data, left.valid)  # treat NULL as "unknown"
    r = jnp.logical_and(right.data, right.valid)
    lf = jnp.logical_and(jnp.logical_not(left.data), left.valid)  # definitely false
    rf = jnp.logical_and(jnp.logical_not(right.data), right.valid)
    data = jnp.logical_and(l, r)
    # result valid when: any side definitely false, or both sides valid
    valid = jnp.logical_or(jnp.logical_or(lf, rf), jnp.logical_and(left.valid, right.valid))
    return Column(LogicalType.BOOLEAN, data, valid)


def kleene_or(left: Column, right: Column) -> Column:
    lt = jnp.logical_and(left.data, left.valid)  # definitely true
    rt = jnp.logical_and(right.data, right.valid)
    data = jnp.logical_or(lt, rt)
    valid = jnp.logical_or(jnp.logical_or(lt, rt), jnp.logical_and(left.valid, right.valid))
    return Column(LogicalType.BOOLEAN, data, valid)


def logical_not(col: Column) -> Column:
    return Column(LogicalType.BOOLEAN, jnp.logical_not(col.data), col.valid)


# ---- date +/- interval -------------------------------------------------------


def _civil_from_days_vec(z):
    z = z + 719468
    era = jnp.where(z >= 0, z, z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + jnp.where(mp < 10, 3, -9)
    return y + (m <= 2), m, d


def _days_from_civil_vec(y, m, d):
    y = y - (m <= 2)
    era = jnp.where(y >= 0, y, y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + jnp.where(m > 2, -3, 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _last_day_of_month_vec(y, m):
    thirty_one = jnp.isin(m, jnp.array([1, 3, 5, 7, 8, 10, 12]))
    thirty = jnp.isin(m, jnp.array([4, 6, 9, 11]))
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    feb = jnp.where(leap, 29, 28)
    return jnp.where(thirty_one, 31, jnp.where(thirty, 30, feb))


def date_add_interval(dates: Column, interval: Interval, sign: int) -> Column:
    """DATE ± INTERVAL, fully vectorized calendar math (reference
    src/function/scalar/arithmetic_function.rs:63-192 date±interval overloads;
    subtraction negates the interval first, :169-173). Month arithmetic
    clamps the day to the target month's length; day-time arithmetic is
    bit-compatible with arrow's IntervalDayTime (see types.values.Interval)."""
    if sign < 0:
        interval = interval.negate()
    z = dates.data.astype(jnp.int64)
    if interval.months:
        y, m, d = _civil_from_days_vec(z)
        total = y * 12 + (m - 1) + interval.months
        y2 = total // 12
        m2 = total % 12 + 1
        d2 = jnp.minimum(d, _last_day_of_month_vec(y2, m2))
        z = _days_from_civil_vec(y2, m2, d2)
    z = z + interval.day_shift()
    return Column(LogicalType.DATE, z.astype(jnp.int32), dates.valid)


# ---- LIKE ---------------------------------------------------------------------


def like_match(col: Column, pattern: str, negated: bool = False) -> Column:
    """SQL LIKE on dictionary-encoded strings: the pattern is evaluated once
    per DISTINCT string (host regex over the dictionary), then mapped onto
    the column codes with a single device gather — O(D) pattern work for any
    column length."""
    import re as _re

    from sqlrs_tpu.data.strings import GLOBAL_STRINGS

    rx = _re.compile(
        "^"
        + "".join(
            ".*" if ch == "%" else "." if ch == "_" else _re.escape(ch)
            for ch in pattern
        )
        + "$",
        _re.DOTALL,
    )
    d = GLOBAL_STRINGS
    # memoized per-pattern, extended incrementally on dictionary growth —
    # a repeated LIKE over a stable dictionary costs zero host regex work
    match_table = d.match_table(
        ("like", pattern), lambda s: bool(rx.match(s)), np.bool_
    )
    if negated:
        match_table = ~match_table
    if len(match_table) == 0:
        return Column(LogicalType.BOOLEAN, jnp.zeros(len(col), jnp.bool_), col.valid)
    table = jnp.asarray(match_table)
    codes = jnp.clip(col.data, 0, len(match_table) - 1)
    return Column(LogicalType.BOOLEAN, table[codes], col.valid)


def _code_map_column(col: Column, key, fn) -> Column:
    """Apply a string→string function as a code→code dictionary mapping:
    host work is O(new distinct strings) thanks to the memoized incremental
    match_table (interning any new results), then ONE device gather maps the
    column — row count never touches the host."""
    from sqlrs_tpu.data.strings import GLOBAL_STRINGS, NULL_CODE

    d = GLOBAL_STRINGS
    n_before = len(d)
    if n_before == 0:
        return Column(
            LogicalType.VARCHAR,
            jnp.full(len(col), NULL_CODE, jnp.int32),
            col.valid,
        )
    table = d.match_table(key, lambda s: d.intern(fn(s)), np.int32)
    jt = jnp.asarray(table)
    codes = jnp.clip(col.data, 0, n_before - 1)
    return Column(LogicalType.VARCHAR, jt[codes], col.valid)


def substring_column(col: Column, start: int, length=None) -> Column:
    """SQL substring (1-based start; negative/zero start clamps like
    Postgres' FROM clause on positive lengths is not fully modeled — TPC-H
    uses positive constants only)."""
    s0 = max(start - 1, 0)
    if length is None:
        return _code_map_column(col, ("substr", s0, None), lambda s: s[s0:])
    end = s0 + max(int(length), 0)
    return _code_map_column(col, ("substr", s0, end), lambda s: s[s0:end])


def concat_columns(left: Column, right: Column) -> Column:
    """VARCHAR || VARCHAR. Host work is O(distinct (l,r) pairs): one
    np.unique over a packed int64 pair key dedups, each distinct pair is
    interned once, and ONE device gather maps codes back (mirroring
    _code_map_column — the per-row Python loop this replaces stalled on
    fact-table inputs)."""
    from sqlrs_tpu.data.strings import GLOBAL_STRINGS, NULL_CODE

    d = GLOBAL_STRINGS
    lc = np.asarray(left.data).astype(np.int64)
    rc = np.asarray(right.data).astype(np.int64)
    valid = np.asarray(left.valid) & np.asarray(right.valid)
    packed = np.where(valid, (lc << 32) | (rc & 0xFFFFFFFF), -1)
    uniq, inv = np.unique(packed, return_inverse=True)
    table = np.full(len(uniq), NULL_CODE, np.int32)
    for i, p in enumerate(uniq):
        if p < 0:
            continue
        table[i] = d.intern(d.lookup(int(p >> 32)) + d.lookup(int(p & 0xFFFFFFFF)))
    out = jnp.asarray(table)[jnp.asarray(inv.astype(np.int64))]
    return Column(LogicalType.VARCHAR, out, jnp.asarray(valid))


# ---- EXTRACT -------------------------------------------------------------------


def extract_date_field(col: Column, field: str) -> Column:
    y, m, d = _civil_from_days_vec(col.data.astype(jnp.int64))
    out = {"year": y, "month": m, "day": d}[field]
    return Column(LogicalType.INTEGER, out.astype(jnp.int32), col.valid)


# ---- IS NULL / CASE --------------------------------------------------------------


def is_null(col: Column, negated: bool = False) -> Column:
    data = col.valid if negated else jnp.logical_not(col.valid)
    return Column(LogicalType.BOOLEAN, data, jnp.ones(len(col), jnp.bool_))


def case_when(conditions: list[Column], results: list[Column], t: LogicalType) -> Column:
    """Nested where over (condition, result) pairs; last result is ELSE.
    A NULL condition counts as not-matched (SQL CASE semantics)."""
    out = results[-1]
    data, valid = out.data, out.valid
    for cond, res in zip(reversed(conditions), reversed(results[:-1])):
        fire = jnp.logical_and(cond.data, cond.valid)
        data = jnp.where(fire, res.data, data)
        valid = jnp.where(fire, res.valid, valid)
    return Column(t, data, valid)


# ---- filter/selection helpers ------------------------------------------------


def selection_to_indices(keep: Column) -> np.ndarray:
    """Boolean predicate column -> row indices where the predicate is TRUE
    (NULL counts as false). Host sync happens here — this is a pipeline
    breaker by design; the compacted size is data-dependent."""
    mask = np.logical_and(np.asarray(keep.data), np.asarray(keep.valid))
    return np.nonzero(mask)[0]
