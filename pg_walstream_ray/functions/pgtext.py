"""PostgreSQL text-form scalar parsers, vectorized over Arrow arrays.

Reference parity (consumer-edge typed deserialization, SURVEY.md §2.3):
  - pg bool vocabulary t/f/true/false/1/0/on/off/yes/no:
    /root/reference/src/deserializer.rs:102-115
  - ASCII int parsing with +/- and overflow checks: deserializer.rs:124-185
  - hex bytea '\\x…' encode/decode: /root/reference/src/column_value.rs:17-56
  - lenient deserialization (failed fields -> defaults + error list):
    deserializer.rs:617-691
  - LSN text 'hi/lo': see wire/frames.py

All functions are Arrow-vectorized (pyarrow.compute) — no per-row Python in
hot paths.  ``lenient=True`` mirrors ``try_deserialize_into``: bad values
become null and an error mask is returned instead of raising.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BOOL_TRUE = pa.array(["t", "true", "1", "on", "yes", "y"], pa.string())
_BOOL_FALSE = pa.array(["f", "false", "0", "off", "no", "n"], pa.string())


def parse_pg_bool(arr: pa.Array, lenient: bool = False
                  ) -> Tuple[pa.Array, Optional[pa.Array]]:
    """Text -> bool with the pg vocabulary (case-insensitive, trimmed)."""
    s = pc.utf8_lower(pc.utf8_trim_whitespace(arr))
    is_t = pc.is_in(s, value_set=_BOOL_TRUE)
    is_f = pc.is_in(s, value_set=_BOOL_FALSE)
    ok = pc.or_(is_t, is_f)
    bad = pc.and_(pc.invert(ok), pc.is_valid(arr))
    if not lenient and pc.any(bad).as_py():
        idx = pc.index(bad, True).as_py()
        raise ValueError(f"invalid pg bool text {arr[idx].as_py()!r}")
    out = pc.if_else(ok, is_t, pa.scalar(None, pa.bool_()))
    return out, (bad if lenient else None)


def parse_pg_int(arr: pa.Array, typ: pa.DataType, lenient: bool = False
                 ) -> Tuple[pa.Array, Optional[pa.Array]]:
    """ASCII int with +/-, whitespace trim, and overflow rejection.

    pyarrow's string->int cast implements exactly the strict semantics
    (error on junk or overflow); the lenient path nulls bad values.
    """
    s = pc.utf8_trim_whitespace(arr)
    # pyarrow cast rejects a leading '+'; strip one if present
    s = pc.if_else(pc.starts_with(s, "+"), pc.utf8_slice_codeunits(s, 1), s)
    if not lenient:
        return pc.cast(s, typ), None
    # lenient: validate via regex then cast only the valid slots
    ok = pc.match_substring_regex(s, r"^-?[0-9]+$")
    ok = pc.fill_null(ok, False)
    safe = pc.if_else(ok, s, pa.scalar(None, pa.string()))
    try:
        out = pc.cast(safe, typ)
        bad = pc.and_(pc.invert(ok), pc.is_valid(arr))
    except pa.ArrowInvalid:
        # overflow inside digits-only values: fall back per-value
        import numpy as np
        lo, hi = _int_range(typ)
        py = safe.to_pylist()
        vals, badl = [], []
        for v, orig_valid in zip(py, pc.is_valid(arr).to_pylist()):
            if v is None:
                vals.append(None)
                badl.append(orig_valid)
                continue
            iv = int(v)
            if lo <= iv <= hi:
                vals.append(iv)
                badl.append(False)
            else:
                vals.append(None)
                badl.append(True)
        out = pa.array(vals, typ)
        bad = pa.array(badl, pa.bool_())
    return out, bad


def _int_range(typ: pa.DataType) -> Tuple[int, int]:
    bits = typ.bit_width
    return -(1 << (bits - 1)), (1 << (bits - 1)) - 1


def parse_pg_float(arr: pa.Array, typ: pa.DataType, lenient: bool = False
                   ) -> Tuple[pa.Array, Optional[pa.Array]]:
    s = pc.utf8_trim_whitespace(arr)
    if not lenient:
        return pc.cast(s, typ), None
    ok = pc.fill_null(pc.match_substring_regex(
        s, r"^[+-]?([0-9]*\.?[0-9]+([eE][+-]?[0-9]+)?|NaN|Infinity|-Infinity)$"), False)
    safe = pc.if_else(ok, s, pa.scalar(None, pa.string()))
    out = pc.cast(safe, typ)
    bad = pc.and_(pc.invert(ok), pc.is_valid(arr))
    return out, bad


def parse_pg_timestamp(arr: pa.Array, lenient: bool = False
                       ) -> Tuple[pa.Array, Optional[pa.Array]]:
    """Timestamp text -> timestamp[us] (naive UTC).

    Accepts the engine's lossless micros-since-unix-epoch integer text (the
    synthetic WAL's form) or ISO 'YYYY-MM-DD HH:MM:SS[.ffffff]' text (real
    pgoutput's form). Postgres-epoch conversion helpers live in wire/frames.
    """
    s = pc.utf8_trim_whitespace(arr)
    is_int = pc.fill_null(pc.match_substring_regex(s, r"^-?[0-9]+$"), False)
    if pc.all(pc.or_(is_int, pc.is_null(arr))).as_py():
        return pc.cast(pc.cast(s, pa.int64()), pa.timestamp("us")), None
    iso = pc.if_else(is_int, pa.scalar(None, pa.string()), s)
    ts_iso = pc.strptime(iso, "%Y-%m-%d %H:%M:%S", "us", error_is_null=True)
    ints = pc.if_else(is_int, s, pa.scalar(None, pa.string()))
    ts_int = pc.cast(pc.cast(ints, pa.int64()), pa.timestamp("us"))
    out = pc.if_else(is_int, ts_int, ts_iso)
    bad = pc.and_(pc.is_null(out), pc.is_valid(arr)) if lenient else None
    return out, bad


def _days_from_civil(y: int, m: int, d: int) -> int:
    """Proleptic-Gregorian (y, m, d) -> days since 1970-01-01 (Howard
    Hinnant's civil-days algorithm; handles y <= 0, i.e. BC years)."""
    y -= m <= 2
    era = (y if y >= 0 else y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + (-3 if m > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _pg_date_special(tok: str) -> Optional[int]:
    """Scalar fallback for legal pg DATE text the vectorized strptime
    rejects: 'infinity'/'-infinity' (mapped to date32 int32 extremes, the
    usual driver convention) and BC dates 'YYYY-MM-DD BC' (pg year 1 BC =
    proleptic year 0).  Returns days-since-epoch or None if malformed."""
    t = tok.strip()
    if t == "infinity":
        return 2 ** 31 - 1
    if t == "-infinity":
        return -(2 ** 31)
    if t.endswith(" BC"):
        try:
            y, m, d = (int(p) for p in t[:-3].split("-"))
            if y >= 1 and 1 <= m <= 12 and 1 <= d <= 31:
                return _days_from_civil(1 - y, m, d)
        except ValueError:
            return None
    return None


def parse_pg_date(arr: pa.Array, lenient: bool = False
                  ) -> Tuple[pa.Array, Optional[pa.Array]]:
    """Date text 'YYYY-MM-DD' -> date32 (pg DATE, OID 1082).  Special pg
    forms ('infinity', '-infinity', 'YYYY-MM-DD BC') take a scalar
    fallback on only the rows the vectorized parse rejects."""
    s = pc.utf8_trim_whitespace(arr)
    ts = pc.strptime(s, "%Y-%m-%d", "s", error_is_null=True)
    out = pc.cast(ts, pa.date32())
    bad = pc.and_(pc.is_null(out), pc.is_valid(arr))
    if pc.any(bad).as_py():
        days_i = pc.cast(out, pa.int32())
        valid = pc.is_valid(days_i).to_numpy(zero_copy_only=False).copy()
        days = pc.fill_null(days_i, 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        badm = bad.to_numpy(zero_copy_only=False)
        still_bad = badm.copy()
        for i in np.flatnonzero(badm):
            sp = _pg_date_special(arr[i].as_py())
            if sp is not None:
                days[i] = sp
                valid[i] = True
                still_bad[i] = False
        out = pc.if_else(pa.array(valid),
                         pa.array(days.astype(np.int32), pa.date32()),
                         pa.scalar(None, pa.date32()))
        bad = pa.array(still_bad)
    if not lenient and pc.any(bad).as_py():
        idx = pc.index(bad, True).as_py()
        raise ValueError(f"invalid pg date text {arr[idx].as_py()!r}")
    return out, (bad if lenient else None)


def parse_pg_numeric(arr: pa.Array, typ: pa.DataType, lenient: bool = False
                     ) -> Tuple[pa.Array, Optional[pa.Array]]:
    """NUMERIC text -> decimal128 (opt-in typed form of pg numeric).

    The registry's default mapping keeps OID 1700 as lossless text
    (schema_registry.PG_OID_TO_ARROW) since pg numeric is unbounded;
    embedding applications that know their precision can override the
    OID map with a decimal128(p, s) and this parser takes over.  'NaN'
    (a legal pg numeric) has no decimal representation: error in strict
    mode, null + error-mask in lenient mode.
    """
    s = pc.utf8_trim_whitespace(arr)
    s = pc.if_else(pc.starts_with(s, "+"), pc.utf8_slice_codeunits(s, 1), s)
    if not lenient:
        return pc.cast(s, typ), None
    ok = pc.fill_null(pc.match_substring_regex(
        s, r"^-?[0-9]+(\.[0-9]+)?$"), False)
    safe = pc.if_else(ok, s, pa.scalar(None, pa.string()))
    try:
        out = pc.cast(safe, typ)
        bad = pc.and_(pc.invert(ok), pc.is_valid(arr))
    except pa.ArrowInvalid:
        # regex-clean values that still don't fit (precision/scale
        # overflow): per-value cold path — null them and flag
        import decimal
        vals, badl = [], []
        for v, orig_valid in zip(safe.to_pylist(),
                                 pc.is_valid(arr).to_pylist()):
            if v is None:
                vals.append(None)
                badl.append(orig_valid)       # regex-rejected original
                continue
            try:
                vals.append(pa.array([decimal.Decimal(v)], typ)[0].as_py())
                badl.append(False)
            except (pa.ArrowInvalid, decimal.InvalidOperation):
                vals.append(None)
                badl.append(True)
        out = pa.array(vals, typ)
        bad = pa.array(badl, pa.bool_())
    return out, bad


def _split_pg_array(s: str) -> list:
    """Tokenize one pg array literal '{..}' -> element text list (None for
    NULL).  Handles quoted elements with backslash escapes and the empty
    array; nested arrays come back as raw '{..}' element strings (cast
    recursively by parse_pg_array for list<list<..>> targets)."""
    if not (s.startswith("{") and s.endswith("}")):
        raise ValueError(f"invalid pg array text {s!r}")
    body = s[1:-1]
    if body == "":
        return []
    out, i, n = [], 0, len(body)
    while i < n:
        if body[i] == '"':                      # quoted element
            j, buf = i + 1, []
            while j < n:
                c = body[j]
                if c == "\\":
                    if j + 1 >= n:              # dangling escape: malformed
                        raise ValueError(f"invalid pg array text {s!r}")
                    buf.append(body[j + 1])
                    j += 2
                elif c == '"':
                    break
                else:
                    buf.append(c)
                    j += 1
            else:                               # unterminated quote
                raise ValueError(f"invalid pg array text {s!r}")
            out.append("".join(buf))
            i = j + 1
            if i < n and body[i] == ",":
                i += 1
        elif body[i] == "{":                    # nested array element
            depth, j = 0, i
            while j < n:
                if body[j] == "{":
                    depth += 1
                elif body[j] == "}":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            out.append(body[i:j + 1])
            i = j + 1
            if i < n and body[i] == ",":
                i += 1
        else:                                   # bare element
            j = body.find(",", i)
            if j < 0:
                j = n
            tok = body[i:j]
            out.append(None if tok.upper() == "NULL" else tok)
            i = j + 1
    return out


def parse_pg_array(arr: pa.Array, typ: pa.DataType, lenient: bool = False
                   ) -> Tuple[pa.Array, Optional[pa.Array]]:
    """pg array text form '{a,b,NULL}' -> Arrow list<child> (opt-in typed
    form; the default OID mapping keeps array columns as lossless TEXT —
    exactly what pgoutput ships and what the reference hands consumers,
    integration-tests/complex_types.rs).  Element text is cast with the
    same scalar parsers as top-level columns (recursing for nested
    list targets), so int/bool/float/date/decimal element semantics are
    identical.  Cold path by design (per-row Python tokenizer): array
    columns that need the typed form should be narrow."""
    vals: list = []
    bad: list = []
    for v in arr.to_pylist():
        if v is None:
            vals.append(None)
            bad.append(False)
            continue
        try:
            vals.append(_split_pg_array(v))
            bad.append(False)
        except ValueError:
            if not lenient:
                raise
            vals.append(None)
            bad.append(True)
    # cast the flattened element texts with the scalar machinery
    flat = pa.array([e for row in vals if row is not None for e in row],
                    pa.string())
    typed_flat, flat_bad = cast_pg_text(flat, typ.value_type, lenient)
    off_arr = []
    cur = 0
    for r in vals:
        off_arr.append(None if r is None else cur)
        if r is not None:
            cur += len(r)
    off_arr.append(cur)
    offsets = pa.array(off_arr, pa.int32())
    out = pa.ListArray.from_arrays(offsets, typed_flat)
    if not lenient:
        return out, None
    # lenient: a row is bad if its literal failed OR any element failed
    # (cast: an all-failed flat array yields a null-typed mask)
    if flat_bad is not None and len(flat_bad) and pc.any(
            pc.fill_null(pc.cast(flat_bad, pa.bool_()), False)).as_py():
        import numpy as np

        fb = np.asarray(pc.fill_null(pc.cast(flat_bad, pa.bool_()), False))
        cur = 0
        for i, r in enumerate(vals):
            if r is not None and fb[cur:cur + len(r)].any():
                bad[i] = True
            if r is not None:
                cur += len(r)
    return out, pa.array(bad, pa.bool_())


def parse_pg_bytea(arr: pa.Array, lenient: bool = False
                   ) -> Tuple[pa.Array, Optional[pa.Array]]:
    """Hex bytea text '\\x0a0b' -> binary (column_value.rs:17-56)."""
    import binascii
    vals, bad = [], []
    for v in arr.to_pylist():
        if v is None:
            vals.append(None)
            bad.append(False)
            continue
        try:
            if not v.startswith("\\x"):
                raise ValueError(v)
            vals.append(binascii.unhexlify(v[2:]))
            bad.append(False)
        except (ValueError, binascii.Error):
            if not lenient:
                raise ValueError(f"invalid hex bytea {v!r}")
            vals.append(None)
            bad.append(True)
    return pa.array(vals, pa.binary()), (pa.array(bad) if lenient else None)


def encode_pg_bytea(arr: pa.Array) -> pa.Array:
    """binary -> hex bytea text form."""
    return pa.array(
        [None if v is None else "\\x" + v.hex() for v in arr.to_pylist()],
        pa.string())


def cast_pg_text(arr: pa.Array, typ: pa.DataType, lenient: bool = False
                 ) -> Tuple[pa.Array, Optional[pa.Array]]:
    """Dispatch: pg text-form array -> typed Arrow array (+ error mask)."""
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return arr, (pa.array([False] * len(arr)) if lenient else None)
    if pa.types.is_boolean(typ):
        return parse_pg_bool(arr, lenient)
    if pa.types.is_integer(typ):
        return parse_pg_int(arr, typ, lenient)
    if pa.types.is_floating(typ):
        return parse_pg_float(arr, typ, lenient)
    if pa.types.is_timestamp(typ):
        return parse_pg_timestamp(arr, lenient)
    if pa.types.is_date(typ):
        return parse_pg_date(arr, lenient)
    if pa.types.is_decimal(typ):
        return parse_pg_numeric(arr, typ, lenient)
    if pa.types.is_binary(typ):
        return parse_pg_bytea(arr, lenient)
    if pa.types.is_list(typ):
        return parse_pg_array(arr, typ, lenient)
    return pc.cast(arr, typ), None
