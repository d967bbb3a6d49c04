"""pg text-form parser tests (deserializer.rs:102-185, column_value.rs:17-56
semantics; FIXTURES.md §5 value-parsing fixtures)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from pg_walstream_ray.functions import pgtext


def test_bool_vocabulary():
    arr = pa.array(["t", "f", "true", "false", "1", "0", "on", "off",
                    "yes", "no", "Y", "N", " T ", None])
    out, _ = pgtext.parse_pg_bool(arr)
    assert out.to_pylist() == [True, False, True, False, True, False, True,
                               False, True, False, True, False, True, None]


def test_bool_invalid_strict_and_lenient():
    arr = pa.array(["t", "banana"])
    with pytest.raises(ValueError):
        pgtext.parse_pg_bool(arr)
    out, bad = pgtext.parse_pg_bool(arr, lenient=True)
    assert out.to_pylist() == [True, None]
    assert bad.to_pylist() == [False, True]


def test_int_parsing_signs_and_overflow():
    arr = pa.array(["42", "-7", "+13", None])
    out, _ = pgtext.parse_pg_int(arr, pa.int32())
    assert out.to_pylist() == [42, -7, 13, None]
    # overflow rejected strictly
    with pytest.raises(Exception):
        pgtext.parse_pg_int(pa.array(["2147483648"]), pa.int32())
    # lenient: overflow -> null + error flag
    out, bad = pgtext.parse_pg_int(pa.array(["1", "2147483648", "junk"]),
                                   pa.int32(), lenient=True)
    assert out.to_pylist() == [1, None, None]
    assert bad.to_pylist() == [False, True, True]


def test_int64_range():
    out, _ = pgtext.parse_pg_int(
        pa.array(["9223372036854775807", "-9223372036854775808"]), pa.int64())
    assert out.to_pylist() == [2**63 - 1, -2**63]


def test_float_and_lenient():
    out, _ = pgtext.parse_pg_float(pa.array(["1.5", "-2e3"]), pa.float64())
    assert out.to_pylist() == [1.5, -2000.0]
    out, bad = pgtext.parse_pg_float(pa.array(["1.5", "nope"]), pa.float64(),
                                     lenient=True)
    assert out.to_pylist() == [1.5, None]
    assert bad.to_pylist() == [False, True]


def test_timestamp_micros_and_iso():
    out, _ = pgtext.parse_pg_timestamp(pa.array(["1700000000000000"]))
    assert out.to_pylist()[0].year == 2023
    out, _ = pgtext.parse_pg_timestamp(pa.array(["2024-05-01 12:30:00",
                                                 "1700000000000000"]))
    vals = out.to_pylist()
    assert vals[0].year == 2024 and vals[0].hour == 12
    assert vals[1].year == 2023


def test_bytea_hex_roundtrip():
    out, _ = pgtext.parse_pg_bytea(pa.array(["\\x00ff10", None]))
    assert out.to_pylist() == [b"\x00\xff\x10", None]
    back = pgtext.encode_pg_bytea(out)
    assert back.to_pylist() == ["\\x00ff10", None]
    with pytest.raises(ValueError):
        pgtext.parse_pg_bytea(pa.array(["nothex"]))
    out, bad = pgtext.parse_pg_bytea(pa.array(["nothex"]), lenient=True)
    assert out.to_pylist() == [None] and bad.to_pylist() == [True]


def test_date_parsing():
    out, _ = pgtext.parse_pg_date(pa.array(["2024-05-01", None]))
    assert out.type == pa.date32()
    vals = out.to_pylist()
    assert vals[0].year == 2024 and vals[0].month == 5 and vals[0].day == 1
    assert vals[1] is None
    with pytest.raises(ValueError):
        pgtext.parse_pg_date(pa.array(["not-a-date"]))
    out, bad = pgtext.parse_pg_date(pa.array(["2024-05-01", "nope"]),
                                    lenient=True)
    assert out.to_pylist()[1] is None
    assert bad.to_pylist() == [False, True]


def test_date_special_forms():
    # pg DATE legally emits infinity / -infinity / BC dates (text form);
    # strict mode must accept them, not raise
    out, _ = pgtext.parse_pg_date(pa.array(
        ["infinity", "-infinity", "0001-01-01 BC", "2024-05-01"]))
    days = pc.cast(out, pa.int32()).to_pylist()
    assert days[0] == 2 ** 31 - 1 and days[1] == -(2 ** 31)
    # 1 BC = proleptic year 0; 0001-01-01 BC is 366 days (year 0 is a
    # leap year) before 0001-01-01 AD
    ad1, _ = pgtext.parse_pg_date(pa.array(["0001-01-01"]))
    assert days[2] == pc.cast(ad1, pa.int32())[0].as_py() - 366
    # (element 3 checked as day-count: to_pylist() on the infinity
    # sentinels overflows datetime.date by design)
    assert days[3] == (pgtext._days_from_civil(2024, 5, 1))
    # malformed forms still raise strict / flag lenient
    with pytest.raises(ValueError):
        pgtext.parse_pg_date(pa.array(["2024-13-01 BC"]))
    out, bad = pgtext.parse_pg_date(pa.array(["infinit"]), lenient=True)
    assert out.to_pylist() == [None] and bad.to_pylist() == [True]


def test_array_malformed_dangling_escape():
    typ = pa.list_(pa.string())
    # dangling backslash inside quotes: strict raises ValueError (not
    # IndexError); lenient nulls + flags
    with pytest.raises(ValueError):
        pgtext.parse_pg_array(pa.array(['{"a\\}']), typ)
    out, bad = pgtext.parse_pg_array(pa.array(['{"a\\}']), typ,
                                     lenient=True)
    assert out.to_pylist() == [None] and bad.to_pylist() == [True]
    # unterminated quote and missing brace likewise
    with pytest.raises(ValueError):
        pgtext.parse_pg_array(pa.array(['{"abc}']), typ)
    with pytest.raises(ValueError):
        pgtext.parse_pg_array(pa.array(['{"a\\']), typ)


def test_numeric_decimal_parsing():
    import decimal

    typ = pa.decimal128(18, 4)
    out, _ = pgtext.parse_pg_numeric(
        pa.array(["12.3456", "-7", "+0.5", None]), typ)
    assert out.type == typ
    assert out.to_pylist() == [decimal.Decimal("12.3456"),
                               decimal.Decimal("-7"),
                               decimal.Decimal("0.5"), None]
    # strict: junk raises
    with pytest.raises(Exception):
        pgtext.parse_pg_numeric(pa.array(["NaN"]), typ)
    # lenient: junk and out-of-precision -> null + flag
    out, bad = pgtext.parse_pg_numeric(
        pa.array(["1.25", "NaN", "9" * 30, None]), typ, lenient=True)
    assert out.to_pylist()[0] == decimal.Decimal("1.25")
    assert out.to_pylist()[1] is None and out.to_pylist()[2] is None
    assert bad.to_pylist() == [False, True, True, False]


def test_date_typed_projection_end_to_end():
    """DATE (OID 1082) columns flow decode -> registry -> typed projection
    as date32 by default."""
    from pg_walstream_ray.stages.decode import decode_frames
    from pg_walstream_ray.stages.typed import project_envelope
    from pg_walstream_ray.state.schema_registry import SchemaRegistry
    from pg_walstream_ray.wire import codec
    from pg_walstream_ray.wire.frames import encode_xlogdata

    OID = 30002
    rel = codec.Relation(OID, "public", "dts", "d", [
        codec.ColumnInfo(1, "k", 23, -1),
        codec.ColumnInfo(0, "day", 1082, -1),
    ])

    def f(lsn, msg):
        return encode_xlogdata(lsn, lsn, 0, codec.encode_message(msg))

    frames = [
        f(1, codec.Begin(9, 0, 1)), f(2, rel),
        f(3, codec.Insert(OID, [(b"t", b"1"), (b"t", b"2024-05-01")])),
        f(4, codec.Insert(OID, [(b"t", b"2"), (b"n", b"")])),
        f(9, codec.Commit(0, 9, 10, 0)),
    ]
    env = decode_frames(frames)
    reg = SchemaRegistry()
    reg.ingest_envelope(env)
    typed = project_envelope(env, reg, OID)
    assert typed.schema.field("day").type == pa.date32()
    rows = {r["k"]: r for r in typed.to_pylist()}
    assert rows[1]["day"].isoformat() == "2024-05-01"
    assert rows[2]["day"] is None


def test_cast_dispatch():
    out, _ = pgtext.cast_pg_text(pa.array(["5"]), pa.int16())
    assert out.type == pa.int16()
    out, _ = pgtext.cast_pg_text(pa.array(["t"]), pa.bool_())
    assert out.to_pylist() == [True]
    out, _ = pgtext.cast_pg_text(pa.array(["abc"]), pa.string())
    assert out.to_pylist() == ["abc"]


def test_lenient_projection_dead_letter_column():
    """Lenient typed projection surfaces a per-row _cast_errors count (the
    FieldError-list analogue); strict mode raises on the same input."""
    import pyarrow as pa
    import pytest

    from pg_walstream_ray.stages.decode import decode_frames
    from pg_walstream_ray.stages.typed import project_envelope
    from pg_walstream_ray.state.schema_registry import SchemaRegistry
    from pg_walstream_ray.wire import codec
    from pg_walstream_ray.wire.frames import encode_xlogdata

    OID = 30001
    rel = codec.Relation(OID, "public", "m", "d", [
        codec.ColumnInfo(1, "k", 23, -1),
        codec.ColumnInfo(0, "n", 23, -1),
    ])

    def f(lsn, msg):
        return encode_xlogdata(lsn, lsn, 0, codec.encode_message(msg))

    frames = [
        f(1, codec.Begin(9, 0, 1)), f(2, rel),
        f(3, codec.Insert(OID, [(b"t", b"1"), (b"t", b"42")])),
        f(4, codec.Insert(OID, [(b"t", b"2"), (b"t", b"not_an_int")])),
        f(9, codec.Commit(0, 9, 10, 0)),
    ]
    env = decode_frames(frames)
    reg = SchemaRegistry()
    reg.ingest_envelope(env)

    typed = project_envelope(env, reg, OID, lenient=True)
    rows = {r["k"]: r for r in typed.to_pylist()}
    assert rows[1]["n"] == 42 and rows[1]["_cast_errors"] == 0
    assert rows[2]["n"] is None and rows[2]["_cast_errors"] == 1

    with pytest.raises(Exception):
        project_envelope(env, reg, OID, lenient=False)


def test_array_parsing_basic_and_quoted():
    out, _ = pgtext.parse_pg_array(
        pa.array(["{1,2,3}", "{}", None, "{4,NULL,6}"]),
        pa.list_(pa.int32()))
    assert out.to_pylist() == [[1, 2, 3], [], None, [4, None, 6]]
    out, _ = pgtext.parse_pg_array(
        pa.array(['{"a b","say \\"hi\\"",NULL,plain}']),
        pa.list_(pa.string()))
    assert out.to_pylist() == [['a b', 'say "hi"', None, 'plain']]
    out, _ = pgtext.parse_pg_array(
        pa.array(["{t,f,true}"]), pa.list_(pa.bool_()))
    assert out.to_pylist() == [[True, False, True]]


def test_array_parsing_nested_and_lenient():
    out, _ = pgtext.parse_pg_array(
        pa.array(["{{1,2},{3,4}}"]), pa.list_(pa.list_(pa.int32())))
    assert out.to_pylist() == [[[1, 2], [3, 4]]]
    with pytest.raises(Exception):
        pgtext.parse_pg_array(pa.array(["notanarray"]),
                              pa.list_(pa.int32()))
    out, bad = pgtext.parse_pg_array(
        pa.array(["{1,2}", "nope", "{3,junk}"]), pa.list_(pa.int32()),
        lenient=True)
    assert out.to_pylist()[0] == [1, 2]
    assert out.to_pylist()[1] is None
    assert out.to_pylist()[2] == [3, None]
    assert bad.to_pylist() == [False, True, True]


def test_array_cast_dispatch():
    out, _ = pgtext.cast_pg_text(pa.array(["{1.5,2.5}"]),
                                 pa.list_(pa.float64()))
    assert out.to_pylist() == [[1.5, 2.5]]
