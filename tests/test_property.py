"""Property-based tests (reference parity: fuzz targets
fuzz/fuzz_targets/roundtrip_*.rs): random op sequences through the pure
LWW/TOAST core vs a brute-force dict oracle, random messages through the
codec fixpoint, and golden byte vectors pinning the wire format."""
import os

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from pg_walstream_ray.stages.apply import lww_resolve
from pg_walstream_ray.wire import codec
from pg_walstream_ray.wire.frames import encode_keepalive, encode_xlogdata

# ---------------------------------------------------------------------------
# LWW + TOAST vs dict oracle
# ---------------------------------------------------------------------------

op_strategy = st.lists(
    st.tuples(
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(0, 3),                      # conv
        st.integers(0, 2),                      # turn
        st.one_of(st.none(), st.text(alphabet="abc", max_size=3)),  # text
        st.booleans(),                          # text_unchanged (updates)
    ),
    min_size=0, max_size=60)


_EXAMPLES = int(os.environ.get("PGWR_HYP_EXAMPLES", "50"))

@settings(max_examples=_EXAMPLES, deadline=None)
@given(op_strategy)
def test_lww_resolve_matches_dict_oracle(ops):
    n = len(ops)
    lsn = list(range(1, n + 1))
    conv = [f"c{c}" for _, c, _, _, _ in ops]
    turn = [t for _, _, t, _, _ in ops]
    kinds = [k for k, _, _, _, _ in ops]
    text = [None if k == "delete" else x for (k, _, _, x, _) in ops]
    unch = [(k == "update" and u) for (k, _, _, _, u) in ops]
    text = [None if u else x for x, u in zip(text, unch)]

    t = pa.table({
        "lsn": pa.array(lsn, pa.int64()),
        "op": pa.array(kinds, pa.string()),
        "conv_id": pa.array(conv, pa.string()),
        "turn_idx": pa.array(turn, pa.int32()),
        "text": pa.array(text, pa.string()),
        "_unchanged_text": pa.array(unch, pa.bool_()),
    })
    got = lww_resolve(t, ["conv_id", "turn_idx", "text"])
    got_map = {(r["conv_id"], r["turn_idx"]): (r["text"], r["_lsn"])
               for r in got.to_pylist()}

    state = {}
    for i, (k, c, tu, x, u) in enumerate(ops):
        key = (f"c{c}", tu)
        if k == "delete":
            state.pop(key, None)
        elif k == "update" and u:
            prev = state.get(key)
            state[key] = (prev[0] if prev else None, lsn[i])
        else:
            state[key] = (x, lsn[i])
    assert got_map == state


@settings(max_examples=_EXAMPLES, deadline=None)
@given(op_strategy)
def test_lww_tombstones_partition_alive_plus_dead(ops):
    """keep_tombstones=True returns every touched key exactly once, with
    tombstones exactly where the plain resolve drops the key."""
    n = len(ops)
    t = pa.table({
        "lsn": pa.array(range(1, n + 1), pa.int64()),
        "op": pa.array([k for k, *_ in ops], pa.string()),
        "conv_id": pa.array([f"c{c}" for _, c, *_ in ops], pa.string()),
        "turn_idx": pa.array([t for _, _, t, *_ in ops], pa.int32()),
        "text": pa.array([None if k == "delete" else x
                          for (k, _, _, x, _) in ops], pa.string()),
    })
    alive = lww_resolve(t, ["conv_id", "turn_idx", "text"])
    both = lww_resolve(t, ["conv_id", "turn_idx", "text"],
                       keep_tombstones=True)
    touched = {(f"c{c}", tu) for _, c, tu, _, _ in ops}
    rows = both.to_pylist()
    assert {(r["conv_id"], r["turn_idx"]) for r in rows} == touched
    dead = {(r["conv_id"], r["turn_idx"]) for r in rows if r["_tombstone"]}
    alive_keys = {(r["conv_id"], r["turn_idx"]) for r in alive.to_pylist()}
    assert dead == touched - alive_keys


# ---------------------------------------------------------------------------
# codec fixpoint on random tuples
# ---------------------------------------------------------------------------

tuple_strategy = st.lists(
    st.one_of(
        st.tuples(st.just(b"n"), st.none()),
        st.tuples(st.just(b"u"), st.none()),
        st.tuples(st.just(b"t"), st.binary(max_size=16)),
        st.tuples(st.just(b"b"), st.binary(max_size=16)),
    ), min_size=0, max_size=8)


@settings(max_examples=_EXAMPLES, deadline=None)
@given(tuple_strategy, st.integers(1, 2**31 - 1))
def test_insert_roundtrip_random_tuples(tup, oid):
    msg = codec.Insert(oid, tup)
    b = codec.encode_message(msg)
    parsed, _ = codec.parse_message(b)
    assert parsed == msg
    assert codec.encode_message(parsed) == b          # byte fixpoint


# ---------------------------------------------------------------------------
# golden byte vectors (wire-format anchor, pgoutput + replication protocol)
# ---------------------------------------------------------------------------


def test_golden_begin_bytes():
    # 'B' + final_lsn u64 + commit_ts i64 + xid u32
    b = codec.encode_message(codec.Begin(0x0102030405060708, 7, 42))
    assert b.hex() == "42" + "0102030405060708" + \
        "0000000000000007" + "0000002a"


def test_golden_insert_bytes():
    # 'I' + oid u32 + 'N' + ncols u16 + ('t' + len + bytes | 'n')
    b = codec.encode_message(codec.Insert(
        16384, [(b"t", b"hi"), (b"n", None)]))
    assert b.hex() == "49" + "00004000" + "4e" + "0002" + \
        "74" + "00000002" + "6869" + "6e"


def test_golden_keepalive_bytes():
    # 'k' + wal_end u64 + ts i64 + reply u8
    b = encode_keepalive(0x10, 0x20, True)
    assert b.hex() == "6b" + "0000000000000010" + \
        "0000000000000020" + "01"


def test_golden_xlogdata_bytes():
    # 'w' + wal_start u64 + wal_end u64 + send_ts i64 + body
    b = encode_xlogdata(1, 2, 3, b"\xaa")
    assert b.hex() == "77" + "0000000000000001" + \
        "0000000000000002" + "0000000000000003" + "aa"


@settings(max_examples=_EXAMPLES, deadline=None)
@given(op_strategy)
def test_lww_output_is_key_sorted(ops):
    """Ordering invariant the apply stage relies on (it skips the post-
    resolve sort): winners come out already sorted by key."""
    import pyarrow.compute as pc

    n = len(ops)
    t = pa.table({
        "lsn": pa.array(range(1, n + 1), pa.int64()),
        "op": pa.array([k for k, *_ in ops], pa.string()),
        "conv_id": pa.array([f"c{c}" for _, c, *_ in ops], pa.string()),
        "turn_idx": pa.array([t for _, _, t, *_ in ops], pa.int32()),
        "text": pa.array([None if k == "delete" else x
                          for (k, _, _, x, _) in ops], pa.string()),
    })
    for kt in (False, True):
        out = lww_resolve(t, ["conv_id", "turn_idx", "text"],
                          keep_tombstones=kt)
        idx = pc.sort_indices(out, sort_keys=[("conv_id", "ascending"),
                                              ("turn_idx", "ascending")])
        assert idx.to_pylist() == list(range(out.num_rows))


# ---------------------------------------------------------------------------
# full-pipeline property: random WalSpecs through the REAL Ray pipeline
# must match the sequential oracle (few examples — each runs a pipeline)
# ---------------------------------------------------------------------------

spec_strategy = st.builds(
    dict,
    n_convs=st.integers(8, 30),
    turns_per_conv=st.integers(2, 6),
    update_frac=st.floats(0.0, 1.5),
    delete_frac=st.floats(0.0, 0.4),
    tx_rows=st.sampled_from([3, 10, 37]),
    n_shards=st.integers(1, 3),
    seed=st.integers(1, 10_000),
    streamed_frac=st.floats(0.0, 0.6),
    stream_abort_frac=st.floats(0.0, 0.5),
    two_phase_frac=st.floats(0.0, 0.6),
    two_phase_rollback_frac=st.floats(0.0, 0.5),
    toast_unchanged_frac=st.floats(0.0, 0.5),
    segment_rows=st.sampled_from([None, 25, 60]),
    schema_change_at_frac=st.sampled_from([None, 0.5]),
)


@settings(max_examples=_EXAMPLES, deadline=None)
@given(spec_strategy)
def test_random_specs_full_pipeline(ray_session, spec_kw):
    from pg_walstream_ray.sources import walgen

    from .helpers import run_and_check

    run_and_check(walgen.WalSpec(**spec_kw), num_partitions=3)


def test_golden_streamed_and_two_phase_bytes():
    # 'S' + xid u32 + first_segment u8
    b = codec.encode_message(codec.StreamStart(7, True))
    assert b.hex() == "53" + "00000007" + "01"
    # 'c' + flags u8 + commit_lsn u64 + end_lsn u64 + commit_ts i64
    b = codec.encode_message(codec.StreamCommit(7, 0, 0x10, 0x11, 5))
    assert b.hex() == "63" + "00000007" + "00" + "0000000000000010" + \
        "0000000000000011" + "0000000000000005"
    # 'P' + flags u8 + prepare_lsn u64 + end_lsn u64 + ts i64 + xid u32 + gid cstr
    b = codec.encode_message(codec.Prepare(0, 0x20, 0x21, 9, 7, "g"))
    assert b.hex() == "50" + "00" + "0000000000000020" + \
        "0000000000000021" + "0000000000000009" + "00000007" + "6700"
    # streamed Insert carries the xid right after the tag
    b = codec.encode_message(codec.Insert(16384, [(b"t", b"x")]),
                             in_stream_xid=7)
    assert b.hex() == "49" + "00000007" + "00004000" + "4e" + "0001" + \
        "74" + "00000001" + "78"


@settings(max_examples=_EXAMPLES, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(blacklist_characters="\x00",
                           blacklist_categories=("Cs",)),
    max_size=30), min_size=0, max_size=20))
def test_tokenize_column_matches_naive_split(texts):
    """The dictionary-encode fast path of tokenize_column produces exactly
    the token sequence of a naive per-row str.split(' ') mapped through
    the same hasher (guards the distinct-only interning optimization)."""
    import numpy as np
    import pyarrow as pa

    from pg_walstream_ray.functions import hashing as H

    fast = H.TokenHasher()
    offs, tok = H.tokenize_column(pa.array(texts, pa.string()), fast)

    naive = H.TokenHasher()
    expect_h60 = []
    expect_offs = [0]
    for s in texts:
        toks = s.split(" ")
        expect_h60.extend(H.md5_int60(w) for w in toks)
        expect_offs.append(expect_offs[-1] + len(toks))
    assert offs.tolist() == expect_offs
    assert fast.h60_array[tok].tolist() == expect_h60


@settings(max_examples=_EXAMPLES, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1),          # source
                          st.integers(0, 999),        # commit ts
                          st.integers(0, 15)),        # conv
                min_size=1, max_size=200))
def test_hopping_windows_match_bruteforce(rows):
    """HoppingWindowAggregator (W=2S) flushed over an in-order stream
    equals the brute-force per-window count/distinct over the raw rows —
    every event in exactly two windows, grids offset by S."""
    import numpy as np
    import pyarrow as pa

    from pg_walstream_ray.pipelines.streaming import (
        HoppingWindowAggregator)

    rows = sorted(rows, key=lambda r: r[1])       # commit order
    S = 100
    agg = HoppingWindowAggregator(width_us=2 * S, slide_us=S,
                                  sources=[0, 1])
    tab = pa.table({
        "source": pa.array([r[0] for r in rows], pa.int32()),
        "commit_ts_us": pa.array([r[1] for r in rows], pa.int64()),
        "op": pa.array(["insert"] * len(rows), pa.string()),
        "after_values": pa.array([[f"c{r[2]}"] for r in rows],
                                 pa.list_(pa.string())),
        "before_values": pa.array([None] * len(rows),
                                  pa.list_(pa.string())),
    })
    agg.ingest(tab)
    agg.flush()
    got = {r["window_start_us"]: (r["n_events"], r["n_convs"])
           for r in agg.emitted}

    want: dict = {}
    for src, t, c in rows:
        base = t - t % S
        for w in (base, base - S):
            n, convs = want.setdefault(w, [0, set()])
            want[w][0] += 1
            want[w][1].add(c)
    assert got == {w: (n, len(cs)) for w, (n, cs) in want.items()}
    assert agg.late_dropped == 0


@settings(max_examples=_EXAMPLES, deadline=None)
@given(st.lists(st.integers(1, 500), min_size=1, max_size=300))
def test_weighted_median_histogram_matches_bruteforce(cents):
    """The histogram-cumsum weighted-median rule (smallest v with
    2*cum(v) >= total mass) equals the brute-force scan over sorted raw
    values."""
    import numpy as np
    import pandas as pd

    h = pd.DataFrame({"cents": cents}).groupby("cents").size() \
        .rename("n").reset_index().sort_values("cents")
    vals = h["cents"].to_numpy(np.int64)
    cum = (vals * h["n"].to_numpy(np.int64)).cumsum()
    tot = int(cum[-1])
    got = int(vals[np.argmax(2 * cum >= tot)])

    s = sorted(cents)
    run = 0
    for v in s:
        run += v
        if 2 * run >= sum(cents):
            assert v == got
            break


@settings(max_examples=_EXAMPLES, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1),          # source
                          st.integers(0, 999),        # commit ts
                          st.integers(0, 15)),        # conv
                min_size=1, max_size=200),
       st.integers(1, 50))                            # chunk size
def test_retracting_changelog_matches_bruteforce(rows, chunk):
    """RetractingWindowAggregator over any PER-SOURCE-in-order stream,
    ingested in arbitrary chunk sizes: the consolidated changelog equals
    the brute-force per-window count/distinct, the protocol alternates
    with exact retraction values, and every window's final pane is its
    last emission."""
    import pyarrow as pa

    from pg_walstream_ray.pipelines.streaming import (
        RetractingWindowAggregator)

    # commit ts must be monotone PER SOURCE (WAL contract)
    by_src = {0: [], 1: []}
    for s, t, c in rows:
        by_src[s].append((t, c))
    for s in by_src:
        by_src[s].sort()
    merged = sorted([(t, s, c) for s in by_src for t, c in by_src[s]])

    W = 100
    agg = RetractingWindowAggregator(width_us=W, sources=[0, 1])
    for i in range(0, len(merged), chunk):
        part = merged[i:i + chunk]
        tab = pa.table({
            "source": pa.array([r[1] for r in part], pa.int32()),
            "commit_ts_us": pa.array([r[0] for r in part], pa.int64()),
            "op": pa.array(["insert"] * len(part), pa.string()),
            "after_values": pa.array([[f"c{r[2]}"] for r in part],
                                     pa.list_(pa.string())),
            "before_values": pa.array([None] * len(part),
                                      pa.list_(pa.string())),
        })
        agg.ingest(tab)
    agg.flush()

    want: dict = {}
    for t, s, c in merged:
        w = t - t % W
        st_ = want.setdefault(w, [0, set()])
        st_[0] += 1
        st_[1].add(c)
    cons = agg.consolidated_table().to_pandas()
    got = {int(r["window_start_us"]): (int(r["n_events"]),
                                       int(r["n_convs"]))
           for _, r in cons.iterrows()}
    assert got == {w: (n, len(cs)) for w, (n, cs) in want.items()}

    log = agg.changelog_table().to_pandas()
    assert (log["seq"].to_numpy()
            == np.arange(len(log))).all()
    for w, g in log.groupby("window_start_us"):
        g = g.sort_values("seq")
        kinds = list(g["kind"])
        assert kinds[0] == "upsert"
        assert all(kinds[i] != kinds[i - 1] for i in range(1, len(kinds)))
        prev = None
        for _, r in g.iterrows():
            if r["kind"] == "retract":
                assert (r["n_events"], r["n_convs"]) == prev
            else:
                prev = (r["n_events"], r["n_convs"])
        finals = g[g["is_final"]]
        assert len(finals) == 1
        assert finals["seq"].iloc[0] == g["seq"].iloc[-1]
    assert agg.late_dropped == 0


@settings(max_examples=_EXAMPLES, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1),          # source
                          st.integers(0, 999),        # commit ts
                          st.integers(0, 40)),        # text length
                min_size=1, max_size=200),
       st.integers(1, 50))                            # chunk size
def test_window_quantiles_match_bruteforce(rows, chunk):
    """WindowQuantileAggregator over any per-source-in-order stream in
    arbitrary chunkings equals brute-force quantile_disc per window."""
    import pyarrow as pa

    from pg_walstream_ray.pipelines.streaming import (
        WindowQuantileAggregator)

    by_src = {0: [], 1: []}
    for s, t, ln in rows:
        by_src[s].append((t, ln))
    for s in by_src:
        by_src[s].sort()
    merged = sorted([(t, s, ln) for s in by_src for t, ln in by_src[s]])

    W = 100
    agg = WindowQuantileAggregator(width_us=W, sources=[0, 1])
    for i in range(0, len(merged), chunk):
        part = merged[i:i + chunk]
        tab = pa.table({
            "source": pa.array([r[1] for r in part], pa.int32()),
            "commit_ts_us": pa.array([r[0] for r in part], pa.int64()),
            "op": pa.array(["insert"] * len(part), pa.string()),
            "after_values": pa.array(
                [["c", "0", "user", "x" * r[2], "", ""] for r in part],
                pa.list_(pa.string())),
            "before_values": pa.array([None] * len(part),
                                      pa.list_(pa.string())),
        })
        agg.ingest(tab)
    agg.flush()
    got = {int(r["window_start_us"]):
           (int(r["n_events"]), int(r["p50_len"]), int(r["p95_len"]))
           for r in agg.result_table().to_pylist()}

    def qd(v, q):
        v = sorted(v)
        return v[max(int(np.ceil(q * len(v))), 1) - 1]

    want: dict = {}
    for t, s, ln in merged:
        want.setdefault(t - t % W, []).append(ln)
    assert got == {w: (len(v), qd(v, 0.5), qd(v, 0.95))
                   for w, v in want.items()}
    assert agg.late_dropped == 0
