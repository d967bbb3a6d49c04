"""Typed projection: envelope batches -> typed change rows.

The decoder's envelope keeps tuples as generic ``list<string>`` columns so
its Arrow schema never changes, even across Relation-message schema
evolution.  This stage projects those lists into typed columns using the
relation registry — fully vectorized via ``pc.list_element`` (one kernel
call per column), no per-row Python.

Reference parity: this is the consumer-edge typed deserialization
(``RowDataDeserializer``, /root/reference/src/deserializer.rs:199-610) plus
``TupleData::into_row_data`` column naming (protocol.rs:310-328), with the
TOAST 'u' skip surfaced as ``_unchanged_<col>`` bool columns so the apply
stage can carry prior values forward (protocol.rs:317-318).

Output schema for a relation with unified columns C1..Cn:
  lsn, commit_lsn, commit_ts_us, xid, op, rel_version, + typed C1..Cn
  + _unchanged_Ci (bool) for each column.
Key columns for delete rows are taken from ``before_values`` (the only
tuple a Delete carries, protocol.rs:864-951); non-key payload of deletes is
null.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.pgtext import cast_pg_text
from ..state.schema_registry import RelVersion, SchemaRegistry

CONTROL_COLS = ["source", "lsn", "commit_lsn", "commit_ts_us", "xid", "op",
                "rel_version"]
DML_SET = pa.array(["insert", "update", "delete"], pa.string())


def split_envelope(envelope: pa.Table, oid: int):
    """-> (dml_rows_for_oid, truncate_rows_for_oid, relation_rows)."""
    is_oid = pc.equal(envelope["rel_oid"], oid)
    dml = envelope.filter(pc.and_(is_oid, pc.is_in(envelope["op"], value_set=DML_SET)))
    trunc = envelope.filter(pc.and_(is_oid, pc.equal(envelope["op"], "truncate")))
    rel = envelope.filter(pc.equal(envelope["op"], "relation"))
    return dml, trunc, rel


def _project_version_slice(t: pa.Table, rv: RelVersion,
                           unified: pa.Schema, lenient: bool) -> pa.Table:
    """Project one (rel_version)-homogeneous slice of DML envelope rows."""
    n = t.num_rows
    cols: dict = {c: t[c] for c in CONTROL_COLS}
    is_delete = pc.equal(t["op"], "delete")
    any_delete = pc.any(is_delete).as_py() if n else False
    after = t["after_values"].combine_chunks() if n else None
    before = t["before_values"].combine_chunks() if n else None
    unch = t["unchanged_mask"].combine_chunks() if n else None

    version_names = [c.name for c in rv.columns]
    false_arr = pa.array(np.zeros(n, dtype=bool))
    err_count = np.zeros(n, dtype=np.int32)   # lenient dead-letter counter
    for fi, field in enumerate(unified):
        name = field.name
        if fi < len(rv.columns):
            src = rv.columns[fi]
            vals = pc.list_element(after, fi) if n else pa.array([], pa.string())
            u = pc.list_element(unch, fi) if n else pa.array([], pa.bool_())
            # delete rows carry only the before(key) tuple
            if any_delete:
                bvals = pc.list_element(before, fi)
                vals = pc.if_else(is_delete, bvals, vals)
                u = pc.fill_null(pc.if_else(is_delete, False, u), False)
            else:
                u = pc.fill_null(u, False)
            typed, _err = cast_pg_text(vals, field.type, lenient=lenient)
            if _err is not None:
                err_count += np.asarray(pc.fill_null(_err, False)).astype(
                    np.int32)
            if typed.type != field.type:
                typed = pc.cast(typed, field.type)
            cols[name] = typed
            cols[f"_unchanged_{name}"] = u
        else:
            # column absent in this relation version: null-fill (add_column
            # evolution rule)
            cols[name] = pa.nulls(n, field.type)
            cols[f"_unchanged_{name}"] = false_arr
    if lenient:
        # per-row count of fields that failed the typed cast — the
        # FieldError-list analogue (deserializer.rs:617-691); rows with
        # _cast_errors > 0 are the dead-letter set
        cols["_cast_errors"] = pa.array(err_count)
    return pa.table(cols)


def empty_typed(unified: pa.Schema) -> pa.Table:
    cols: dict = {}
    for c, t in [("source", pa.int32()), ("lsn", pa.int64()),
                 ("commit_lsn", pa.int64()), ("commit_ts_us", pa.int64()),
                 ("xid", pa.int64()), ("op", pa.string()),
                 ("rel_version", pa.int32())]:
        cols[c] = pa.array([], t)
    for f in unified:
        cols[f.name] = pa.array([], f.type)
        cols[f"_unchanged_{f.name}"] = pa.array([], pa.bool_())
    return pa.table(cols)


def project_envelope(envelope: pa.Table, registry: SchemaRegistry, oid: int,
                     lenient: bool = False) -> pa.Table:
    """Full envelope batch -> typed rows for one relation.

    DML rows are typed-projected; truncate rows are kept (null payload) so
    the apply stage sees them in-band; relation/message/origin/type control
    rows are dropped (the registry was built up front from sidecars or the
    control pre-scan; the stream remains self-describing either way).
    """
    unified = registry.unified_arrow_schema(oid)
    dml, trunc, _rel = split_envelope(envelope, oid)
    typed = project_dml(dml, registry, oid, lenient=lenient)
    if trunc.num_rows:
        n = trunc.num_rows
        cols: dict = {c: trunc[c] for c in CONTROL_COLS}
        for f in unified:
            cols[f.name] = pa.nulls(n, f.type)
            cols[f"_unchanged_{f.name}"] = pa.array(
                np.zeros(n, dtype=bool))
        if "_cast_errors" in typed.column_names:
            cols["_cast_errors"] = pa.array(np.zeros(n, dtype=np.int32))
        typed = pa.concat_tables([typed, pa.table(cols).select(
            typed.column_names)])
    return typed


def project_envelope_quarantine(envelope: pa.Table,
                                registry: SchemaRegistry, oid: int):
    """Lenient projection with a dead-letter SIDE CHANNEL — the repairable
    form of the FieldError-list contract
    (/root/reference/src/deserializer.rs:617-691): instead of reducing a
    failed row to a null cell + error count, the whole failing row is
    returned in RAW envelope form (text cells intact) so a reprocessing
    pass can repair the producer bug and replay it.

    -> (typed_clean, dl_envelope_rows): ``typed_clean`` is strictly typed
    (no ``_cast_errors`` column — every surviving row parsed fully);
    ``dl_envelope_rows`` keeps the envelope schema, one row per DML row
    with at least one failed column cast.  Truncate rows always ride the
    clean channel (they carry no castable payload).
    """
    unified = registry.unified_arrow_schema(oid)
    dml, trunc, _rel = split_envelope(envelope, oid)
    versions = sorted(set(dml["rel_version"].to_pylist())) \
        if dml.num_rows else []
    clean_parts: List[pa.Table] = []
    dl_parts: List[pa.Table] = []
    for v in versions:
        rv = registry.get(oid, v)
        sl = dml.filter(pc.equal(dml["rel_version"], v))
        typed = _project_version_slice(sl, rv, unified, lenient=True)
        bad = pc.fill_null(pc.greater(typed["_cast_errors"], 0), False)
        if pc.any(bad).as_py():
            dl_parts.append(sl.filter(bad))
            typed = typed.filter(pc.invert(bad))
        clean_parts.append(typed.drop_columns(["_cast_errors"]))
    if clean_parts:
        typed_clean = pa.concat_tables(clean_parts) \
            if len(clean_parts) > 1 else clean_parts[0]
    else:
        typed_clean = project_dml(dml, registry, oid, lenient=False)
    if trunc.num_rows:
        n = trunc.num_rows
        cols: dict = {c: trunc[c] for c in CONTROL_COLS}
        for f in unified:
            cols[f.name] = pa.nulls(n, f.type)
            cols[f"_unchanged_{f.name}"] = pa.array(
                np.zeros(n, dtype=bool))
        typed_clean = pa.concat_tables([typed_clean, pa.table(cols).select(
            typed_clean.column_names)])
    dl = pa.concat_tables(dl_parts) if dl_parts else dml.slice(0, 0)
    return typed_clean, dl


class ProjectStage:
    """Actor-pool stage: envelope batches -> typed change batches.

    The registry is fetched from the object store ONCE per actor
    (``__init__``), not per batch — broadcast-small-side pattern."""

    def __init__(self, registry_ref, oid: int, lenient: bool = False):
        import ray
        self.registry = ray.get(registry_ref) if not isinstance(
            registry_ref, SchemaRegistry) else registry_ref
        self.oid = oid
        self.lenient = lenient

    def __call__(self, batch: pa.Table) -> pa.Table:
        return project_envelope(batch, self.registry, self.oid,
                                lenient=self.lenient)


def project_dml(dml: pa.Table, registry: SchemaRegistry, oid: int,
                lenient: bool = False) -> pa.Table:
    """Envelope DML rows (single relation) -> typed rows on the unified schema.

    Slices by rel_version (each slice has a fixed tuple layout), projects
    each vectorized, concatenates on the unified schema.
    """
    unified = registry.unified_arrow_schema(oid)
    versions = sorted(set(dml["rel_version"].to_pylist())) if dml.num_rows else []
    if not versions:
        cols: dict = {c: dml[c] for c in CONTROL_COLS}
        for f in unified:
            cols[f.name] = pa.array([], f.type)
            cols[f"_unchanged_{f.name}"] = pa.array([], pa.bool_())
        return pa.table(cols)
    parts: List[pa.Table] = []
    for v in versions:
        rv = registry.get(oid, v)
        sl = dml.filter(pc.equal(dml["rel_version"], v))
        parts.append(_project_version_slice(sl, rv, unified, lenient))
    return pa.concat_tables(parts) if len(parts) > 1 else parts[0]
