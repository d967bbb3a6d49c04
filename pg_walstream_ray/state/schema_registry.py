"""Relation-schema registry + evolution rules.

The reference holds an ``FxHashMap<Oid, RelationInfo>`` inside
``ReplicationState`` (/root/reference/src/protocol.rs:560-602) and emits a
Relation change-event when a full column diff detects change
(protocol.rs:1430-1483).  Our stream is self-describing the same way:
``op='relation'`` envelope rows carry the schema as JSON ``meta``; this
registry rebuilds from those rows (so any stage — decode actor restart,
apply task — can reconstruct schema state by replaying the tiny relation
stream, SURVEY.md §2.4).

Evolution rules onto Arrow (SURVEY.md §1.4 / FIXTURES.md §4.8):
  - add column  -> null-fill existing rows
  - retype (widen int32->int64 etc.) -> pc.cast
  - rename      -> explicit mapping taken from the Relation diff (positional:
    same index, new name)
  - drop        -> column retained in the lake as nulls going forward
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

# Postgres type OID -> Arrow type for the typed projection edge.
PG_OID_TO_ARROW = {
    16: pa.bool_(),        # bool
    20: pa.int64(),        # int8
    21: pa.int16(),        # int2
    23: pa.int32(),        # int4
    25: pa.string(),       # text
    700: pa.float32(),     # float4
    701: pa.float64(),     # float8
    1043: pa.string(),     # varchar
    1114: pa.timestamp("us"),   # timestamp
    1184: pa.timestamp("us"),   # timestamptz (kept naive-UTC)
    17: pa.binary(),       # bytea
    114: pa.string(),      # json (kept as text, §1.2: nested types stay text)
    3802: pa.string(),     # jsonb
    1700: pa.string(),     # numeric: keep lossless text by default (pg
                           # numeric is unbounded); apps that know their
                           # precision can override this entry with a
                           # pa.decimal128(p, s) — functions/pgtext
                           # parse_pg_numeric handles the typed cast
    1082: pa.date32(),     # date ('YYYY-MM-DD' text form)
    2950: pa.string(),     # uuid (canonical hex text form)
    # array OIDs (1000 bool[], 1007 int4[], 1009 text[], 1022 float8[], ...)
    # intentionally absent: they default to lossless TEXT — exactly the
    # pgoutput representation the reference hands consumers
    # (integration-tests/complex_types.rs).  Apps wanting typed lists
    # override the OID with pa.list_(child) — functions/pgtext
    # parse_pg_array handles the cast, nested arrays included.
}


@dataclass(frozen=True)
class RelColumn:
    name: str
    type_oid: int
    type_modifier: int
    is_key: bool

    @property
    def arrow_type(self) -> pa.DataType:
        return PG_OID_TO_ARROW.get(self.type_oid, pa.string())


@dataclass(frozen=True)
class RelVersion:
    oid: int
    version: int
    namespace: str
    name: str
    replica_identity: str
    columns: Tuple[RelColumn, ...]
    diff: Optional[tuple]  # diff entries vs previous version (None = first)

    @property
    def key_columns(self) -> Tuple[str, ...]:
        return tuple(c.name for c in self.columns if c.is_key)

    def arrow_schema(self) -> pa.Schema:
        return pa.schema([(c.name, c.arrow_type) for c in self.columns])


def parse_relation_meta(meta_json: str) -> RelVersion:
    d = json.loads(meta_json)
    cols = tuple(RelColumn(c["name"], c["type_oid"], c["type_modifier"],
                           c["is_key"]) for c in d["columns"])
    diff = tuple(tuple(sorted(x.items())) for x in d["diff"]) if d.get("diff") else None
    return RelVersion(d["oid"], d["version"], d["namespace"], d["name"],
                      d["replica_identity"], cols, diff)


def relation_fingerprint(oid: int, namespace: str, name: str,
                         replica_identity: str, columns) -> tuple:
    """Content identity of one relation version — the exact fields
    relation_diff compares (stages/decode.py), so two Relation messages
    with equal fingerprints are the same version by construction.
    ``columns``: iterable of (name, type_oid, type_modifier, is_key)."""
    return (oid, namespace, name, replica_identity,
            tuple((n, int(t), int(m), bool(k)) for n, t, m, k in columns))


class SchemaRegistry:
    """(rel_oid, rel_version) -> RelVersion, built from relation rows."""

    def __init__(self):
        self._versions: Dict[Tuple[int, int], RelVersion] = {}

    def ingest_relation_rows(self, metas: List[str]) -> None:
        for m in metas:
            rv = parse_relation_meta(m)
            self._versions[(rv.oid, rv.version)] = rv

    def ingest_envelope(self, envelope: pa.Table) -> None:
        import pyarrow.compute as pc
        mask = pc.equal(envelope["op"], "relation")
        metas = envelope.filter(mask)["meta"].to_pylist()
        self.ingest_relation_rows(metas)

    def get(self, oid: int, version: int) -> RelVersion:
        return self._versions[(oid, version)]

    def maybe(self, oid: int, version: int) -> Optional[RelVersion]:
        return self._versions.get((oid, version))

    def versions_for(self, oid: int) -> List[RelVersion]:
        return sorted((v for (o, _), v in self._versions.items() if o == oid),
                      key=lambda v: v.version)

    def latest(self, oid: int) -> Optional[RelVersion]:
        vs = self.versions_for(oid)
        return vs[-1] if vs else None

    def merge(self, other: "SchemaRegistry") -> None:
        self._versions.update(other._versions)

    def version_map(self) -> Dict[tuple, int]:
        """fingerprint -> global version id, for seeding decoders.

        A decoder replaying ONE segment of a segmented archive sees only
        the Relation messages that segment re-sends; without this map it
        would number them by local arrival order (a v2-only segment's
        relation becomes "version 1"), silently de-syncing rel_version
        from the registry the typed projection uses.  Highest version
        wins on (theoretical) fingerprint collisions — identical layouts
        project identically either way."""
        out: Dict[tuple, int] = {}
        for (oid, ver) in sorted(self._versions):
            rv = self._versions[(oid, ver)]
            fp = relation_fingerprint(
                rv.oid, rv.namespace, rv.name, rv.replica_identity,
                ((c.name, c.type_oid, c.type_modifier, c.is_key)
                 for c in rv.columns))
            out[fp] = ver
        return out

    def unified_arrow_schema(self, oid: int) -> pa.Schema:
        """Union schema across all versions of a relation, with widening.

        add/rename/retype fold into one schema: renamed columns keep the
        NEWEST name (positional identity, per the Relation diff rule);
        retyped columns take the widest Arrow type via unify-with-cast.
        """
        versions = self.versions_for(oid)
        if not versions:
            raise KeyError(f"no versions for oid {oid}")
        # positional merge: walk versions in order, tracking per-position name
        fields: List[Tuple[str, pa.DataType]] = []
        for rv in versions:
            for i, c in enumerate(rv.columns):
                if i < len(fields):
                    name, typ = fields[i]
                    new_t = c.arrow_type
                    if new_t != typ:
                        typ = _widen(typ, new_t)
                    fields[i] = (c.name, typ)   # rename: newest name wins
                else:
                    fields.append((c.name, c.arrow_type))
        return pa.schema(fields)


_WIDEN_ORDER = [pa.int16(), pa.int32(), pa.int64(), pa.float32(), pa.float64()]


def _widen(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    if a == b:
        return a
    if a in _WIDEN_ORDER and b in _WIDEN_ORDER:
        return _WIDEN_ORDER[max(_WIDEN_ORDER.index(a), _WIDEN_ORDER.index(b))]
    return pa.string()  # lossless fallback
