"""Encode pipeline: token table → encoded chunk rows + codec manifest sidecar.

The Spark-first re-imagining of the reference's scan→decode→chunk→stream
dataflow (`src/orc/read.clj:65-112`, `src/orc/json.clj:48-101`), inverted into
encode direction per the north rule:

* the reference's reader thread + bounded channel (`src/orc/macro.clj:47-62`,
  `src/orc/read.clj:75`) become Spark executor tasks — real multi-node
  parallelism instead of one producer thread;
* its byte-limited JSON chunk governor (`src/orc/json.clj:80-91`: accumulate
  until ``byte-limit``, flush numbered chunk) becomes the byte-budget chunk
  flush inside ``mapInArrow``;
* its stream-metadata + header record (`src/orc/read.clj:89,93`) become the
  manifest sidecar: per-chunk codec records + per-partition completion rows
  (the checkpoint/lineage unit) + a run-metadata JSON.

Everything stays columnar: Arrow record batches in, numpy kernels, Arrow out —
no per-row Python anywhere (the reference's per-cell dispatch,
`src/orc/core.clj:34-43`, is the anti-pattern this engine exists to fix).

Physical strategy (round 2): the default "rowgroup" mode plans ``part_id``
from parquet footers (byte-balanced LPT bins of row groups) and fuses scan +
chunk + encode into ONE ``mapInArrow`` stage — ZERO shuffles, so at 100 TB
the token bytes go parquet → Arrow → kernels → chunk write and the only
cluster-shared resource is the object store.  The salted n_tok-quantile
repartition (skew.py) remains as ``scan="salted"`` / the ``df=`` path for
inputs whose row groups are themselves pathological.

Layout under ``out_dir``::

    chunks/part_id=N/*.parquet    encoded payload rows (one row per chunk×column)
    manifest/chunks/*.parquet     chunk records (everything but the payload)
    manifest/parts/*.parquet      partition completion markers (resume unit)
    run_meta.json                 run metadata (stream-metadata analog)
"""

from __future__ import annotations

import heapq
import json
import os
import time
import warnings
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import StringCol, crc32
from ..selector import encode_column
from . import fsio, pafs
from .skew import apply_plan, compute_plan

#: raw token bytes per chunk (the reference's byte-limit analog).  Round 4:
#: 8 MB → 32 MB after a sweep (8/16/32/64/128 MB at sf0.1): each 2× fewer
#: chunks amortizes one more ranked-dict build + selection guard per byte
#: (encode wall −30%, encoded bytes −2.4% from fewer stored dictionaries),
#: saturating once a chunk covers a whole row group.  32 MB keeps zone-map
#: pruning at ~row-group granularity and chunk offsets far below the int32
#: list-offset cap; per-task memory stays bounded by one row group.
DEFAULT_CHUNK_BYTES = 32 << 20
TARGET_PART_BYTES = 64 << 20  # raw bytes per partition (scale knob)

OUT_SCHEMA = pa.schema(
    [
        pa.field("chunk_id", pa.int64()),
        pa.field("seq", pa.int32()),
        pa.field("col", pa.string()),
        pa.field("codec", pa.string()),
        pa.field("meta", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("n_rows", pa.int32()),
        pa.field("raw_bytes", pa.int64()),
        pa.field("enc_bytes", pa.int64()),
        pa.field("crc", pa.int64()),
        pa.field("selection", pa.string()),
        pa.field("stats", pa.string()),
        pa.field("part_id", pa.int32()),
    ]
)

OUT_DDL = (
    "chunk_id long, seq int, col string, codec string, meta string, "
    "payload binary, n_rows int, raw_bytes long, enc_bytes long, crc long, "
    "selection string, stats string, part_id int"
)

#: physical columns of one encoded chunk; ``offsets`` is the int64 index that
#: flattens ``tokens`` (list layout = `src/orc/col.clj:114-116`)
CHUNK_COLS = ("doc_id", "source", "n_tok", "token_values", "offsets")

#: the fixed token-table schema (BASELINE input_hint) as a schema descriptor —
#: ``(name, kind)`` pairs, kind ∈ {str, int32, int64, float32, float64,
#: list32, list64}.  Since round 4 the engine encodes ANY flat schema of
#: these kinds (the analog of the reference's user-declared decode plan,
#: `src/orc/col.clj:184-204`: schema-driven kernel binding instead of a
#: hardcoded column list); round 5 adds the float kinds the reference's
#: dispatch table covers (`src/orc/col.clj:70-75,164-165`) — encoded over
#: their exact bit patterns, so the reference's NaN→nil normalization is
#: deliberately NOT replicated (bit-identity contract).
DEFAULT_SCHEMA = (
    ("doc_id", "str"), ("tokens", "list32"), ("n_tok", "int32"),
    ("source", "str"),
)

_KIND_NP = {"int32": np.int32, "int64": np.int64,
            "float32": np.float32, "float64": np.float64,
            "list32": np.int32, "list64": np.int64,
            "listf32": np.float32, "listf64": np.float64,
            "date32": np.int32, "ts_us": np.int64, "ts_us_utc": np.int64,
            "bool": np.int32}

#: float kind → the same-width unsigned view its bit patterns encode as
#: (scalar float columns AND the flattened values of float lists — the
#: embeddings shape, array<float>)
_FLOAT_U = {"float32": np.uint32, "float64": np.uint64,
            "listf32": np.uint32, "listf64": np.uint64}

#: scalar value kind → the legacy short list-kind name (kept so every store
#: encoded in rounds 1–5 stays decodable under its recorded descriptor);
#: every OTHER scalar kind spells its list as ``list<vk>`` (round 5:
#: lists of ANY scalar kind — str/bool/binary/temporal values flatten
#: through the same machinery as map values)
_LIST_LEGACY = {"int32": "list32", "int64": "list64",
                "float32": "listf32", "float64": "listf64"}
_LIST_VK = {v: k for k, v in _LIST_LEGACY.items()}


def list_value_kind(kind: str) -> str:
    """Scalar value kind of a list kind (legacy short names or the generic
    ``list<vk>`` spelling)."""
    if kind in _LIST_VK:
        return _LIST_VK[kind]
    if kind.startswith("list<") and kind.endswith(">"):
        return kind[5:-1]
    raise ValueError(f"not a list kind: {kind!r}")

#: kind → the int kind its storage encodes as (bit-exact reinterpret:
#: date32 = days since epoch, timestamp[us] = micros — the engine analog of
#: the reference's :date/:timestamp dispatch entries, `src/orc/col.clj:
#: 162,171`, except values stay typed instead of being formatted to
#: strings; delta/RLE/FOR codecs love days/micros.  Round 5 adds ``bool``
#: as int32 0/1 — the reference reads ``:boolean`` as long
#: (`src/orc/col.clj:161`); RLE crushes runs, 1-bit FOR handles random
#: flags at ~1 bit/value)
TEMPORAL_STORAGE = {"date32": "int32", "ts_us": "int64", "ts_us_utc": "int64",
                    "bool": "int32"}


def _temporal_to_storage(arr, kind: str):
    """Temporal/bool arrow column → its int storage (days / micros / 0-1).
    ns-unit timestamps (how pyarrow reads Spark's INT96) normalize to
    micros via a SAFE cast — genuinely sub-microsecond values raise instead
    of silently truncating (Spark timestamps are micro-precision, so
    Spark-written data always passes)."""
    if kind in ("date32", "bool"):
        return pc.cast(arr, pa.int32())
    tz = "UTC" if kind == "ts_us_utc" else None
    return pc.cast(pc.cast(arr, pa.timestamp("us", tz=tz)), pa.int64())


def list_payload_names(name: str) -> tuple[str, str]:
    """Physical payload columns backing a list column.  The default token
    table keeps its historical names (token_values/offsets) so every store
    encoded before round 4 stays decodable byte-for-byte."""
    if name == "tokens":
        return "token_values", "offsets"
    return f"{name}__values", f"{name}__offsets"


def struct_fields(kind: str) -> list[tuple[str, str]]:
    """Parse a ``struct<f1:k1,f2:k2>`` kind string → [(field, kind), ...].

    Recursive struct shredding (round 5): the engine analog of the
    reference's recursive struct decode (`src/orc/col.clj:83-92`) — each
    scalar leaf becomes its own payload column, so field access at decode
    is a column prune, not a row pivot.  A field kind may itself be a
    ``struct<...>``, so the split is bracket-aware: commas inside a nested
    kind don't separate fields."""
    inner = kind[len("struct<"):-1]
    parts: list[str] = []
    depth = start = 0
    for i, ch in enumerate(inner):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(inner[start:i])
            start = i + 1
    parts.append(inner[start:])
    return [tuple(p.split(":", 1)) for p in parts if p]


def struct_payload_names(name: str, kind: str) -> tuple[str, ...]:
    """Physical payload columns backing a struct column: one ``name__field``
    per shredded scalar leaf plus ``name__present`` (struct-level validity
    as a 0/1 column — RLE crushes it to a few bytes on mostly-valid data).
    Nested struct fields recurse with a ``parent__child`` prefix and carry
    their OWN present column, so ``s = null`` / ``s.b = null`` /
    ``s.b = {c: null}`` stay distinguishable after the round trip."""
    out: list[str] = []
    for f, fk in struct_fields(kind):
        if fk.startswith("struct"):
            out.extend(struct_payload_names(f"{name}__{f}", fk))
        else:
            out.append(f"{name}__{f}")
    return tuple(out) + (f"{name}__present",)


def map_kinds(kind: str) -> tuple[str, str]:
    """Parse a ``map<kkind,vkind>`` kind string → (key kind, value kind).

    Maps shred like lists-of-pairs (Arrow's own map layout): a flat keys
    payload, a flat values payload, and an offsets index — the engine
    analog of the reference's per-row map decode (`src/orc/col.clj:94-108`),
    done once per chunk instead of once per cell."""
    kk, vk = kind[len("map<"):-1].split(",", 1)
    return kk, vk


def map_payload_names(name: str) -> tuple[str, str, str]:
    """Physical payload columns backing a map column: flattened keys,
    flattened values, and the offsets index (which also carries the
    map-level validity bitmap, exactly like list columns)."""
    return f"{name}__keys", f"{name}__mapvalues", f"{name}__offsets"


def physical_cols(schema) -> tuple[str, ...]:
    out: list[str] = []
    for name, kind in schema:
        if kind.startswith("list"):
            out.extend(list_payload_names(name))
        elif kind.startswith("struct"):
            out.extend(struct_payload_names(name, kind))
        elif kind.startswith("map"):
            out.extend(map_payload_names(name))
        else:
            out.append(name)
    return tuple(out)


def _struct_kind(t, path: str, scalar_kind) -> str:
    """Kind string for a struct type, recursing into nested struct fields
    (any depth — the engine analog of the reference's recursive struct
    decode, `src/orc/col.clj:83-92`).  Plan-time throw on unsupported leaf
    types; field names may not contain the kind-string delimiters."""
    fks = []
    for i in range(t.num_fields):
        f = t.field(i)
        fk = scalar_kind(f.type)
        if fk is None and pa.types.is_struct(f.type):
            fk = _struct_kind(f.type, f"{path}.{f.name}", scalar_kind)
        if fk is None:
            raise ValueError(
                f"unsupported struct field type {f.type} for "
                f"{path}.{f.name}: struct shredding takes scalar fields "
                "(str/int/float/bool/binary/temporal) or nested structs "
                "of them"
            )
        if any(ch in f.name for ch in ":,<>."):
            raise ValueError(
                f"struct field name {f.name!r} may not contain "
                "':', ',', '<', '>' (kind-string delimiters) or "
                "'.' (the predicate/DDL field-path separator)"
            )
        fks.append(f"{f.name}:{fk}")
    if not fks:
        raise ValueError(f"cannot encode empty struct column {path!r}")
    return f"struct<{','.join(fks)}>"


def derive_schema(arrow_schema) -> list[tuple[str, str]]:
    """Schema descriptor from a parquet/Arrow schema — plan-time throw on
    unsupported types, like the reference's handler compiler
    (`src/orc/col.clj:200-203`)."""
    import pyarrow as _pa

    def scalar_kind(t) -> str | None:
        if _pa.types.is_string(t) or _pa.types.is_large_string(t):
            return "str"
        if _pa.types.is_boolean(t):
            return "bool"
        if _pa.types.is_binary(t) or _pa.types.is_large_binary(t):
            return "binary"
        if t in (_pa.int32(), _pa.int16(), _pa.int8()):
            return "int32"
        if t == _pa.int64():
            return "int64"
        if t == _pa.float32():
            return "float32"
        if t == _pa.float64():
            return "float64"
        if t == _pa.date32():
            return "date32"
        if _pa.types.is_timestamp(t):
            if t.unit not in ("us", "ns"):
                raise ValueError(
                    f"unsupported timestamp unit {t.unit!r}: parquet "
                    "timestamps are micros (ns = INT96 reads, coerced "
                    "losslessly); cast before encoding"
                )
            if t.tz not in (None, "UTC"):
                raise ValueError(
                    f"unsupported timestamp zone {t.tz!r}: store UTC "
                    "(parquet isAdjustedToUTC) or naive; cast before encoding"
                )
            return "ts_us_utc" if t.tz else "ts_us"
        return None

    out: list[tuple[str, str]] = []
    for field in arrow_schema:
        t = field.type
        sk = scalar_kind(t)
        if sk is not None:
            out.append((field.name, sk))
        elif _pa.types.is_struct(t):
            out.append((field.name, _struct_kind(t, field.name, scalar_kind)))
        elif _pa.types.is_map(t):
            kk = scalar_kind(t.key_type)
            vk = scalar_kind(t.item_type)
            if kk is None or kk.startswith("float"):
                raise ValueError(
                    f"unsupported map key type {t.key_type} for column "
                    f"{field.name!r}: keys shred as str/int/temporal"
                )
            if vk is None:
                raise ValueError(
                    f"unsupported map value type {t.item_type} for column "
                    f"{field.name!r}: values shred as scalar kinds"
                )
            out.append((field.name, f"map<{kk},{vk}>"))
        elif _pa.types.is_list(t) or _pa.types.is_large_list(t):
            vk = scalar_kind(t.value_type)
            if vk is None:
                raise ValueError(
                    f"unsupported list value type {t.value_type} for "
                    f"column {field.name!r}: list values take any scalar "
                    "kind (str/int/float/bool/binary/temporal)"
                )
            out.append((field.name, _LIST_LEGACY.get(vk, f"list<{vk}>")))
        else:
            raise ValueError(
                f"unsupported column type {t} for {field.name!r}: engine "
                "schemas are flat str/int32/int64/float/double/"
                "array<int>/array<bigint>/struct<scalar fields>"
            )
    if not out:
        raise ValueError("cannot encode an empty schema")
    phys = physical_cols(out)
    if len(set(phys)) != len(phys):
        raise ValueError(
            "physical payload name collision (a column named like another "
            f"column's shredded field?): {sorted(phys)}"
        )
    return out


def _flatten_list(col, dtype) -> np.ndarray:
    """Flatten per chunk, NOT combine_chunks().flatten(): combining copies
    the whole list column (~2x the chunk's token bytes in memory traffic),
    while per-chunk flatten() is an offset-aware zero-copy view — one
    concatenate only when the table actually holds multiple chunks."""
    parts = [np.asarray(c.flatten(), dtype=dtype) for c in col.chunks]
    if len(parts) == 1:
        return parts[0]
    return np.concatenate(parts) if parts else np.empty(0, dtype=dtype)


def _scalar_payload(arr: pa.Array, kind: str):
    """(col_obj, kindtag, raw_bytes, valid, mm) for one flat scalar payload
    column (map keys / map values).  Caller casts temporal kinds to their
    storage ints first; nulls get the standard validity-bitmap treatment
    (zero/empty fill so payload bytes are deterministic)."""
    nulls = arr.null_count
    valid = np.asarray(arr.is_valid()) if nulls else None
    if kind in ("str", "binary"):
        fill = "" if kind == "str" else b""
        col = StringCol.from_arrow(pc.fill_null(arr, fill) if nulls else arr)
        if kind == "binary":  # bytes aren't JSON — stat-less (kept by pruner)
            return col, "str", 0, valid, {"min": None, "max": None}
        lohi = pc.min_max(arr)
        return col, "str", 0, valid, {
            "min": lohi["min"].as_py(), "max": lohi["max"].as_py()}
    if kind in ("int32", "int64"):
        a = np.asarray(
            pc.fill_null(arr, 0) if nulls else arr, dtype=_KIND_NP[kind]
        )
        lohi = pc.min_max(arr)
        return a, "int", a.nbytes, valid, {
            "min": lohi["min"].as_py(), "max": lohi["max"].as_py()}
    a = np.asarray(
        pc.fill_null(arr, 0.0) if nulls else arr, dtype=_KIND_NP[kind]
    )
    fin = a[valid] if valid is not None else a
    mmv = (
        {"min": float(fin.min()), "max": float(fin.max())}
        if len(fin) and bool(np.isfinite(fin).all())
        else {"min": None, "max": None}
    )
    return a.view(_FLOAT_U[kind]), "float", a.nbytes, valid, mmv


def _shred_struct(name: str, kind: str, col_s: pa.Array,
                  pvalid: "np.ndarray | None", n: int,
                  columns: dict, valids: dict, mm: dict) -> None:
    """Shred one (possibly nested) struct column into flat scalar payloads.

    Emits ``name__present`` (0/1 struct-level validity, RLE-friendly) plus
    one payload per field; nested struct fields recurse under a
    ``name__field`` prefix with their OWN present column, so after the
    round trip ``s = null``, ``s.b = null`` and ``s.b = {c: null}`` stay
    distinguishable.  ``pvalid`` is the conjunction of every ancestor's
    validity (None = all valid); masking is cumulative, so a leaf under a
    null ancestor stores null and payload bytes stay deterministic."""
    pres = (
        pvalid if pvalid is not None else np.ones(n, dtype=bool)
    ).astype(np.int32)
    pres_name = f"{name}__present"
    columns[pres_name] = (pres, "int", pres.nbytes)
    valids[pres_name] = None
    mm[pres_name] = {
        "min": int(pres.min()) if n else None,
        "max": int(pres.max()) if n else None,
    }
    for fi, (fname, fkind) in enumerate(struct_fields(kind)):
        child = pc.struct_field(col_s, fi)
        p_name = f"{name}__{fname}"
        v = np.asarray(child.is_valid())
        if pvalid is not None:
            v &= pvalid
        all_valid = bool(v.all()) if n else True
        if fkind.startswith("struct"):
            # no if_else copy here: the recursion masks every LEAF with the
            # same conjunct validity, so materializing a masked copy of the
            # whole subtree per level would only burn memory bandwidth
            _shred_struct(p_name, fkind, child,
                          None if all_valid else v, n, columns, valids, mm)
            continue
        # scalar leaves only: computing the masked copy above the struct
        # branch materialized (and discarded) a masked copy of every nested
        # subtree (round-5 advice)
        masked = child if all_valid else pc.if_else(
            pa.array(v), child, pa.scalar(None, child.type)
        )
        if fkind in TEMPORAL_STORAGE:  # same reinterpret as top-level
            masked = _temporal_to_storage(masked, fkind)
            fkind = TEMPORAL_STORAGE[fkind]
        obj, ktag, raw, v_, mmv = _scalar_payload(masked, fkind)
        columns[p_name] = (obj, ktag, raw)
        valids[p_name] = v_
        mm[p_name] = mmv


def _map_as_list(col_m: pa.Array) -> pa.Array:
    """Zero-copy view of a MapArray as list<struct<key,value>> so the
    list machinery (null-skipping flatten, list_value_length) applies."""
    mt = col_m.type
    return col_m.cast(pa.list_(pa.struct([
        pa.field(mt.key_field.name, mt.key_field.type, nullable=False),
        pa.field(mt.item_field.name, mt.item_field.type,
                 nullable=mt.item_field.nullable),
    ])))


def _encode_chunk_rows(tbl: pa.Table, part_id: int, seq: int,
                       cache: dict | None = None,
                       policy: str = "size",
                       schema=DEFAULT_SCHEMA) -> dict[str, list]:
    """Encode one chunk's physical columns → manifest/payload rows.

    ``schema`` drives kernel binding (the reference's user-declared decode
    plan, inverted): each str column becomes one StringCol payload, each int
    column one int payload, each list column a flat values payload + an
    int64 offsets payload (list layout = `src/orc/col.clj:114-116`).

    ``cache`` is the per-partition selection cache (selector.encode_column):
    chunk 0 of a partition pays full selection + FSST table construction,
    later chunks reuse it — selection was ~half the string encode time."""
    n = tbl.num_rows
    # per-chunk per-column min/max — the ORC column-statistics analog
    # (zone maps): recorded in the manifest so decode can prune chunks
    # against predicates without touching payloads
    columns: dict[str, tuple[object, str, int]] = {}
    #: per-payload validity (bool[n], None = all valid).  NULLs are encoded
    #: as a packed little-endian validity bitmap prefixed to the payload
    #: (the ORC/Arrow PRESENT-stream model) + a zero/empty fill value the
    #: kernels see; non-null chunks carry no bitmap and stay BYTE-IDENTICAL
    #: to stores written before round 5.  np.asarray of a nulled Arrow
    #: array would otherwise yield silent INT_MIN sentinels — fill first.
    valids: dict[str, np.ndarray | None] = {}
    mm: dict[str, dict] = {}
    for name, kind in schema:
        col_raw = tbl.column(name)
        if kind in TEMPORAL_STORAGE:
            # exact reinterpret (days / micros) → the plain int path; the
            # descriptor keeps the temporal kind so decode restores the
            # Arrow type over the SAME storage values
            col_raw = _temporal_to_storage(col_raw, kind)
            kind = TEMPORAL_STORAGE[kind]
        col_c = col_raw.combine_chunks() if (
            col_raw.null_count or kind.startswith("list")
        ) else None
        nulls = col_raw.null_count
        valid = np.asarray(col_c.is_valid()) if nulls else None
        if kind in ("str", "binary"):
            arr_c = col_c if col_c is not None else col_raw.combine_chunks()
            col = StringCol.from_arrow(
                pc.fill_null(arr_c, "" if kind == "str" else b"")
                if nulls else arr_c
            )
            columns[name] = (col, "str", 0)
            valids[name] = valid
            if kind == "binary":
                # bytes aren't JSON-safe manifest stats — stat-less chunk
                # (conservatively kept by the zone-map pruner)
                mm[name] = {"min": None, "max": None}
            else:
                lohi = pc.min_max(col_raw)  # skips nulls
                mm[name] = {
                    "min": lohi["min"].as_py(), "max": lohi["max"].as_py()}
        elif kind in ("int32", "int64"):
            if nulls:
                arr = np.asarray(pc.fill_null(col_c, 0), dtype=_KIND_NP[kind])
                lohi = pc.min_max(col_c)
                mn, mx = lohi["min"].as_py(), lohi["max"].as_py()
            else:
                arr = np.asarray(
                    col_raw.combine_chunks(), dtype=_KIND_NP[kind]
                )
                mn = int(arr.min()) if n else None
                mx = int(arr.max()) if n else None
            columns[name] = (arr, "int", arr.nbytes)
            valids[name] = valid
            mm[name] = {"min": mn, "max": mx}
        elif kind in ("float32", "float64"):
            if nulls:
                arr = np.asarray(
                    pc.fill_null(col_c, 0.0), dtype=_KIND_NP[kind]
                )
                fin = arr[valid]
            else:
                arr = np.asarray(
                    col_raw.combine_chunks(), dtype=_KIND_NP[kind]
                )
                fin = arr
            # kernels see the exact bit pattern (uint view) — NaN payload
            # bits round-trip untouched; the reference's NaN→nil
            # normalization (`src/orc/col.clj:73-74`) is NOT replicated
            columns[name] = (arr.view(_FLOAT_U[kind]), "float", arr.nbytes)
            valids[name] = valid
            if len(fin) and bool(np.isfinite(fin).all()):
                mm[name] = {"min": float(fin.min()), "max": float(fin.max())}
            else:
                # NaN/Inf aren't strict JSON and NaN breaks ordered zone
                # maps (Spark sorts NaN greatest) — stat-less chunks are
                # conservatively kept by the pruner
                mm[name] = {"min": None, "max": None}
        elif kind.startswith("struct"):
            # STRUCT SHREDDING (round 5, recursive): one payload column per
            # scalar leaf + a 0/1 present column per struct LEVEL.  Leaf
            # validity stored per child = child-valid AND every-ancestor-
            # valid (a value under a null ancestor is not observable data —
            # and its Arrow buffer bytes are unspecified, so null-mask it
            # for deterministic payloads).
            col_s = tbl.column(name).combine_chunks()
            pvalid = np.asarray(col_s.is_valid()) if nulls else None
            _shred_struct(name, kind, col_s, pvalid, n, columns, valids, mm)
        elif kind.startswith("map"):
            # MAP SHREDDING (round 5): flat keys + flat values + offsets —
            # Arrow's own map layout, chunk-vectorized (the reference walks
            # map cells per row, `src/orc/col.clj:94-108`).  Null entries →
            # length 0 (ghost values dropped by the list-view flatten);
            # map-level validity rides on the offsets payload like lists.
            kk, vk = map_kinds(kind)
            k_name, v_name, o_name = map_payload_names(name)
            col_l = _map_as_list(col_raw.combine_chunks())
            entries = col_l.flatten()
            lens = np.asarray(
                pc.fill_null(pc.list_value_length(col_l), 0), dtype=np.int64
            )
            offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            keys = pc.struct_field(entries, 0)
            vals = pc.struct_field(entries, 1)
            if keys.null_count:
                raise ValueError(
                    f"map column {name!r} holds null keys (Arrow forbids)"
                )
            for p_name, child, ck in (
                (k_name, keys, kk), (v_name, vals, vk)
            ):
                if ck in TEMPORAL_STORAGE:
                    child = _temporal_to_storage(child, ck)
                    ck = TEMPORAL_STORAGE[ck]
                obj, ktag, raw, v_, mmv = _scalar_payload(child, ck)
                columns[p_name] = (obj, ktag, raw)
                valids[p_name] = v_
                mm[p_name] = mmv
            columns[o_name] = (offsets, "int", offsets.nbytes)
            valids[o_name] = valid
            mm[o_name] = {"min": 0, "max": int(offsets[-1])}
        elif kind not in _KIND_NP:  # generic list<vk>: str/bool/binary/
            # temporal values flatten through the same scalar-payload
            # machinery as map values; offsets carry list-level validity
            v_name, o_name = list_payload_names(name)
            vk = list_value_kind(kind)
            col_l = (
                col_c if col_c is not None
                else tbl.column(name).combine_chunks()
            )
            values = col_l.flatten()
            lens = np.asarray(
                pc.fill_null(pc.list_value_length(col_l), 0), dtype=np.int64
            )
            if vk in TEMPORAL_STORAGE:
                values = _temporal_to_storage(values, vk)
                vk = TEMPORAL_STORAGE[vk]
            obj, ktag, raw, v_valid, mmv = _scalar_payload(values, vk)
            offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            columns[v_name] = (obj, ktag, raw)
            columns[o_name] = (offsets, "int", offsets.nbytes)
            valids[v_name] = v_valid
            valids[o_name] = valid
            mm[v_name] = mmv
            mm[o_name] = {"min": 0, "max": int(offsets[-1])}
        else:  # list32 / list64 / listf32 / listf64 (numeric fast path)
            v_name, o_name = list_payload_names(name)
            is_float = kind in _FLOAT_U
            vals_nulls = (
                col_c.flatten().null_count if col_c is not None else 0
            )
            if nulls or vals_nulls:
                # null list entries → length 0 (their ghost values are not
                # logical data; flatten() already skips them); null VALUES
                # inside lists get their own validity bitmap + zero fill
                values = col_c.flatten()
                lens = np.asarray(
                    pc.fill_null(pc.list_value_length(col_c), 0),
                    dtype=np.int64,
                )
                v_valid = (
                    np.asarray(values.is_valid()) if vals_nulls else None
                )
                flat = np.asarray(
                    pc.fill_null(values, 0) if vals_nulls else values,
                    dtype=_KIND_NP[kind],
                )
            else:
                flat = _flatten_list(tbl.column(name), _KIND_NP[kind])
                lens = np.asarray(
                    pc.list_value_length(tbl.column(name)).combine_chunks(),
                    dtype=np.int64,
                )
                v_valid = None
            if is_float:
                # same contract as scalar floats: kernels see the exact bit
                # pattern (NaN payloads round-trip); NaN/Inf values make the
                # chunk stat-less (NaN breaks ordered zone maps and isn't
                # strict JSON) — conservatively kept by the pruner
                fin = flat[v_valid] if v_valid is not None else flat
                if len(fin) and bool(np.isfinite(fin).all()):
                    v_mn, v_mx = float(fin.min()), float(fin.max())
                else:
                    v_mn = v_mx = None
            elif v_valid is not None:
                vals = flat[v_valid]
                v_mn = int(vals.min()) if len(vals) else None
                v_mx = int(vals.max()) if len(vals) else None
            else:
                v_mn = int(flat.min()) if len(flat) else None
                v_mx = int(flat.max()) if len(flat) else None
            offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            columns[v_name] = (
                (flat.view(_FLOAT_U[kind]), "float", flat.nbytes)
                if is_float else (flat, "int", flat.nbytes)
            )
            columns[o_name] = (offsets, "int", offsets.nbytes)
            # list-level validity rides on the offsets payload
            valids[v_name] = v_valid
            valids[o_name] = valid
            mm[v_name] = {"min": v_mn, "max": v_mx}
            mm[o_name] = {"min": 0, "max": int(offsets[-1])}
    chunk_id = (part_id << 20) | seq

    rows: dict[str, list] = {k.name: [] for k in OUT_SCHEMA}
    for col_name, (col, kind, raw) in columns.items():
        if kind == "str":
            raw = len(col.data) + col.offsets.nbytes
        payload, meta, selection = encode_column(
            col, kind, cache, col_name, policy
        )
        v = valids.get(col_name)
        if v is not None:
            # packed little-endian = Arrow validity-buffer bit order, so
            # decode can hand the bytes straight to Array.from_buffers
            vb = np.packbits(v, bitorder="little").tobytes()
            payload = vb + payload
            meta = dict(meta)
            meta["valid"] = len(vb)
        rows["chunk_id"].append(chunk_id)
        rows["seq"].append(seq)
        rows["col"].append(col_name)
        rows["codec"].append(selection["codec"])
        rows["meta"].append(json.dumps(meta, separators=(",", ":")))
        rows["payload"].append(payload)
        rows["n_rows"].append(n)
        rows["raw_bytes"].append(int(raw))
        rows["enc_bytes"].append(len(payload))
        rows["crc"].append(crc32(payload))
        rows["selection"].append(json.dumps(selection, separators=(",", ":")))
        rows["stats"].append(json.dumps(mm[col_name], separators=(",", ":")))
        rows["part_id"].append(part_id)
    return rows


def _iter_part_slices(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[tuple[int, pa.RecordBatch]]:
    """Split incoming batches at part_id boundaries (input is sorted by
    part_id within the Spark partition, so boundaries are contiguous)."""
    for batch in batches:
        if batch.num_rows == 0:
            continue
        part_ids = np.asarray(batch.column(batch.schema.get_field_index("part_id")))
        cuts = np.flatnonzero(np.diff(part_ids) != 0) + 1
        edges = np.concatenate([[0], cuts, [batch.num_rows]])
        for lo, hi in zip(edges[:-1], edges[1:]):
            yield int(part_ids[lo]), batch.slice(lo, hi - lo)


def make_encoder(chunk_bytes: int = DEFAULT_CHUNK_BYTES,
                 policy: str = "size"):
    """Build the mapInArrow function: batches → encoded chunk rows.

    Accumulates batches until the raw token-byte budget is hit, then flushes a
    chunk — the reference's byte-limited governor (`src/orc/json.clj:87-91`).
    Buffers are kept **per part_id** (a task may receive several part_ids when
    the hash repartition collides), so no within-partition sort is needed —
    the sort cost a third of the shuffle wall time and bought nothing.
    Chunks never span a part_id (the resume/lineage unit).
    """

    def encode_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pafs.clamp_arrow_threads()
        bufs: dict[int, list[pa.RecordBatch]] = {}
        buf_bytes: dict[int, int] = {}
        seqs: dict[int, int] = {}
        caches: dict[int, dict] = {}

        def flush(part_id: int) -> Iterator[pa.RecordBatch]:
            buf = bufs.get(part_id)
            if not buf:
                return
            tbl = pa.Table.from_batches(buf)
            rows = _encode_chunk_rows(
                tbl, part_id, seqs.get(part_id, 0),
                caches.setdefault(part_id, {}), policy,
            )
            seqs[part_id] = seqs.get(part_id, 0) + 1
            bufs[part_id], buf_bytes[part_id] = [], 0
            yield pa.RecordBatch.from_arrays(
                [pa.array(rows[f.name], type=f.type) for f in OUT_SCHEMA],
                schema=OUT_SCHEMA,
            )

        for part_id, batch in _iter_part_slices(batches):
            # split oversized slices on the token-byte budget
            n_tok = np.asarray(batch.column(batch.schema.get_field_index("n_tok")))
            tok_bytes = n_tok.astype(np.int64) * 4
            lo = 0
            while lo < batch.num_rows:
                csum = np.cumsum(tok_bytes[lo:])
                room = chunk_bytes - buf_bytes.get(part_id, 0)
                hi = lo + max(1, int(np.searchsorted(csum, room, side="right")))
                hi = min(hi, batch.num_rows)
                bufs.setdefault(part_id, []).append(batch.slice(lo, hi - lo))
                buf_bytes[part_id] = buf_bytes.get(part_id, 0) + int(
                    tok_bytes[lo:hi].sum()
                )
                if buf_bytes[part_id] >= chunk_bytes:
                    yield from flush(part_id)
                lo = hi
        for part_id in list(bufs):
            yield from flush(part_id)

    return encode_partition


#: scan-stage output: the token table plus the plan-assigned partition id
SCAN_DDL = "doc_id string, tokens array<int>, n_tok int, source string, part_id int"


def _pyarrow_source(
    input_path: str | None, filesystem=None
) -> tuple[object | None, list[str] | None, str, str | None]:
    """``(pyarrow_fs, files, fmt, degraded_reason)`` for an input location.

    The fused-scan fast path engages whenever pyarrow can serve the location
    — local paths, ``file://``/``s3://``/``s3a://``/``gs://``/``hdfs://``
    URIs (pafs.resolve), or an explicit ``filesystem=`` object.  ``fmt`` is
    ``"parquet"`` or ``"orc"`` (the reference's own on-disk format — parity
    with its S3A ORC flow, `/root/reference/src/orc/read.clj:27-49`); a
    location holding BOTH takes the parquet files and WARNS — fixture dirs
    keep an ORC reference copy next to the parquet data (datagen's
    ``with_orc_reference``), and silently raising here would reject inputs
    every prior round accepted.  Returns ``(None, None, fmt, reason)`` when
    pyarrow can't serve it
    (unknown scheme, unreachable store, no parquet/orc files): the caller
    falls back to the JVM scan and RECORDS the reason — at 100 TB a silent
    fallback moves every token byte through a shuffle the operator never
    asked for."""
    if input_path is None:
        return None, None, "parquet", None
    try:
        fs, path = pafs.resolve(input_path, filesystem)
        files = pafs.list_parquet(fs, path)
        orc_files = pafs.list_orc(fs, path)
    except Exception as e:
        return None, None, "parquet", (
            f"pyarrow.fs cannot serve {input_path!r}: {e}")
    if files and orc_files:
        import warnings

        warnings.warn(
            f"{input_path!r} holds both .parquet and .orc files; encoding "
            f"the {len(files)} parquet file(s) and ignoring the "
            f"{len(orc_files)} .orc file(s) — pass the format's "
            "subdirectory to encode the ORC copy instead"
        )
        return fs, files, "parquet", None
    if orc_files:
        return fs, orc_files, "orc", None
    if not files:
        return None, None, "parquet", (
            f"no .parquet or .orc files under {input_path!r}")
    return fs, files, "parquet", None


def _jvm_fmt_sniff(spark, path: str, default: str = "parquet") -> str:
    """Input format for the DEGRADED path (pyarrow cannot serve the store,
    so the pyarrow listing never ran): ask the JVM Hadoop FS — it CAN reach
    the store, or the JVM scan wouldn't work either.  Without this,
    scan="jvm" over an ORC location pyarrow can't reach would run
    spark.read.parquet and fail with an unrelated schema error."""
    try:
        if path.endswith(".orc"):
            return "orc"
        from . import fsio

        fs, jpath = fsio._fs(spark, path)
        it = fs.listFiles(jpath, True)
        for _ in range(1000):  # bounded: one format decides it
            if not it.hasNext():
                break
            name = it.next().getPath().getName()
            if name.endswith(".orc"):
                return "orc"
            if name.endswith(".parquet"):
                return "parquet"
    except Exception:
        pass
    return default


def _lpt_pack(units: list[tuple], n_bins: int) -> list[list]:
    """Longest-processing-time bin packing: units ``(weight, *payload)`` →
    ``n_bins`` lists of payloads.  Heap-based bin selection — O(log bins)
    per unit, so planning stays driver-cheap at the documented target
    (~10^6 row-group units across thousands of bins; a linear
    ``loads.index(min(loads))`` scan there is minutes of driver time)."""
    bins: list[list] = [[] for _ in range(n_bins)]
    heap = [(0.0, j) for j in range(n_bins)]
    for unit in sorted(units, key=lambda u: u[0], reverse=True):
        load, j = heapq.heappop(heap)
        bins[j].append(list(unit[1:]))
        heapq.heappush(heap, (load + float(unit[0]), j))
    return bins


def _row_group_assignments(
    files: list[str], n_tasks: int, fs=None
) -> list[list[tuple[str, int]]]:
    """Greedy-balance (file, row_group) units across scan tasks by byte size
    — row groups are the parquet read unit, so this is the scan's skew
    control (footer metadata only, no data read)."""
    import pyarrow.parquet as pq

    rgs = []
    for f in files:
        md = pq.read_metadata(f, filesystem=fs)
        for i in range(md.num_row_groups):
            rgs.append((md.row_group(i).total_byte_size, f, i))
    if not rgs:
        return []
    return _lpt_pack(rgs, max(1, min(n_tasks, len(rgs))))


def _rowgroup_plan(files: list[str], n_partitions: int,
                   explicit: bool, fs=None) -> dict:
    """Zero-shuffle partition plan: ``part_id`` = a byte-balanced bin of
    parquet row groups, so scan + encode run in ONE ``mapInArrow`` stage
    with no repartition — at 100 TB the token bytes never touch the shuffle.

    Skew control happens here instead of the salted repartition: units are
    (file, row_group, row_lo, row_hi) weighted by the footer's uncompressed
    byte size and LPT-packed into ``min(n_partitions, n_units)`` bins, so no
    task receives a pathological long-sequence hot partition (footer
    metadata only — no data read).  When the caller *explicitly* asks for
    more partitions than there are row groups (tests / tiny inputs), units
    are split by row ranges; each split re-reads its row group, so the
    automatic default never splits.
    """
    import pyarrow.parquet as pq

    def footer_units(f: str):
        """(schema, [unit, ...]) for one file — pure metadata, no data read."""
        if f.endswith(".orc"):
            # ORC footers don't expose per-stripe byte/row counts through
            # pyarrow, so stripes weigh file_bytes/nstripes — writers target
            # a fixed stripe size, so uniform-within-file is the honest
            # footer-only estimate; cross-file skew is still LPT-balanced.
            # hi=-1 = "the whole stripe" (the encoder skips the slice).
            wfs, wpath = (fs, f) if fs is not None else pafs.resolve(f)
            h = pafs.OrcInput(wfs.open_input_file(wpath))
            try:
                fsize = float(wfs.get_file_info(wpath).size or 0)
                w = fsize / max(1, h.nstripes)
                return h.schema, [
                    (w, f, i, 0, -1) for i in range(h.nstripes)
                ]
            finally:
                h.close()
        md = pq.read_metadata(f, filesystem=fs)
        return md.schema.to_arrow_schema(), [
            (float(md.row_group(i).total_byte_size), f, i, 0,
             md.row_group(i).num_rows)
            for i in range(md.num_row_groups)
        ]

    # footer fetches are tiny metadata reads dominated by per-request
    # latency (an object-store GET each): at 100k input files a serial
    # driver loop IS the planning bottleneck, so fetch concurrently
    # (pyarrow releases the GIL on I/O) and reassemble in file order —
    # plan output stays byte-deterministic
    if len(files) > 4:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(16, len(files))) as pool:
            per_file = list(pool.map(footer_units, files))
    else:
        per_file = [footer_units(f) for f in files]

    units: list[tuple[float, str, int, int, int]] = []  # weight,f,rg,lo,hi
    ref_schema = ref_file = None
    for f, (schema, file_units) in zip(files, per_file):
        # plan-time schema homogeneity (footers are read here anyway): a
        # stray file with a different schema would otherwise fail mid-encode
        # in whichever task drew it, with half the store already written.
        # Compared as Arrow schemas so a parquet plan and an ORC plan use
        # one notion of "same".
        if ref_schema is None:
            ref_schema, ref_file = schema, f
        elif not schema.equals(ref_schema):
            raise ValueError(
                f"input files disagree on schema: {f!r} differs from "
                f"{ref_file!r} — encode one homogeneous dataset per store"
            )
        units.extend(file_units)
    if not units:
        return {"mode": "rowgroup", "n_total": 1, "parts": [[]]}

    n_partitions = max(1, n_partitions)
    if explicit and n_partitions > len(units):
        total_w = sum(u[0] for u in units) or 1.0
        split: list[tuple[float, str, int, int, int]] = []
        for w, f, i, lo, hi in units:
            if hi < 0:  # ORC stripe: row count unknown at plan time, so it
                split.append((w, f, i, lo, hi))  # can't row-split — keep whole
                continue
            k = max(1, min(hi - lo, round(n_partitions * w / total_w)))
            edges = np.linspace(lo, hi, k + 1).astype(int)
            for a, b in zip(edges[:-1], edges[1:]):
                if b > a:
                    split.append((w * (b - a) / max(1, hi - lo), f, i, int(a), int(b)))
        units = split

    n_bins = max(1, min(n_partitions, len(units)))
    bins = _lpt_pack(units, n_bins)
    return {"mode": "rowgroup", "n_total": n_bins, "parts": bins}


def rowgroup_work_df(spark, parts: list[list[list]], pending: list[int]):
    """One row per pending partition: ``(pid, units_json)``.

    Each task's row-group assignment travels as DATA, not as a function
    closure — a closure over the full plan would ship EVERY task a pickled
    copy of ALL assignments (at 10^12 scale: ~10^6 row-group units ≈ 100 MB
    per task).  ``parallelize(rows, len(rows))`` puts exactly one row in
    each slice, keeping task→partition 1:1.  (Past ~10^6 parts the plan
    belongs in a parquet sidecar rather than plan.json.)"""
    rows = [(int(p), json.dumps(parts[p])) for p in pending]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, len(rows)),
        "pid int, units string",
    )


def _row_weight_csum(tbl: pa.Table, schema) -> np.ndarray:
    """Cumulative per-row raw-byte weights for the chunk-budget governor.

    List columns dominate (values bytes); for the default token table this
    is exactly the historical ``n_tok * 4``, so chunk boundaries — and
    therefore payload bytes — are unchanged for existing stores.  A schema
    with NO list column weighs strings by their ACTUAL per-row UTF-8 bytes
    (+8 offsets index) plus the fixed scalar footprint — a fixed 8 B/str
    would degenerate the byte budget into a row-count budget on
    string-heavy schemas (round-4 advice)."""
    w = None
    for name, kind in schema:
        if kind.startswith("list"):
            if kind in _KIND_NP:
                width = _KIND_NP[kind]().itemsize
            else:  # generic list<vk>: str/binary values priced at 16 B
                vk = list_value_kind(kind)
                width = (
                    16 if vk in ("str", "binary")
                    else _KIND_NP[TEMPORAL_STORAGE.get(vk, vk)]().itemsize
                )
            # fill_null: a NULL list entry otherwise casts to INT_MIN and
            # corrupts the cumulative budget (negative weights)
            lens = np.asarray(
                pc.fill_null(
                    pc.list_value_length(tbl.column(name)), 0
                ).combine_chunks(),
                dtype=np.int64,
            ) * width
            w = lens if w is None else w + lens
        elif kind.startswith("map"):
            kk, vk = map_kinds(kind)
            width = sum(  # byte entries priced at 16 B (key/value average)
                16 if k in ("str", "binary")
                else _KIND_NP[TEMPORAL_STORAGE.get(k, k)]().itemsize
                for k in (kk, vk)
            )
            lens = np.asarray(pc.fill_null(pc.list_value_length(
                _map_as_list(tbl.column(name).combine_chunks())
            ), 0), dtype=np.int64) * width
            w = lens if w is None else w + lens
    if w is not None:
        return np.cumsum(w)
    scalar_bytes = 0
    for name, kind in schema:
        if kind in ("str", "binary"):
            slens = np.asarray(
                pc.fill_null(
                    pc.binary_length(tbl.column(name)), 0
                ).combine_chunks(),
                dtype=np.int64,
            ) + 8
            w = slens if w is None else w + slens
        elif kind.startswith("struct"):
            def _walk(col_s, skind):
                nonlocal w, scalar_bytes
                scalar_bytes += 1  # the 0/1 present column (per level)
                for fi, (_fname, fkind) in enumerate(struct_fields(skind)):
                    child = pc.struct_field(col_s, fi)
                    if fkind.startswith("struct"):
                        _walk(child, fkind)
                    elif fkind in ("str", "binary"):
                        slens = np.asarray(
                            pc.fill_null(pc.binary_length(child), 0),
                            dtype=np.int64,
                        ) + 8
                        w = slens if w is None else w + slens
                    else:
                        scalar_bytes += _KIND_NP[fkind]().itemsize
            _walk(tbl.column(name).combine_chunks(), kind)
        else:
            scalar_bytes += _KIND_NP[kind]().itemsize
    if w is None:
        w = np.full(tbl.num_rows, max(1, scalar_bytes), dtype=np.int64)
    elif scalar_bytes:
        w = w + scalar_bytes
    return np.cumsum(w)


def make_rowgroup_encoder(chunk_bytes: int, fs=None, policy: str = "size",
                          schema=DEFAULT_SCHEMA, sort_by=None):
    """ONE-stage scan+encode for ``mapInArrow`` over :func:`rowgroup_work_df`.

    Each task owns one ``part_id`` (a planned bin of row groups): it reads
    its row groups with pyarrow, feeds them straight into the byte-budget
    chunk encoder, and emits encoded chunk rows — zero shuffle, zero
    JVM-row materialization of token bytes.  This is the 100 TB default
    (measured: the salted-repartition path moves every token byte through
    shuffle write+read, which caps single-box scaling and is network-bound
    on a real cluster).

    ``fs`` is the planner's pyarrow filesystem, shipped in the closure
    (pyarrow filesystems pickle); ``fs=None`` re-resolves per file path —
    the path Iceberg-planned units take, whose ``file_path`` URIs carry
    their own scheme.  A unit's ``hi=-1`` means "the whole row group"
    (manifest-planned units don't know footer row counts)."""
    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pafs.clamp_arrow_threads()
        for batch in batches:
            for pid, units_json in zip(
                batch.column(0).to_pylist(), batch.column(1).to_pylist()
            ):
                pid = int(pid)
                seq = 0
                sel_cache: dict = {}
                # handles are reused across a bin's units of the same file
                # but MUST be closed before the next bin: a bin spanning
                # thousands of small files (Iceberg) would otherwise
                # exhaust fds / hold object-store streams for the task's
                # whole lifetime
                handles: dict[str, object] = {}
                try:
                    yield from encode_units(
                        pid, json.loads(units_json), handles, seq, sel_cache
                    )
                finally:
                    for h in handles.values():
                        try:
                            h.close()
                        except Exception:
                            pass

    def encode_units(pid, units, handles, seq, sel_cache):
        import concurrent.futures as cf

        cols = [name for name, _ in schema]

        def read_unit(unit):
            f, rg, lo, hi = unit
            if f not in handles:
                handles[f] = pafs.open_input(f, fs)  # parquet or ORC by ext
            if int(rg) < 0:  # whole-file unit (manifest had no
                tbl = handles[f].read(columns=cols)  # split offsets)
            else:
                tbl = handles[f].read_row_group(int(rg), columns=cols)
            if int(hi) >= 0:
                tbl = tbl.slice(int(lo), int(hi) - int(lo))
            if sort_by:
                # ZONE-MAP CLUSTERING (round 5): sort the row group by the
                # caller's keys before chunk slicing, so each chunk's
                # min/max covers a narrow key range and range predicates
                # prune most chunks.  Runs in the background reader thread
                # (overlapped with the kernels), costs no shuffle — at
                # 100 TB this is clustering WITHOUT the cluster-wide sort.
                tbl = tbl.sort_by([(c, "ascending") for c in sort_by])
            return tbl

        # READ/ENCODE OVERLAP: one background reader prefetches row group
        # i+1 while the kernels encode row group i — pyarrow's parquet read
        # releases the GIL, so scan I/O+decompression genuinely overlaps the
        # numpy encode (the single-task lever left after the kernels passed
        # the single-core scan rate, BENCH.md round 3).  Exactly ONE unit is
        # in flight, so peak memory is current + next row group; only the
        # reader thread touches ``handles``.  Pure reordering — chunk
        # boundaries and payloads are byte-identical (bit-identity pins).
        with cf.ThreadPoolExecutor(max_workers=1) as pool:
            nxt = pool.submit(read_unit, units[0]) if units else None
            for i in range(len(units)):
                tbl = nxt.result()
                nxt = (pool.submit(read_unit, units[i + 1])
                       if i + 1 < len(units) else None)
                if not tbl.num_rows:
                    continue
                # chunk boundaries straight on the row-group table:
                # zero-copy slices into the byte-budget governor — no
                # re-batching/concat copies on the hot path
                tok_csum = _row_weight_csum(tbl, schema)
                row = 0
                while row < tbl.num_rows:
                    base = int(tok_csum[row - 1]) if row else 0
                    end = int(
                        np.searchsorted(
                            tok_csum, base + chunk_bytes, side="right"
                        )
                    )
                    end = min(tbl.num_rows, max(row + 1, end))
                    rows = _encode_chunk_rows(
                        tbl.slice(row, end - row), pid, seq, sel_cache,
                        policy, schema,
                    )
                    seq += 1
                    row = end
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(rows[fld.name], type=fld.type)
                         for fld in OUT_SCHEMA],
                        schema=OUT_SCHEMA,
                    )

    return run


def scan_work_df(spark, assignments: list[list[tuple[str, int]]]):
    """One row per scan task: ``(tid, units_json)`` — assignments travel as
    data, not closure (same reasoning as :func:`rowgroup_work_df`)."""
    rows = [(i, json.dumps(a)) for i, a in enumerate(assignments)]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, len(rows)),
        "tid int, units string",
    )


def make_arrow_scanner(plan: dict, pending: set[int] | None, fs=None):
    """Fused pyarrow scan + plan assignment for ``mapInArrow`` over
    :func:`scan_work_df`.

    Replaces the JVM parquet scan feeding the salted repartition: each task
    reads its row groups with pyarrow (measured ~1.5x the JVM nested-list
    scan on ``array<int32>`` token columns) and computes ``part_id``
    vectorized in numpy — bucket by the plan's n_tok bounds, salt by a
    vectorized FNV-1a of doc_id.  Resume filtering happens here too, so
    skipped partitions' token bytes never cross into the JVM.
    """
    bounds = np.asarray(plan["bounds"], dtype=np.float64)
    offs = np.asarray(plan["offsets"], dtype=np.int64)
    allocs = np.asarray(plan["allocs"], dtype=np.uint64)
    pend = None if pending is None else np.asarray(sorted(pending), dtype=np.int64)

    def scan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from ..operators.dedup import fnv1a_slices

        pafs.clamp_arrow_threads()
        for batch in batches:
            for units_json in batch.column(1).to_pylist():
                for path, rg in json.loads(units_json):
                    tbl = pafs.open_parquet(path, fs).read_row_group(
                        int(rg), columns=["doc_id", "tokens", "n_tok", "source"]
                    )
                    n_tok = np.asarray(
                        tbl.column("n_tok").combine_chunks(), dtype=np.int64
                    )
                    bucket = np.searchsorted(bounds, n_tok, side="left")
                    ids = StringCol.from_arrow(tbl.column("doc_id").combine_chunks())
                    h = fnv1a_slices(
                        np.frombuffer(ids.data, dtype=np.uint8),
                        ids.offsets[:-1],
                        np.diff(ids.offsets),
                    )
                    part = offs[bucket] + (h % allocs[bucket]).astype(np.int64)
                    out = tbl.append_column(
                        "part_id", pa.array(part.astype(np.int32))
                    )
                    if pend is not None:
                        mask = np.isin(part, pend)
                        if not mask.all():
                            out = out.filter(pa.array(mask))
                    if out.num_rows:
                        yield from out.to_batches(max_chunksize=8192)

    return scan


def _read_input_df(spark, input_path: str, fmt: str):
    """JVM DataFrame scan of the input location, format-aware (Spark reads
    ORC natively — the reference's format, `src/orc/read.clj`)."""
    return (spark.read.orc(input_path) if fmt == "orc"
            else spark.read.parquet(input_path))


def _default_n_partitions(spark, df, input_path: str | None, fs=None) -> int:
    if input_path is not None:
        try:
            rfs, path = pafs.resolve(input_path, fs)
            total = pafs.total_bytes(rfs, path)
        except Exception:
            total = 0
        if total:
            # parquet is ~2x lighter than raw token bytes on this data
            return max(1, int(total * 2 // TARGET_PART_BYTES))
    return spark.sparkContext.defaultParallelism * 2


def _input_row_count(files: list[str] | None, fs=None) -> int | None:
    """Row count from parquet/ORC footers — no Spark job."""
    if not files:
        return None

    def count(f: str) -> int:
        if f.endswith(".orc"):
            h = pafs.open_orc(f, fs)
            try:
                return int(h.nrows)
            finally:
                h.close()
        import pyarrow.parquet as pq

        return pq.read_metadata(f, filesystem=fs).num_rows

    try:
        if len(files) > 4:  # latency-bound metadata GETs: fetch concurrently
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(16, len(files))) as pool:
                return sum(pool.map(count, files)) or None
        return sum(count(f) for f in files) or None
    except Exception:
        return None


def _load_or_compute_plan(spark, df, out_dir: str, n_partitions: int,
                          files: list[str] | None, fs=None,
                          assign_hash: str = "xxhash64",
                          degraded_from: str | None = None,
                          sort_by: list[str] | None = None) -> dict:
    """Plan once, persist, reuse — resumed runs must assign identical
    part_ids or per-partition lineage is meaningless.  ``assign_hash``
    records which salting hash the run uses (fnv1a for the fused pyarrow
    scan, xxhash64 for the JVM DataFrame path); a resume must keep it.
    ``degraded_from`` records that this plan exists only because the
    zero-shuffle scan was unavailable at plan time — the record makes the
    pinning inspectable (a transient store error would otherwise lock the
    store onto the full-shuffle path with no trace)."""
    plan_path = os.path.join(out_dir, "plan.json")
    if fsio.exists(spark, plan_path):
        return json.loads(fsio.read_text(spark, plan_path))
    plan = compute_plan(df, n_partitions, total_rows=_input_row_count(files, fs))
    plan["assign_hash"] = assign_hash
    if sort_by:
        plan["sort_by"] = list(sort_by)
    if degraded_from:
        plan["degraded_from"] = degraded_from
    fsio.write_text(spark, plan_path, json.dumps(plan))
    return plan


def _schema_from_files(files: list[str] | None, fs=None):
    """Derive the schema descriptor from the first input file's footer
    (plan-time; schemas are homogeneous across a dataset's files)."""
    import pyarrow.parquet as pq

    if not files:
        return None
    if files[0].endswith(".orc"):
        h = pafs.open_orc(files[0], fs)
        try:
            return derive_schema(h.schema)
        finally:
            h.close()
    return derive_schema(pq.read_schema(files[0], filesystem=fs))


def _load_or_compute_rowgroup_plan(spark, out_dir: str, files: list[str],
                                   n_partitions: int, explicit: bool,
                                   fs=None, plan: dict | None = None,
                                   sort_by: list[str] | None = None) -> dict:
    """Rowgroup-mode twin of :func:`_load_or_compute_plan` — the persisted
    plan IS the part→row-group assignment, so a resume re-encodes exactly
    the pending bins regardless of file-listing order or bin-packing ties.
    A caller-supplied ``plan`` (e.g. the Iceberg-manifest planner,
    sources/iceberg_plan.py) is persisted the same way.  The plan also
    pins the SCHEMA descriptor: decode and resumed encodes read it from
    plan.json, so a store's layout never depends on what happens to be at
    input_path later."""
    plan_path = os.path.join(out_dir, "plan.json")
    if fsio.exists(spark, plan_path):
        return json.loads(fsio.read_text(spark, plan_path))
    if plan is None:
        plan = _rowgroup_plan(files, n_partitions, explicit, fs)
    if "schema" not in plan:
        schema = _schema_from_files(files, fs)
        if schema is None:
            # plan= hook with input_path=None: derive from the first unit's
            # own path (Iceberg units carry their URIs); default otherwise
            try:
                first = next(
                    u[0] for part in plan.get("parts", []) for u in part
                )
                ufs, upath = pafs.resolve(first, fs)
                schema = _schema_from_files([upath], ufs)
            except Exception:
                schema = [list(t) for t in DEFAULT_SCHEMA]
        plan["schema"] = [list(t) for t in schema]
    if sort_by:
        plan["sort_by"] = list(sort_by)
    fsio.write_text(spark, plan_path, json.dumps(plan))
    return plan


def _has_parquet(spark, path: str) -> bool:
    return fsio.has_parquet(spark, path)


def _write_per_part(df, path: str) -> None:
    """Write manifest records partitioned by part_id with dynamic overwrite —
    re-running a partition replaces its records (idempotent lineage) instead
    of appending duplicates."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part_id")
        .parquet(path)
    )


def _write_chunks(encoded, chunks_dir: str) -> None:
    """THE chunk writer — batch and streaming encode must stay byte-layout
    identical, so every writer option lives here once.

    * writer-level dynamic overwrite (NOT session conf): a caller-owned
      session without the conf would static-overwrite and silently destroy
      completed partitions on resume;
    * 16 MB parquet blocks: chunk rows are opaque pre-packed payloads — a
      128 MB block buys nothing, and N concurrent writers x 128 MB buffers
      OOM a default-1g spark-submit driver (found by verify surface 4);
      ~4 payload rows per row group also gives the pruned decode's
      chunk_id filters real row-group skipping."""
    (
        encoded.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("parquet.block.size", str(16 << 20))
        .partitionBy("part_id")
        .parquet(chunks_dir)
    )


def _manifest_rollup(manifest_dir: str, pending: list[int],
                     n_phys: int) -> dict | None:
    """Per-part completion rollup computed from the just-written manifest
    with pyarrow ON THE DRIVER — the manifest is partition-count-bounded
    metadata (KBs per part), so a whole Spark aggregation job here is pure
    scheduling overhead.  Returns ``{part_id: {n_chunks, n_rows, enc_bytes,
    raw_bytes}}`` matching the Spark aggregation exactly (same double-sum
    then truncate for n_rows), or None when pyarrow cannot serve the store
    (the caller falls back to the Spark job)."""
    try:
        import pyarrow.dataset as ds

        fs, path = pafs.resolve(manifest_dir)
        dataset = ds.dataset(path, filesystem=fs, format="parquet",
                             partitioning="hive")
        t = dataset.to_table(
            columns=["part_id", "chunk_id", "n_rows", "enc_bytes",
                     "raw_bytes"],
            filter=ds.field("part_id").isin([int(p) for p in pending]),
        )
        gb = t.group_by("part_id").aggregate([
            ("chunk_id", "count_distinct"), ("n_rows", "sum"),
            ("enc_bytes", "sum"), ("raw_bytes", "sum"),
        ])
        out = {}
        for i in range(gb.num_rows):
            pid = gb.column("part_id")[i].as_py()
            out[int(pid)] = {
                "n_chunks": int(gb.column("chunk_id_count_distinct")[i].as_py()),
                "n_rows": int(
                    float(gb.column("n_rows_sum")[i].as_py() or 0) / n_phys
                ),
                "enc_bytes": int(gb.column("enc_bytes_sum")[i].as_py() or 0),
                "raw_bytes": int(gb.column("raw_bytes_sum")[i].as_py() or 0),
            }
        return out
    except Exception:
        return None


def _commit_manifest(spark, out_dir: str, chunks_dir: str,
                     pending: list[int], n_phys: int = len(CHUNK_COLS)) -> None:
    """Manifest commit for a wave of partitions: chunk records (payload
    pruned — parquet column pruning makes this read cheap, and ``file``
    records each chunk's physical path so decode/resume never need a
    filesystem walk) + per-partition completion markers.  Both are written
    with per-part_id dynamic overwrite, never blind append: a crash between
    the two writes leaves chunk records for an incomplete part, and the
    resumed run *replaces* them instead of appending duplicates that would
    double-count size rollups.  The parts rollup reads the manifest just
    written (KBs), not a second chunks-dir scan — at 100 TB that second
    scan is a full metadata pass."""
    from pyspark.sql import functions as F

    # explicit schema, never inference: a store half-encoded by an older
    # release may mix chunk schemas (pre-stats files) and sampling one old
    # footer would silently drop newer columns — and mergeSchema would sweep
    # EVERY footer (10^6 files at scale).  Missing columns read as null.
    written = (
        spark.read.schema(OUT_DDL).parquet(chunks_dir)
        .where(F.col("part_id").isin(pending))
    )
    manifest = written.drop("payload").withColumn("file", F.input_file_name())
    manifest_dir = os.path.join(out_dir, "manifest", "chunks")
    _write_per_part(manifest, manifest_dir)
    # ONE aggregation job: collect the per-part rollup (bounded by the
    # PARTITION count — thousands — never chunk rows) and write the parts
    # markers from a driver-local frame.  The previous shape ran the same
    # manifest read + groupBy TWICE (once for the part_id collect, once
    # re-executed lazily by the write) — a whole redundant Spark job per
    # encode wave.
    # SCALE GUARD: this is the encode pipeline's only driver-side collect of
    # job output, and it must stay bounded by the PARTITION count, never
    # chunk rows (millions at 100 TB) — pinned by
    # tests/test_round4_fixes.py::test_commit_manifest_collects_only_part_ids
    by_pid = _manifest_rollup(manifest_dir, pending, n_phys)
    if by_pid is None:  # pyarrow cannot serve the store: Spark fallback
        agg_rows = (
            spark.read.parquet(manifest_dir)
            .where(F.col("part_id").isin(pending))
            .groupBy("part_id")
            .agg(
                F.countDistinct("chunk_id").alias("n_chunks"),
                (F.sum("n_rows") / F.lit(n_phys)).cast("long").alias("n_rows"),
                F.sum("enc_bytes").alias("enc_bytes"),
                F.sum("raw_bytes").alias("raw_bytes"),
            )
            .collect()
        )
        by_pid = {r["part_id"]: r for r in agg_rows}
    now = time.time()
    # a pending part that produced ZERO chunks (e.g. an empty row group)
    # still needs its completion marker, or resume re-runs it forever
    rows = []
    for p in pending:
        r = by_pid.get(p)
        rows.append((
            int(p),
            int(r["n_chunks"]) if r else 0,
            int(r["n_rows"] or 0) if r else 0,
            int(r["enc_bytes"] or 0) if r else 0,
            int(r["raw_bytes"] or 0) if r else 0,
            "complete", now,
        ))
    parts = spark.createDataFrame(
        rows,
        "part_id int, n_chunks long, n_rows long, enc_bytes long,"
        " raw_bytes long, status string, completed_at double",
    )
    _write_per_part(parts, os.path.join(out_dir, "manifest", "parts"))


def completed_part_ids(spark, out_dir: str) -> set[int]:
    parts_dir = os.path.join(out_dir, "manifest", "parts")
    if fsio.is_local(parts_dir) and not os.path.isdir(parts_dir):
        return set()
    try:
        rows = spark.read.parquet(parts_dir).select("part_id").distinct().collect()
    except Exception:
        return set()
    return {r["part_id"] for r in rows}


def encode(
    spark,
    input_path: str | None = None,
    out_dir: str = None,
    df=None,
    n_partitions: int | None = None,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    resume: bool = True,
    limit_parts: int | None = None,
    scan: str = "auto",
    filesystem=None,
    plan: dict | None = None,
    selection: str = "size",
    sort_by: list[str] | str | None = None,
) -> dict:
    """Run the encode job; resumable via the parts manifest.

    ``limit_parts`` encodes only the first K pending partitions — used by the
    resume tests to simulate a killed run (SURVEY.md §5 engine-test 5).

    ``filesystem``: an explicit ``pyarrow.fs.FileSystem`` serving
    ``input_path`` (e.g. a credential-configured ``S3FileSystem``); by
    default the filesystem is resolved from the path's scheme (pafs.resolve
    — local, ``file://``, ``s3://``/``s3a://``, ``gs://``, ``hdfs://``).
    A resume must pass the same filesystem/input_path: the persisted plan's
    file paths are fs-native.

    ``plan``: a precomputed rowgroup plan dict (``{"mode": "rowgroup",
    "n_total": N, "parts": [[[path, rg, lo, hi], ...], ...]}``) — the hook
    the Iceberg-manifest planner uses (sources/iceberg_plan.py), whose units
    carry their own path URIs (resolved per task).  Ignored when out_dir
    already holds a persisted plan.

    ``scan`` picks the physical strategy (recorded in plan.json and pinned on
    resume — each mode assigns part_id differently, and per-partition lineage
    is only sound if a resume reproduces the assignment exactly):

    * "auto" (default) → "rowgroup" whenever pyarrow can serve ``input_path``
      (local or object store), else "jvm" — and the degradation is recorded
      in the report/run_meta, never silent.
    * "rowgroup": ZERO-SHUFFLE scan+encode in one ``mapInArrow`` stage;
      part_id = a footer-planned, byte-balanced bin of row groups
      (:func:`_rowgroup_plan`).  The 100 TB shape: token bytes go parquet →
      Arrow → kernels → chunk write, never through a shuffle.
    * "salted": fused pyarrow scan feeding the n_tok-quantile salted
      repartition (skew.py) — the shape for inputs whose row groups are
      themselves pathologically skewed or oversized.
    * "jvm": Catalyst DataFrame scan + salted repartition (always used for
      ``df=`` inputs and filesystems pyarrow cannot serve).
    """
    from pyspark.sql import functions as F

    assert out_dir, "out_dir required"
    if selection not in ("size", "speed"):
        raise ValueError(f"unknown selection policy {selection!r}")
    if scan not in ("auto", "rowgroup", "salted", "jvm"):
        # a typo'd mode must never silently run (and pin) a different path
        raise ValueError(f"unknown scan mode {scan!r}")
    if df is not None and input_path is not None:
        raise ValueError(
            "pass input_path OR df, not both — a transformed df would be "
            "silently ignored whenever input_path is directly readable"
        )
    if plan is not None and (df is not None or scan not in ("auto", "rowgroup")):
        raise ValueError("plan= is a rowgroup-mode hook; incompatible with "
                         f"df= and scan={scan!r}")
    explicit_parts = n_partitions is not None
    user_plan = plan  # caller-supplied plan (vs the persisted one loaded below)
    if isinstance(sort_by, str):
        sort_by = [sort_by]
    sort_by = list(sort_by) if sort_by else None

    t0 = time.time()
    # resolved even for scan="jvm": the file list feeds the footer row
    # count (no Spark job) — only the PHYSICAL scan choice ignores it there
    fs, files, fmt, degraded_reason = _pyarrow_source(input_path, filesystem)
    if degraded_reason and input_path is not None:
        # pyarrow never listed the store, so fmt above is just the default —
        # the JVM (which CAN reach it, or the fallback scan would fail too)
        # decides parquet vs ORC for the spark.read call
        fmt = _jvm_fmt_sniff(spark, input_path, fmt)
    if fs is None and filesystem is not None:
        fs = filesystem  # plan= with input_path=None: the caller's
        # credential-configured filesystem must still reach executor reads
    if fmt == "orc" and scan == "salted":
        # the salted arrow scanner plans by parquet row-group footers; for
        # ORC the stripe-planned zero-shuffle path (default) or the JVM
        # scan (spark.read.orc) are the supported shapes
        raise ValueError(
            'scan="salted" reads parquet; ORC input runs zero-shuffle '
            'stripe-planned (scan="auto"/"rowgroup") or via scan="jvm"'
        )
    if df is None and scan == "jvm" and input_path is not None:
        df = _read_input_df(spark, input_path, fmt)
    elif df is None and scan == "salted":
        df = spark.read.parquet(input_path)
    if n_partitions is None:
        n_partitions = _default_n_partitions(spark, df, input_path, filesystem)
    scan_files = None if scan == "jvm" else files
    if degraded_reason and scan == "auto" and plan is None:
        # at 100 TB this fallback moves every token byte through a full
        # shuffle — the operator must see it (report + run_meta, below)
        warnings.warn(
            "zero-shuffle rowgroup scan unavailable, degrading to the JVM "
            f"scan + salted repartition: {degraded_reason}"
        )
    if scan in ("salted", "rowgroup") and not scan_files and plan is None:
        # never silently degrade an explicit mode request — the chosen mode
        # is persisted in plan.json and would pin every future resume
        raise ValueError(
            f"scan={scan!r} needs parquet/ORC files pyarrow can serve under "
            f"input_path; got input_path={input_path!r}"
            + (f" ({degraded_reason})" if degraded_reason else "")
        )

    if plan is not None or (scan_files and scan in ("auto", "rowgroup")):
        if not explicit_parts:
            # part == task in this mode: keep every core busy even when the
            # byte-based default would under-split a small input
            n_partitions = max(
                n_partitions, spark.sparkContext.defaultParallelism * 2
            )
        plan = _load_or_compute_rowgroup_plan(
            spark, out_dir, scan_files, n_partitions, explicit_parts, fs,
            plan, sort_by
        )
    else:
        if df is None:
            df = _read_input_df(spark, input_path, fmt)
        plan = _load_or_compute_plan(
            spark, df, out_dir, n_partitions, files, fs,
            assign_hash="fnv1a" if scan_files else "xxhash64",
            degraded_from=degraded_reason if scan == "auto" else None,
            sort_by=sort_by,
        )
    mode = plan.get("mode", "salted")
    schema = [tuple(t) for t in plan.get("schema", [])] or list(DEFAULT_SCHEMA)
    # sort_by is part of the persisted layout contract (chunk boundaries and
    # zone maps depend on it): a resume adopts the recorded order, and a
    # conflicting explicit request must fail loudly, not silently mix
    # sorted and unsorted partitions in one store
    eff_sort = plan.get("sort_by")
    if sort_by is not None and eff_sort != sort_by:
        raise ValueError(
            f"out_dir was planned with sort_by={eff_sort!r}; resume adopts "
            f"it — re-encode into a fresh out_dir for sort_by={sort_by!r}"
        )
    if eff_sort:
        _kinds = dict(schema)
        for sc in eff_sort:
            if sc not in _kinds or _kinds[sc].startswith(
                ("list", "struct", "map")
            ):
                raise ValueError(
                    f"sort_by column {sc!r} must be a scalar store column; "
                    f"schema: {schema}"
                )
    if mode == "rowgroup":
        if df is not None:
            raise ValueError(
                "out_dir was encoded with the zero-shuffle rowgroup plan; "
                "resume it with the same input_path/filesystem, not df="
            )
        # units carry their own paths; fs=None → per-task re-resolve
    else:
        if user_plan is not None:
            # a caller-supplied plan= against a store persisted in salted/JVM
            # mode would fall through to the DataFrame path and crash in
            # spark.read.parquet(None) — name the mismatch instead
            raise ValueError(
                f"out_dir holds a persisted {mode!r}-mode plan; plan= is a "
                "rowgroup-mode hook.  Resume this store with the original "
                "input_path/df (same scan mode), or encode the planned input "
                "into a fresh out_dir"
            )
        if plan.get("degraded_from") and scan_files:
            # the store was planned while the fast scan was unavailable
            # (e.g. a transient store error) and is pinned on the
            # full-shuffle path — resumes must keep the assignment, but the
            # operator should know recovery is possible
            warnings.warn(
                "out_dir is pinned on the salted/JVM plan recorded under "
                f"degradation ({plan['degraded_from']}); the zero-shuffle "
                "scan IS available now — re-encode into a fresh out_dir to "
                "regain it"
            )
        if plan.get("assign_hash", "xxhash64") == "xxhash64":
            scan_files = None  # prior run salted with the JVM hash — stay
            # consistent
        elif not scan_files:
            raise ValueError(
                "out_dir was encoded with the fused pyarrow scan (fnv1a part "
                "assignment); resume it with the same input_path, not df="
            )
        # the salted/JVM scanners and chunk splitter are written against the
        # fixed token-table columns; general schemas go through the
        # schema-driven rowgroup scan
        if df is not None:
            got = {t for t in df.dtypes if t[0] != "part_id"}
            want = {("doc_id", "string"), ("tokens", "array<int>"),
                    ("n_tok", "int"), ("source", "string")}
            if got != want:
                raise ValueError(
                    "the salted/JVM scan encodes exactly the token-table "
                    f"schema {sorted(want)}; got {sorted(got)}.  General "
                    "flat schemas (str/int32/int64/array<int>) are supported "
                    "by the zero-shuffle rowgroup scan — pass input_path= "
                    "instead of df="
                )
    n_total = plan["n_total"]

    done = completed_part_ids(spark, out_dir) if resume else set()
    pending = [p for p in range(n_total) if p not in done]
    if limit_parts is not None:
        pending = pending[:limit_parts]
    if not pending:
        return {"n_partitions": n_total, "pending": 0, "skipped": len(done),
                "wall_sec": 0.0}

    if mode == "rowgroup":
        encoded = rowgroup_work_df(spark, plan["parts"], pending).mapInArrow(
            make_rowgroup_encoder(chunk_bytes, fs, selection, schema,
                                  sort_by=eff_sort), OUT_DDL
        )
    else:
        pending_set = set(pending) if (done or limit_parts is not None) else None
        if scan_files:
            assignments = _row_group_assignments(
                scan_files, spark.sparkContext.defaultParallelism * 2, fs
            )
            work = scan_work_df(spark, assignments).mapInArrow(
                make_arrow_scanner(plan, pending_set, fs), SCAN_DDL
            )
        else:
            if df is None:
                df = _read_input_df(spark, input_path, fmt)
            work = apply_plan(df, plan)
            if pending_set is not None:
                work = work.where(F.col("part_id").isin(pending))
        work = work.repartition(len(pending), "part_id")
        if eff_sort:
            # part_id leads the sort so each part's rows stay contiguous for
            # the per-part chunk splitter; zone-map clustering happens on
            # the trailing keys — still zero extra shuffles
            work = work.sortWithinPartitions("part_id", *eff_sort)
        encoded = work.mapInArrow(make_encoder(chunk_bytes, selection), OUT_DDL)
    chunks_dir = os.path.join(out_dir, "chunks")
    _write_chunks(encoded, chunks_dir)

    if not _has_parquet(spark, chunks_dir):
        # zero rows pending (empty input): mark parts complete, no chunks
        parts = spark.createDataFrame(
            [(p, 0, 0, 0, 0, "complete", time.time()) for p in pending],
            "part_id int, n_chunks long, n_rows long, enc_bytes long,"
            " raw_bytes long, status string, completed_at double",
        )
        _write_per_part(parts, os.path.join(out_dir, "manifest", "parts"))
        return {"n_partitions": n_total, "pending": len(pending),
                "skipped": len(done), "chunk_bytes": chunk_bytes,
                "wall_sec": time.time() - t0}

    _commit_manifest(spark, out_dir, chunks_dir, pending,
                     n_phys=len(physical_cols(schema)))

    wall = time.time() - t0
    report = {
        "n_partitions": n_total,
        "pending": len(pending),
        "skipped": len(done),
        "chunk_bytes": chunk_bytes,
        "scan": mode if mode == "rowgroup" else (
            "arrow-salted" if scan_files else "jvm"),
        "selection": selection,
        **({"sort_by": eff_sort} if eff_sort else {}),
        "wall_sec": wall,
    }
    if degraded_reason and mode != "rowgroup":
        # permanent record of the fallback (run_meta below), alongside the
        # in-flight warning — silent degradation was round-2 finding #3
        report["degraded_reason"] = degraded_reason
    meta_path = os.path.join(out_dir, "run_meta.json")
    history = []
    if fsio.exists(spark, meta_path):
        history = json.loads(fsio.read_text(spark, meta_path)).get("runs", [])
    fsio.write_text(
        spark,
        meta_path,
        json.dumps(
            {
                "engine": "clj_orc_spark",
                "schema_cols": list(physical_cols(schema)),
                "schema": [list(t) for t in schema],
                "runs": history + [report],
            },
            indent=1,
        ),
    )
    return report
