"""Decode pipeline: encoded chunks + manifest → the original token table.

The read-side analog of the reference's entry point (`src/orc/read.clj:65-112`):
where clj-orc pulls ORC batches and pivots them to rows per-cell
(`src/orc/core.clj:57-66`), this engine groups each chunk's five encoded
column rows, runs the vectorized decode kernels, and reassembles the
``tokens`` list column from the flat values + offsets index — the exact
offsets/lengths slicing the reference applies to ORC list vectors
(`src/orc/col.clj:110-121`), done once per chunk instead of once per row.

CRC of every payload is checked against the value recorded at encode time.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import crc32, decode_any
from . import fsio, pafs
from .encode import (
    DEFAULT_SCHEMA,
    list_payload_names,
    list_value_kind,
    map_kinds,
    map_payload_names,
    physical_cols,
    struct_fields,
    struct_payload_names,
)

TOKEN_DDL = "doc_id string, tokens array<int>, n_tok int, source string"

_DDL_TYPE = {"str": "string", "int32": "int", "int64": "bigint",
             "float32": "float", "float64": "double",
             "list32": "array<int>", "list64": "array<bigint>",
             "listf32": "array<float>", "listf64": "array<double>",
             "date32": "date", "ts_us": "timestamp_ntz",
             "ts_us_utc": "timestamp",
             "bool": "boolean", "binary": "binary"}
_LIST_VALUE_TYPE = {"list32": pa.int32, "list64": pa.int64,
                    "listf32": pa.float32, "listf64": pa.float64}
#: float list kind → (unsigned storage dtype, float dtype) — values decode
#: from the kernels as bit patterns, exactly like scalar float columns
_LIST_FLOAT_NP = {"listf32": (np.uint32, np.float32),
                  "listf64": (np.uint64, np.float64)}
#: int-storage kinds → (numpy storage dtype, arrow type factory).  Temporal
#: kinds share the int path: same storage bytes, the arrow type restores
#: date/timestamp semantics exactly (days / micros reinterpret).
_INT_TYPE = {
    "int32": (np.int32, pa.int32), "int64": (np.int64, pa.int64),
    "date32": (np.int32, pa.date32),
    "ts_us": (np.int64, lambda: pa.timestamp("us")),
    "ts_us_utc": (np.int64, lambda: pa.timestamp("us", tz="UTC")),
}
#: float kind → (unsigned bit-pattern dtype, float dtype, arrow type)
_FLOAT_TYPE = {"float32": (np.uint32, np.float32, pa.float32),
               "float64": (np.uint64, np.float64, pa.float64)}


def _physical_map(schema) -> dict[str, tuple[str, ...]]:
    """Logical output column → physical payload rows it needs."""
    out = {}
    for name, kind in schema:
        if kind.startswith("list"):
            out[name] = list_payload_names(name)
        elif kind.startswith("struct"):
            out[name] = struct_payload_names(name, kind)
        elif kind.startswith("map"):
            out[name] = map_payload_names(name)
        else:
            out[name] = (name,)
    return out


def _pred_target(key: str, kinds: dict) -> tuple[str, str] | None:
    """(effective kind, physical stats/payload column) for a predicate key:
    a top-level column, or ``col.field`` reaching into a shredded struct —
    the shredded field has its OWN zone maps in the manifest, so a struct-
    field predicate prunes chunks without decoding anything.  ``None`` when
    the key resolves to nothing (caller raises with its own wording)."""
    if key in kinds:
        kind = kinds[key]
        phys = list_payload_names(key)[0] if kind.startswith("list") else key
        return kind, phys
    col, dot, rest = key.partition(".")
    if dot and col in kinds and kinds[col].startswith("struct"):
        kind, phys, lpath = kinds[col], col, col
        for fld in rest.split("."):
            if not kind.startswith("struct"):
                raise ValueError(
                    f"predicate key {key!r}: {lpath!r} "
                    f"is a scalar field, not a struct"
                )
            fks = dict(struct_fields(kind))
            if fld not in fks:
                raise ValueError(
                    f"struct column {lpath!r} has no "
                    f"field {fld!r}; fields: {sorted(fks)}"
                )
            kind, phys = fks[fld], f"{phys}__{fld}"
            lpath = f"{lpath}.{fld}"
        if kind.startswith("struct"):
            raise ValueError(
                f"predicate key {key!r} targets a struct; predicates take "
                f"a scalar leaf field (e.g. {key}.<field>)"
            )
        return kind, phys
    return None


def _bound_types(kind: str) -> tuple[tuple, str]:
    """Accepted Python bound types for predicates on a column kind."""
    if kind.startswith("list<"):  # containment bounds type like the values
        kind = list_value_kind(kind)
    if kind == "str":
        return (str,), "str"
    if kind == "binary":
        return (bytes,), "bytes"
    if kind in ("float32", "float64", "listf32", "listf64"):
        return (int, float), "int or float"
    if kind == "bool":
        return (int, bool), "int or bool"
    return (int,), "int"


def _zone_cast(kind: str) -> str:
    """Spark cast type for comparing a column kind's zone-map stats (the
    manifest records them as JSON strings).  One shared helper for decode()
    and decode_plan_report() — the two predicate paths must never drift."""
    if kind.startswith("list<"):  # generic list: dispatch on value kind
        kind = list_value_kind(kind)
    if kind == "str":
        return "string"
    if kind == "binary":
        return "binary"
    if kind in ("float32", "float64", "listf32", "listf64"):
        return "double"
    return "long" if kind in ("int64", "list32", "list64", "ts_us", "ts_us_utc") else "int"


def _ddl_type(kind: str) -> str:
    if kind.startswith("struct"):
        inner = ", ".join(  # _ddl_type recursion: nested struct fields
            f"{f}: {_ddl_type(k)}" for f, k in struct_fields(kind)
        )
        return f"struct<{inner}>"
    if kind.startswith("map"):
        kk, vk = map_kinds(kind)
        return f"map<{_DDL_TYPE[kk]}, {_DDL_TYPE[vk]}>"
    if kind.startswith("list<"):  # generic list kinds; legacy short
        return f"array<{_DDL_TYPE[list_value_kind(kind)]}>"  # names are
    return _DDL_TYPE[kind]  # in _DDL_TYPE directly


def _select_ddl(columns: list[str], schema) -> str:
    kinds = dict(schema)
    return ", ".join(f"{c} {_ddl_type(kinds[c])}" for c in columns)


def store_schema(spark, out_dir: str) -> list[tuple[str, str]]:
    """The schema descriptor pinned in the store's plan.json (round 4+);
    stores written before schema recording are the fixed token table."""
    import os

    p = os.path.join(out_dir, "plan.json")
    if fsio.exists(spark, p):
        sch = json.loads(fsio.read_text(spark, p)).get("schema")
        if sch:
            return [tuple(t) for t in sch]
    return list(DEFAULT_SCHEMA)


def decode_chunk_table(tbl: pa.Table, columns: list[str] | None = None,
                       schema=DEFAULT_SCHEMA) -> pa.Table:
    """Decode one chunk's column rows back to source-table rows.

    ``columns`` prunes the decode: only the payloads backing the requested
    logical columns are CRC-checked and decoded — asking for metadata
    columns (doc_id/n_tok/source) skips the token_values kernel entirely,
    which is ~97% of the decode work.  ``schema`` is the store's descriptor
    (schema-driven kernel binding, the decode half of the reference's
    user-declared plan, `src/orc/col.clj:184-204`)."""
    kinds = dict(schema)
    order = [name for name, _ in schema]
    phys = _physical_map(schema)
    wanted = list(columns) if columns is not None else order
    needed = {p for c in wanted for p in phys[c]}
    cols = {}
    valid_bufs: dict[str, bytes] = {}
    for i in range(tbl.num_rows):
        name = tbl.column("col")[i].as_py()
        if name not in needed:
            continue
        payload = tbl.column("payload")[i].as_py()
        meta = json.loads(tbl.column("meta")[i].as_py())
        expected_crc = tbl.column("crc")[i].as_py()
        if crc32(payload) != expected_crc:
            raise IOError(
                f"CRC mismatch on chunk {tbl.column('chunk_id')[0].as_py()} col {name}"
            )
        vb_len = meta.get("valid")
        if vb_len:
            # nullable payload (round 5): little-endian packed validity
            # bitmap prefixed to the kernel payload — Arrow buffer bit order
            valid_bufs[name] = payload[:vb_len]
            payload = payload[vb_len:]
        cols[name] = decode_any(payload, meta)
    missing = needed - set(cols)
    if missing:
        raise IOError(f"chunk incomplete, missing columns: {missing}")

    def _vbuf(name: str):
        vb = valid_bufs.get(name)
        return pa.py_buffer(vb) if vb is not None else None

    def _scalar_arr(p: str, fk: str) -> pa.Array:
        """Reassemble one flat scalar payload (struct field / map child)
        with its validity bitmap; temporal kinds restore their arrow type
        over the same storage bytes."""
        if fk in _INT_TYPE:
            np_t, pa_t = _INT_TYPE[fk]
            a = np.ascontiguousarray(cols[p].astype(np_t, copy=False))
            return pa.Array.from_buffers(
                pa_t(), len(a), [_vbuf(p), pa.py_buffer(a.tobytes())]
            )
        if fk in _FLOAT_TYPE:
            u_t, f_t, pa_t = _FLOAT_TYPE[fk]
            a = np.ascontiguousarray(
                cols[p].astype(u_t, copy=False)
            ).view(f_t)
            return pa.Array.from_buffers(
                pa_t(), len(a), [_vbuf(p), pa.py_buffer(a.tobytes())]
            )
        if fk == "bool":
            # int32 0/1 storage → arrow bool (bit-packed data buffer)
            a = cols[p].astype(np.int32, copy=False) != 0
            return pa.Array.from_buffers(
                pa.bool_(), len(a),
                [_vbuf(p),
                 pa.py_buffer(np.packbits(a, bitorder="little").tobytes())],
            )
        arr = cols[p].to_arrow()  # str / binary (same offsets+bytes layout)
        if p in valid_bufs:
            bufs = arr.buffers()
            arr = pa.Array.from_buffers(
                arr.type, len(arr), [_vbuf(p), bufs[1], bufs[2]]
            )
        if fk == "binary":
            arr = arr.view(
                pa.large_binary()
                if pa.types.is_large_string(arr.type) else pa.binary()
            )
        return arr

    def _struct_arr(prefix: str, kind: str) -> pa.Array:
        """Shredded struct reassembly, recursive: scalar leaves from their
        own payloads (each with its own validity), nested struct fields
        from a recursive call, struct-level validity from this level's 0/1
        present column."""
        pres = cols[f"{prefix}__present"].astype(np.bool_, copy=False)
        n_s = len(pres)
        children, fields = [], []
        for fname, fkind in struct_fields(kind):
            child = (
                _struct_arr(f"{prefix}__{fname}", fkind)
                if fkind.startswith("struct")
                else _scalar_arr(f"{prefix}__{fname}", fkind)
            )
            children.append(child)
            fields.append(pa.field(fname, child.type))
        pbuf = (
            None if bool(pres.all()) else pa.py_buffer(
                np.packbits(pres, bitorder="little").tobytes()
            )
        )
        return pa.Array.from_buffers(
            pa.struct(fields), n_s, [pbuf], children=children
        )

    out = {}
    for c in wanted:
        kind = kinds[c]
        if kind.startswith("list") and kind not in _LIST_VALUE_TYPE:
            # generic list<vk> (round 5): values reassemble through the
            # same scalar machinery as struct fields / map children, the
            # offsets index + list-level validity ride the list machinery
            v_name, o_name = phys[c]
            offsets = cols[o_name].astype(np.int64, copy=False)
            n_l = len(offsets) - 1
            if n_l and int(offsets[-1]) > np.iinfo(np.int32).max:
                raise IOError(
                    f"chunk holds {int(offsets[-1])} list values, beyond "
                    "int32 list offsets; re-encode with smaller chunk_bytes"
                )
            values_arr = _scalar_arr(v_name, list_value_kind(kind))
            out[c] = pa.Array.from_buffers(
                pa.list_(values_arr.type), n_l,
                [_vbuf(o_name),
                 pa.py_buffer(offsets.astype(np.int32).tobytes())],
                children=[values_arr],
            )
        elif kind.startswith("list"):
            v_name, o_name = phys[c]
            if kind in _LIST_FLOAT_NP:
                u_t, f_t = _LIST_FLOAT_NP[kind]
                # bit-pattern view back to float — NaN payload bits exact
                flat = np.ascontiguousarray(
                    cols[v_name].astype(u_t, copy=False)
                ).view(f_t)
            else:
                val_np = np.int32 if kind == "list32" else np.int64
                flat = cols[v_name].astype(val_np, copy=False)
            offsets = cols[o_name].astype(np.int64, copy=False)
            n = len(offsets) - 1
            if n and int(offsets[-1]) > np.iinfo(np.int32).max:
                # Arrow list<int32> offsets are int32; a chunk encoded with a
                # huge chunk_bytes setting would wrap silently — refuse loudly
                raise IOError(
                    f"chunk holds {int(offsets[-1])} list values, beyond "
                    "int32 list offsets; re-encode with chunk_bytes <= 8 GiB"
                )
            if v_name in valid_bufs or o_name in valid_bufs:
                # nullable reassembly: values validity from the values
                # payload, list-entry validity from the offsets payload
                values_arr = pa.Array.from_buffers(
                    _LIST_VALUE_TYPE[kind](), len(flat),
                    [_vbuf(v_name),
                     pa.py_buffer(np.ascontiguousarray(flat).tobytes())],
                )
                out[c] = pa.Array.from_buffers(
                    pa.list_(_LIST_VALUE_TYPE[kind]()), n,
                    [_vbuf(o_name),
                     pa.py_buffer(offsets.astype(np.int32).tobytes())],
                    children=[values_arr],
                )
            else:
                out[c] = pa.ListArray.from_arrays(
                    pa.array(offsets.astype(np.int32)),
                    pa.array(flat, type=_LIST_VALUE_TYPE[kind]()),
                )
        elif kind.startswith("struct"):
            out[c] = _struct_arr(c, kind)
        elif kind.startswith("map"):
            # shredded map reassembly: keys/values children + offsets
            # index; map-level validity from the offsets payload bitmap
            kk, vk = map_kinds(kind)
            k_name, v_name, o_name = map_payload_names(c)
            offsets = cols[o_name].astype(np.int64, copy=False)
            n_m = len(offsets) - 1
            if n_m and int(offsets[-1]) > np.iinfo(np.int32).max:
                raise IOError(
                    f"chunk holds {int(offsets[-1])} map entries, beyond "
                    "int32 offsets; re-encode with smaller chunk_bytes"
                )
            keys_arr = _scalar_arr(k_name, kk)
            vals_arr = _scalar_arr(v_name, vk)
            ef = [pa.field("key", keys_arr.type, nullable=False),
                  pa.field("value", vals_arr.type)]
            entries = pa.StructArray.from_arrays(
                [keys_arr, vals_arr], fields=ef
            )
            out[c] = pa.Array.from_buffers(
                pa.map_(ef[0], ef[1]), n_m,
                [_vbuf(o_name),
                 pa.py_buffer(offsets.astype(np.int32).tobytes())],
                children=[entries],
            )
        else:
            # every scalar kind — int/temporal/float/bool/str/binary —
            # reassembles through the one scalar path (validity bitmaps,
            # uint-view-to-float, large_binary view all live there)
            out[c] = _scalar_arr(c, kind)
    return pa.table(out)


def _strip_file_scheme(uri: str) -> str:
    from urllib.parse import urlparse

    return urlparse(uri).path if uri.startswith("file:") else uri


def _chunk_files(chunks_dir: str, part_ids: list[int] | None) -> list[str]:
    import os

    wanted = None if part_ids is None else {int(p) for p in part_ids}
    files = []
    for root, _, names in os.walk(chunks_dir):
        base = os.path.basename(root)
        if wanted is not None and base.startswith("part_id="):
            if int(base.split("=", 1)[1]) not in wanted:
                continue
        files.extend(
            os.path.join(root, n) for n in names if n.endswith(".parquet")
        )
    return sorted(files)


def _manifest_files(spark, out_dir: str, part_ids: list[int] | None) -> list[str] | None:
    """Chunk file list from the manifest (the scale path: no filesystem walk
    — on an object store, enumeration comes from committed lineage, and
    uncommitted partial files from a crashed wave are never decoded).
    Returns None when this run predates file recording (walk fallback).

    The manifest is KBs-to-MBs of metadata; reading it with pyarrow on the
    driver skips a whole Spark job (scheduling + shuffle for distinct) per
    decode plan — measured 0.3-4 s of per-decode latency at sf0.1.  Falls
    back to the Spark read when pyarrow cannot serve the store (e.g. JVM-
    only credentials)."""
    import os

    from .encode import _has_parquet

    mdir = os.path.join(out_dir, "manifest", "chunks")
    if not _has_parquet(spark, mdir):
        return None
    try:
        import pyarrow.dataset as ds

        fs, path = pafs.resolve(mdir)
        dataset = ds.dataset(path, filesystem=fs, format="parquet",
                             partitioning="hive")
        if "file" not in dataset.schema.names:
            return None
        flt = (
            ds.field("part_id").isin([int(p) for p in part_ids])
            if part_ids is not None else None
        )
        col = dataset.to_table(columns=["file"], filter=flt).column("file")
        uris = sorted(set(col.to_pylist()))
    except Exception:
        from pyspark.sql import functions as F

        m = spark.read.parquet(mdir)
        if "file" not in m.columns:
            return None
        if part_ids is not None:
            m = m.where(F.col("part_id").isin([int(p) for p in part_ids]))
        uris = sorted(r["file"] for r in m.select("file").distinct().collect())
    return [_strip_file_scheme(u) for u in uris]


def _stat_pruned_work(spark, out_dir: str, part_ids, doc_id_range,
                      n_tok_range, source_in=None, token_range=None):
    """Legacy token-table wrapper over :func:`_stat_pruned_specs`."""
    range_specs = []
    if doc_id_range is not None:
        range_specs.append(("doc_id", doc_id_range[0], doc_id_range[1], "string"))
    if n_tok_range is not None:
        range_specs.append(("n_tok", n_tok_range[0], n_tok_range[1], "int"))
    if token_range is not None:
        range_specs.append(
            ("token_values", token_range[0], token_range[1], "long")
        )
    isin_specs = (
        [("source", list(source_in), "string")] if source_in is not None else []
    )
    return _stat_pruned_specs(spark, out_dir, part_ids, range_specs, isin_specs)


def _stat_pruned_specs(spark, out_dir: str, part_ids, range_specs,
                       isin_specs):
    """Zone-map pruning: (file, [chunk_ids]) for chunks whose recorded
    per-column min/max intersects the predicates — the ORC column-statistics
    analog, answered entirely from the payload-pruned manifest, for ANY
    physical stat column (round 4: generic over the store schema, not just
    the token-table specials).

    ``range_specs``: (phys_col, lo, hi, cast) — chunk survives when its
    [min, max] intersects [lo, hi] (either bound None).  ``isin_specs``:
    (phys_col, values, cast) — chunk survives when some wanted value lies
    within its range.  Returns None when there are no specs or the store
    predates stats recording (decode everything)."""
    import os

    from pyspark.sql import functions as F

    from .encode import _has_parquet

    if not range_specs and not isin_specs:
        return None
    mdir = os.path.join(out_dir, "manifest", "chunks")
    if not _has_parquet(spark, mdir):
        return None
    m = spark.read.parquet(mdir)
    if "stats" not in m.columns or "file" not in m.columns:
        return None
    if part_ids is not None:
        m = m.where(F.col("part_id").isin([int(p) for p in part_ids]))

    def stat_rows(col_name, cast):
        return m.where(F.col("col") == col_name).select(
            "chunk_id",
            F.get_json_object("stats", "$.min").cast(cast).alias("mn"),
            F.get_json_object("stats", "$.max").cast(cast).alias("mx"),
        )

    kept = None
    for col_name, lo, hi, cast in range_specs:
        rows = stat_rows(col_name, cast)
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("mx") >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col("mn") <= F.lit(hi))
        # stat-less chunk (NULL min): conservative keep
        s = rows.where(F.col("mn").isNull() | cond).select("chunk_id")
        kept = s if kept is None else kept.intersect(s)
    for col_name, values, cast in isin_specs:
        # membership against a [min,max] zone map: a chunk can only hold a
        # wanted value if some v ∈ values lies within its range
        rows = stat_rows(col_name, cast)
        cond = F.lit(False)
        for v in values:
            cond = cond | ((F.col("mn") <= F.lit(v)) & (F.col("mx") >= F.lit(v)))
        s = rows.where(F.col("mn").isNull() | cond).select("chunk_id")
        kept = s if kept is None else kept.intersect(s)
    pairs = (
        m.join(kept, "chunk_id")
        .select("file", "chunk_id")
        .distinct()
        .groupBy("file")
        .agg(F.collect_set("chunk_id").alias("cids"))
        .collect()
    )
    return [(_strip_file_scheme(r["file"]), sorted(r["cids"])) for r in pairs]


def decode_plan_report(spark, out_dir: str,
                       ranges: dict | None = None,
                       isin: dict | None = None) -> dict:
    """Observability for zone-map pruning: how many chunks/files would a
    predicated decode touch?  Answers entirely from the payload-pruned
    manifest (no chunk data read) — the engine-format analog of EXPLAIN's
    partition/row-group pruning counts.

    Returns ``{"chunks_total", "chunks_kept", "files_total", "files_kept"}``.
    """
    import os

    from pyspark.sql import functions as F

    from .encode import _has_parquet

    schema = store_schema(spark, out_dir)
    kinds = dict(schema)
    mdir = os.path.join(out_dir, "manifest", "chunks")
    if not _has_parquet(spark, mdir):
        raise ValueError(f"no manifest under {out_dir!r}")
    m = spark.read.parquet(mdir)
    totals = m.agg(
        F.countDistinct("chunk_id").alias("c"),
        F.countDistinct("file").alias("f"),
    ).first()


    def _report_target(colname, what):
        # same plan-time rules as decode(): a struct/map logical column has
        # no stat rows of its own — without this guard the report would
        # silently claim full pruning (0 chunks kept) instead of raising
        if colname in kinds and kinds[colname].startswith(("struct", "map")):
            raise ValueError(
                f"predicates on struct/map column {colname!r} are not "
                f"supported; use a shredded struct field "
                f"('{colname}.<field>')"
            )
        tgt = _pred_target(colname, kinds)
        if tgt is None:
            raise ValueError(
                f"{what} column {colname!r} not in store schema"
            )
        return tgt

    def _norm(kind, v):
        # bool bounds normalize to the 0/1 storage ints the zone maps hold
        # (decode() does the same at plan time)
        return int(v) if kind == "bool" and v is not None else v

    range_specs, isin_specs = [], []
    for colname, (lo, hi) in (ranges or {}).items():
        kind, phys = _report_target(colname, "ranges")
        range_specs.append(
            (phys, _norm(kind, lo), _norm(kind, hi), _zone_cast(kind))
        )
    for colname, v in (isin or {}).items():
        kind, phys = _report_target(colname, "isin")
        isin_specs.append(
            (phys, [_norm(kind, x) for x in v], _zone_cast(kind))
        )
    pruned = _stat_pruned_specs(spark, out_dir, None, range_specs, isin_specs)
    if pruned is None:  # no predicates or stat-less store: everything kept
        kept_c, kept_f = totals["c"], totals["f"]
    else:
        kept_c = sum(len(cids) for _, cids in pruned)
        kept_f = len(pruned)
    return {"chunks_total": totals["c"], "chunks_kept": kept_c,
            "files_total": totals["f"], "files_kept": kept_f}


def decode(spark, out_dir: str, part_ids: list[int] | None = None,
           mode: str = "files", columns: list[str] | None = None,
           doc_id_range: tuple | None = None,
           n_tok_range: tuple | None = None,
           source_in: list[str] | None = None,
           token_range: tuple | None = None,
           ranges: dict | None = None,
           isin: dict | None = None,
           prefetch: bool | None = None):
    """Distributed decode: chunk rows → token-table DataFrame.

    ``mode="files"`` (default, the scale path): one task per encoded chunk
    file, read with pyarrow inside ``mapInArrow``.  The encoder writes every
    chunk's five column rows contiguously into one file, so **no shuffle is
    needed at all** — at 100 TB the alternative reshuffles the entire encoded
    dataset.  (pyarrow's parquet reader also measured ~1.5x faster than the
    JVM scan on these payload-heavy rows.)

    ``mode="shuffle"``: groupBy(chunk_id).applyInArrow — keeps all logic in
    Spark's scan (predicate pushdown on part_id etc.); the fallback when the
    chunk store is not file-addressable.

    ``columns`` prunes the decode to the requested logical columns (any of
    doc_id/tokens/n_tok/source) — the engine-format analog of parquet
    column pruning: unneeded payloads are never CRC'd or decoded, so e.g.
    a doc_id+n_tok scan skips the token kernels (~97% of decode CPU).

    ``doc_id_range`` / ``n_tok_range`` (inclusive ``(lo, hi)``, either end
    None) are exact row predicates that ALSO prune I/O through the
    manifest's per-chunk min/max stats (zone maps — the ORC
    column-statistics analog): chunks that cannot match are never read or
    decoded, and the surviving rows are filtered exactly.

    ``source_in`` is a membership predicate on ``source`` (a list of wanted
    values), pruned the same way: a chunk whose recorded [min, max] source
    range contains no wanted value is never read.

    ``token_range`` (inclusive ``(lo, hi)``, either end None) is a
    CONTAINMENT predicate over token VALUES: keep rows whose ``tokens``
    array holds at least one value in the range (a vocabulary-range scan —
    "find sequences containing token ids ≥ 100k").  Pruned through the
    per-chunk token_values min/max zone maps, then filtered exactly with
    ``exists(tokens, ...)``.

    ``ranges`` / ``isin`` (round 4) are the GENERIC forms for any column of
    the store's schema: ``ranges={"year": (2010, 2019), "lang": ("de",
    "en")}``, ``isin={"lang": ["en", "fr"]}``.  Scalar columns filter by
    value; list columns get the containment semantics over their flattened
    values.  Every predicate both prunes chunks through the recorded zone
    maps and filters the surviving rows exactly.  The token-table named
    parameters above are sugar for these.
    """
    import json as _json
    import os

    from pyspark.sql import functions as F

    schema = store_schema(spark, out_dir)
    kinds = dict(schema)
    order = [name for name, _ in schema]
    # predicate columns are the engine's token-table specials — a store
    # encoded with another schema must reject them at plan time
    for pred_val, pred, colname in (
        (doc_id_range, "doc_id_range", "doc_id"),
        (n_tok_range, "n_tok_range", "n_tok"),
        (source_in, "source_in", "source"),
        (token_range, "token_range", "tokens"),
    ):
        if pred_val is not None and colname not in kinds:
            raise ValueError(
                f"{pred} requires a {colname!r} column; this store's schema "
                f"is {order}"
            )
    # bound TYPES are validated at plan time: the recorded doc_id stats are
    # lexicographic strings — numeric bounds would make Spark coerce the
    # stats to numbers and silently prune chunks that actually match.
    # These legacy-wording checks apply only when the store column has the
    # token-table kind; otherwise the kind-aware validation below governs
    # (a general store may hold numeric doc ids or sources).
    if (doc_id_range is not None and kinds.get("doc_id") == "str" and any(
        b is not None and not isinstance(b, str) for b in doc_id_range
    )):
        raise TypeError("doc_id_range bounds must be strings (or None)")
    if n_tok_range is not None and any(
        b is not None and not isinstance(b, int) for b in n_tok_range
    ):
        raise TypeError("n_tok_range bounds must be ints (or None)")
    if source_in is not None and kinds.get("source") == "str":
        if not source_in or any(not isinstance(v, str) for v in source_in):
            raise TypeError("source_in must be a non-empty list of strings")
    if token_range is not None:
        if any(b is not None and not isinstance(b, int) for b in token_range):
            raise TypeError("token_range bounds must be ints (or None)")
        if all(b is None for b in token_range):
            raise ValueError("token_range needs at least one bound")
    # generic dict predicates plus the legacy token-table named parameters
    # merged in as sugar; kind-aware validation runs AFTER the merge so the
    # legacy sugar is held to the same store-schema typing — e.g.
    # doc_id_range on a general store whose doc_id is int32 must raise, not
    # coerce the stats to null and silently prune everything
    ranges = dict(ranges or {})
    isin = dict(isin or {})
    for colname, rng in (("doc_id", doc_id_range), ("n_tok", n_tok_range),
                         ("tokens", token_range)):
        if rng is not None:
            if colname in ranges:
                raise ValueError(f"duplicate predicate on {colname!r}")
            ranges[colname] = (rng[0], rng[1])
    if source_in is not None:
        if "source" in isin:
            raise ValueError("duplicate predicate on 'source'")
        isin["source"] = list(source_in)
    pred_kind: dict[str, str] = {}
    pred_phys: dict[str, str] = {}
    for colname, rng in ranges.items():
        if not isinstance(rng, (tuple, list)) or len(rng) != 2:
            raise TypeError(f"ranges[{colname!r}] must be a (lo, hi) pair")
        if colname in kinds and kinds[colname].startswith(("struct", "map")):
            raise ValueError(
                f"predicates on struct/map column {colname!r} are not "
                f"supported; use a shredded struct field "
                f"('{colname}.<field>') or filter after decode"
            )
        tgt = _pred_target(colname, kinds)
        if tgt is None:
            raise ValueError(
                f"ranges column {colname!r} not in store schema {order}"
            )
        pred_kind[colname], pred_phys[colname] = tgt
        if pred_kind[colname].startswith("list<"):
            vk = list_value_kind(pred_kind[colname])
            if vk not in ("int32", "int64", "float32", "float64", "str"):
                # the exact containment filter compares decoded ELEMENTS
                # against the bounds; temporal/bool elements would need a
                # per-element storage cast inside exists() — not supported
                raise ValueError(
                    f"range containment on {pred_kind[colname]!r} column "
                    f"{colname!r} is not supported; filter after decode"
                )
        want, want_name = _bound_types(pred_kind[colname])
        if any(b is not None and not isinstance(b, want) for b in rng):
            raise TypeError(
                f"ranges[{colname!r}] bounds must be {want_name} (or None)"
            )
        if all(b is None for b in rng):
            raise ValueError(f"ranges[{colname!r}] needs at least one bound")
        if pred_kind[colname] == "bool":
            # normalize True/False bounds to the 0/1 storage ints the zone
            # maps hold and the exact filter compares against
            ranges[colname] = tuple(
                None if b is None else int(b) for b in rng
            )
    for colname, vals in isin.items():
        if colname in kinds and kinds[colname].startswith("list"):
            raise ValueError(
                f"isin is not supported on list column {colname!r}; use a "
                "ranges containment predicate"
            )
        if colname in kinds and kinds[colname].startswith(("struct", "map")):
            raise ValueError(
                f"predicates on struct/map column {colname!r} are not "
                f"supported; use a shredded struct field "
                f"('{colname}.<field>') or filter after decode"
            )
        tgt = _pred_target(colname, kinds)
        if tgt is None:
            raise ValueError(
                f"isin column {colname!r} not in store schema {order}"
            )
        pred_kind[colname], pred_phys[colname] = tgt
        want, want_name = _bound_types(pred_kind[colname])
        if not vals or any(not isinstance(v, want) for v in vals):
            raise TypeError(
                f"isin[{colname!r}] must be a non-empty list of {want_name}"
            )
        if pred_kind[colname] == "bool":
            isin[colname] = [int(v) for v in vals]
    if columns is not None:
        if not columns:
            # an empty projection would otherwise surface later as an opaque
            # Spark DDL ParseException — fail at plan time instead
            raise ValueError("columns must be a non-empty list or None")
        bad = set(columns) - set(order)
        if bad:
            raise ValueError(f"unknown columns: {sorted(bad)}")
        if doc_id_range is not None and "doc_id" not in columns:
            raise ValueError("doc_id_range requires 'doc_id' in columns")
        if n_tok_range is not None and "n_tok" not in columns:
            raise ValueError("n_tok_range requires 'n_tok' in columns")
        if source_in is not None and "source" not in columns:
            raise ValueError("source_in requires 'source' in columns")
        if token_range is not None and "tokens" not in columns:
            raise ValueError("token_range requires 'tokens' in columns")
        for colname in set(ranges) | set(isin):
            base = colname.split(".", 1)[0]
            if base not in columns:
                what = ("it" if base == colname else repr(base))
                raise ValueError(
                    f"predicate on {colname!r} requires {what} in columns"
                )
        columns = [c for c in order if c in set(columns)]
    ddl = _select_ddl(columns if columns is not None else order, schema)

    def _containment(lo, hi):
        # closure factory, NOT default args: Spark reads the lambda's arity
        # to type the higher-order function, so extra bound params break it
        def pred(t):
            if lo is not None and hi is not None:
                return (t >= F.lit(lo)) & (t <= F.lit(hi))
            return (t >= F.lit(lo)) if lo is not None else (t <= F.lit(hi))

        return pred

    def _pred_col(colname):
        # temporal bounds are the STORAGE ints (days / micros) — the same
        # unit the zone maps hold — so the exact filter compares on the
        # storage view of the decoded column.  Dotted keys (struct fields)
        # work as-is: F.col('meta.year') is Spark nested-field access.
        kind = pred_kind[colname]
        if kind == "date32":
            return F.unix_date(F.col(colname))
        if kind == "ts_us_utc":
            return F.unix_micros(F.col(colname))
        if kind == "bool":
            # bounds are 0/1 storage ints (normalized at plan time)
            return F.col(colname).cast("int")
        # ts_us compares the NTZ column directly against a typed
        # TIMESTAMP_NTZ literal (_pred_bound) — casting the column to
        # TIMESTAMP would reinterpret the wall clock in the SESSION
        # timezone while the zone maps compare raw storage micros:
        # silently wrong pruning on any non-UTC session.
        return F.col(colname)

    def _pred_bound(colname, v):
        if pred_kind[colname] == "ts_us":
            import datetime as _dt

            wall = _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=v)
            return F.expr(
                f"TIMESTAMP_NTZ '{wall.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
            )
        return F.lit(v)

    def exact_filter(df):
        for colname, (lo, hi) in ranges.items():
            if pred_kind[colname].startswith("list"):
                df = df.where(F.exists(colname, _containment(lo, hi)))
            else:
                if lo is not None:
                    df = df.where(
                        _pred_col(colname) >= _pred_bound(colname, lo)
                    )
                if hi is not None:
                    df = df.where(
                        _pred_col(colname) <= _pred_bound(colname, hi)
                    )
        for colname, vals in isin.items():
            if pred_kind[colname] == "ts_us":
                # NTZ equality against typed TIMESTAMP_NTZ literals (isin
                # would compare int micros through a session-tz cast)
                conds = [
                    F.col(colname) == _pred_bound(colname, v) for v in vals
                ]
                cond = conds[0]
                for extra in conds[1:]:
                    cond = cond | extra
                df = df.where(cond)
            else:
                df = df.where(_pred_col(colname).isin(list(vals)))
        return df

    chunks_dir = os.path.join(out_dir, "chunks")
    from .encode import _has_parquet

    if not _has_parquet(spark, chunks_dir):  # empty run wrote no chunks
        return spark.createDataFrame([], ddl)

    if mode == "shuffle":
        chunks = spark.read.parquet(chunks_dir)
        if part_ids is not None:
            chunks = chunks.where(F.col("part_id").isin(list(part_ids)))

        def decode_group(tbl: pa.Table) -> pa.Table:
            pafs.clamp_arrow_threads()
            return decode_chunk_table(tbl, columns, schema)

        return exact_filter(
            chunks.groupBy("chunk_id").applyInArrow(decode_group, ddl)
        )


    range_specs = [
        (pred_phys[c], lo, hi, _zone_cast(pred_kind[c]))
        for c, (lo, hi) in ranges.items()
    ]
    isin_specs = [
        (pred_phys[c], list(v), _zone_cast(pred_kind[c]))
        for c, v in isin.items()
    ]
    work_rows = None
    if range_specs or isin_specs:
        pruned = _stat_pruned_specs(
            spark, out_dir, part_ids, range_specs, isin_specs
        )
        if pruned is not None:
            work_rows = [(f, _json.dumps(cids)) for f, cids in pruned]
    if work_rows is None:
        files = _manifest_files(spark, out_dir, part_ids)
        if files is None:
            files = _chunk_files(chunks_dir, part_ids)
        work_rows = [(f, None) for f in files]
    if not work_rows:
        return spark.createDataFrame([], ddl)

    phys = _physical_map(schema)
    needed_cols = sorted({p for c in (columns or order) for p in phys[c]})
    prune_cols = (
        columns is not None
        and len(needed_cols) < len(physical_cols(schema))
    )

    # read/decode overlap pays where reads are REAL (object store / cold
    # disk: +11.5% single-task, BENCH.md); on a saturated local box the
    # extra reader thread per task is pure contention (62 tasks / 32 cores:
    # 3.4 s serial vs 3.7–6.1 s overlapped).  Auto: overlap iff the store
    # is scheme-qualified (remote I/O latency to hide), override with
    # ``prefetch=``.
    if prefetch is None:
        prefetch = "://" in out_dir
    decode_files = make_files_decoder(columns, schema, needed_cols,
                                      prune_cols, prefetch=prefetch)

    # each task receives its OWN file path as data — a closure over the full
    # file list would ship every task a copy of all paths (millions at 100 TB)
    work = spark.createDataFrame(
        spark.sparkContext.parallelize(work_rows, len(work_rows)),
        "path string, cids string",
    )
    return exact_filter(work.mapInArrow(decode_files, ddl))


def _rg_keep(md, cids: set | None, needed_cols, prune_cols: bool) -> list[int]:
    """Row groups that can hold wanted rows, from footer statistics — the
    manual equivalent of ``pq.read_table(filters=...)`` row-group skipping
    (chunk_id IN cids, col IN needed_cols), conservative when stats are
    absent."""
    name_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    ci, co = name_idx.get("chunk_id"), name_idx.get("col")
    keep = []
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        ok = True
        if cids is not None and ci is not None:
            st = rg.column(ci).statistics
            if st is not None and st.has_min_max:
                ok = any(st.min <= c <= st.max for c in cids)
        if ok and prune_cols and co is not None:
            st = rg.column(co).statistics
            if st is not None and st.has_min_max:
                ok = any(st.min <= c <= st.max for c in needed_cols)
        if ok:
            keep.append(g)
    return keep


class _Inline:
    """ThreadPoolExecutor stand-in that runs submit() on the caller thread —
    the serial baseline for the decode read-overlap A/B."""

    class _Done:
        def __init__(self, value):
            self._value = value

        def result(self):
            return self._value

    def submit(self, fn, *args):
        return self._Done(fn(*args))

    def shutdown(self, wait=False):
        pass


def make_files_decoder(columns, schema, needed_cols, prune_cols: bool,
                       prefetch: bool = True):
    """mapInArrow kernel over ``(path, cids_json)`` rows → decoded batches.

    Round 5: row groups are read with a ONE-IN-FLIGHT background prefetch —
    while the codec kernels decode the chunks completed by group i, a
    single reader thread pulls group i+1 (pyarrow's parquet reader releases
    the GIL), the same read/compute overlap that bought encode +19%
    (encode.py make_rowgroup_encoder).  Chunks may span row groups: rows
    for a chunk are written contiguously, so everything except the
    last-seen chunk_id is complete once a group arrives; the tail carries
    over to the next group.  ``prefetch=False`` reads serially on the task
    thread — the A/B baseline for scripts/decode_overlap_bench.py.  The
    unpruned serial case (local store, full scan) skips the row-group
    machinery entirely: one whole-file read + per-chunk grouping, the
    cheapest plan when there is nothing to skip and nothing to overlap."""

    def decode_files(batches):
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        pafs.clamp_arrow_threads()
        pool = ThreadPoolExecutor(max_workers=1) if prefetch else _Inline()
        try:
            for batch in batches:
                for path, cids_json in zip(
                    batch.column(0).to_pylist(), batch.column(1).to_pylist()
                ):
                    cids = (
                        set(json.loads(cids_json))
                        if cids_json is not None else None
                    )
                    # manifest-recorded URIs may be scheme-qualified (object
                    # store) — resolve per path; plain local paths hit
                    # LocalFileSystem, same as before
                    fs, p = pafs.resolve(path)
                    if not prefetch and cids is None and not prune_cols:
                        tbl = pq.read_table(p, filesystem=fs)
                        for cid in np.unique(
                            tbl.column("chunk_id").to_numpy()
                        ):
                            group = tbl.filter(
                                pc.equal(tbl.column("chunk_id"), cid)
                            )
                            yield from decode_chunk_table(
                                group, columns, schema
                            ).to_batches()
                        continue
                    pf = pq.ParquetFile(p, filesystem=fs)
                    keep = _rg_keep(pf.metadata, cids, needed_cols, prune_cols)
                    if not keep:
                        continue

                    def _filtered(g):
                        t = pf.read_row_group(g)
                        if cids is not None:
                            t = t.filter(pc.is_in(
                                t.column("chunk_id"),
                                value_set=pa.array(
                                    sorted(cids), type=pa.int64()),
                            ))
                        if prune_cols:
                            t = t.filter(pc.is_in(
                                t.column("col"),
                                value_set=pa.array(
                                    needed_cols, type=pa.string()),
                            ))
                        return t

                    fut = pool.submit(_filtered, keep[0])
                    carry = None
                    for j in range(len(keep)):
                        tbl = fut.result()
                        fut = (
                            pool.submit(_filtered, keep[j + 1])
                            if j + 1 < len(keep) else None
                        )
                        if carry is not None:
                            tbl = pa.concat_tables([carry, tbl])
                        if tbl.num_rows == 0:
                            carry = None
                            continue
                        ids = tbl.column("chunk_id").to_numpy()
                        last = ids[-1]
                        if fut is not None:
                            done_mask = ids != last
                            carry = tbl.filter(pc.equal(
                                tbl.column("chunk_id"), last))
                            tbl = tbl.filter(pa.array(done_mask))
                        else:
                            carry = None
                        for cid in np.unique(
                            tbl.column("chunk_id").to_numpy()
                        ):
                            group = tbl.filter(
                                pc.equal(tbl.column("chunk_id"), cid)
                            )
                            yield from decode_chunk_table(
                                group, columns, schema
                            ).to_batches()
        finally:
            pool.shutdown(wait=False)

    return decode_files
