"""Minimal Apache ORC *file* writer built on our codec kernels.

The inverse of orcfile.py: assembles real ``.orc`` files — magic,
stripes (data streams laid out per the stream directory), stripe
footers, footer/postscript protobufs (hand-encoded wire format, no
protobuf dependency) — from Arrow batches, using OUR RLE v2 /
byte-RLE / boolean / dictionary kernels for the column streams.

Behavioral reference: scritchley/orc writer.go:13-27 (layout),
writer.go:228-318 (footer/postscript), writer.go:320-481 (stripe
flush), treewriter.go (per-type streams).  Output is readable by any
ORC reader — the round-trip proof in tests uses both our own
orcfile.ORCFile and Spark's JVM ORC reader.

Supported column types: the token schema and friends — boolean, int
family, float/double, string (dict/direct auto-selected), binary,
date, timestamp, list<int>/list<bigint>.  Compression: NONE or ZLIB
(the reference writer's own gate, writer.go:70-87).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import stripe as stripe_mod
from ..codecs import byterle, compression, rle2
from ..codecs.bits import write_vulong
from .orcfile import KINDS, STREAM_KINDS, ENCODINGS, TIMESTAMP_BASE_SECONDS

MAGIC = b"ORC"


def _varint_field(out: bytearray, fno: int, value: int) -> None:
    write_vulong(out, (fno << 3) | 0)
    write_vulong(out, value)


def _bytes_field(out: bytearray, fno: int, blob: bytes) -> None:
    write_vulong(out, (fno << 3) | 2)
    write_vulong(out, len(blob))
    out.extend(blob)


def _message(fields: list[tuple[int, str, object]]) -> bytes:
    """Encode (field_no, kind, value) tuples; kind in varint|bytes|msg."""
    out = bytearray()
    for fno, kind, value in fields:
        if kind == "varint":
            _varint_field(out, fno, int(value))
        else:
            _bytes_field(out, fno, bytes(value))
    return bytes(out)


class _Column:
    """Per-column state: ORC type node + per-stripe stream encoder."""

    def __init__(self, col_id: int, spec: stripe_mod.ColumnSpec):
        self.col_id = col_id
        self.spec = spec


def _type_messages(specs: list[stripe_mod.ColumnSpec]) -> list[bytes]:
    """Flatten the single-level struct schema into pre-order Type
    protobufs (typedescription.go:506-516 id assignment)."""
    kind_code = {k: i for i, k in enumerate(KINDS)}
    # root struct: subtypes are the top-level column ids
    msgs = []
    child_ids = []
    next_id = 1
    col_ids = {}
    for s in specs:
        col_ids[s.name] = next_id
        child_ids.append(next_id)
        next_id += 2 if s.is_list else 1
    root = bytearray()
    _varint_field(root, 1, kind_code["struct"])
    packed = bytearray()
    for cid in child_ids:
        write_vulong(packed, cid)
    _bytes_field(root, 2, bytes(packed))
    for s in specs:
        _bytes_field(root, 3, s.name.encode())
    msgs.append(bytes(root))
    for s in specs:
        if s.is_list:
            lm = bytearray()
            _varint_field(lm, 1, kind_code["list"])
            pk = bytearray()
            write_vulong(pk, col_ids[s.name] + 1)
            _bytes_field(lm, 2, bytes(pk))
            msgs.append(bytes(lm))
            child_kind = {"int": "int", "bigint": "long"}.get(
                s.child_typ, "long")
            msgs.append(_message([(1, "varint", kind_code[child_kind])]))
        else:
            kind = {"bigint": "long", "smallint": "short",
                    "tinyint": "byte"}.get(s.typ, s.typ)
            msgs.append(_message([(1, "varint", kind_code[kind])]))
    return msgs


def _n_columns(specs) -> int:
    return 1 + sum(2 if s.is_list else 1 for s in specs)


def _encode_column_streams(arr: pa.Array, spec, col_id: int):
    """-> list of (col_id, kind_code, blob) + (col_id, encoding_code,
    dict_size) list, using ORC-standard encodings only."""
    streams = []
    encodings = []
    kc = {k: i for i, k in enumerate(STREAM_KINDS)}
    ec = {k: i for i, k in enumerate(ENCODINGS)}
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
        streams.append((col_id, kc["PRESENT"], byterle.encode_bools(valid)))
        data = arr.drop_null()
    else:
        data = arr
    typ = spec.typ

    if typ in stripe_mod.INT_TYPES:
        vals = np.asarray(data).astype(np.int64)
        streams.append((col_id, kc["DATA"], rle2.encode(vals, signed=True)))
        encodings.append((col_id, ec["DIRECT_V2"], 0))
    elif typ == "date":
        vals = np.asarray(data).astype("datetime64[D]").astype(np.int64)
        streams.append((col_id, kc["DATA"], rle2.encode(vals, signed=True)))
        encodings.append((col_id, ec["DIRECT_V2"], 0))
    elif typ in ("float", "double"):
        dt = "<f4" if typ == "float" else "<f8"
        streams.append((col_id, kc["DATA"],
                        np.asarray(data).astype(dt).tobytes()))
        encodings.append((col_id, ec["DIRECT"], 0))
    elif typ == "boolean":
        streams.append((col_id, kc["DATA"],
                        byterle.encode_bools(np.asarray(data))))
        encodings.append((col_id, ec["DIRECT"], 0))
    elif typ == "timestamp":
        us = np.asarray(data.cast(pa.int64()))
        secs = np.floor_divide(us, 1_000_000)
        nanos = (us - secs * 1_000_000) * 1000
        streams.append((col_id, kc["DATA"], rle2.encode(
            secs - TIMESTAMP_BASE_SECONDS, signed=True)))
        streams.append((col_id, kc["SECONDARY"], rle2.encode(
            stripe_mod._format_nanos(nanos), signed=False)))
        encodings.append((col_id, ec["DIRECT_V2"], 0))
    elif typ in ("string", "binary"):
        enc, s, _stats = stripe_mod._encode_string_like(data, use_fsst=False)
        if enc == "DICTIONARY_V2":
            streams.append((col_id, kc["DATA"], s["DATA"]))
            streams.append((col_id, kc["DICTIONARY_DATA"],
                            s["DICTIONARY_DATA"]))
            streams.append((col_id, kc["LENGTH"], s["LENGTH"]))
            # dict size = number of keys
            n_keys = _stats.get("dict_size", 0)
            encodings.append((col_id, ec["DICTIONARY_V2"], n_keys))
        else:
            streams.append((col_id, kc["DATA"], s["DATA"]))
            streams.append((col_id, kc["LENGTH"], s["LENGTH"]))
            encodings.append((col_id, ec["DIRECT_V2"], 0))
    elif spec.is_list:
        nn = len(data)
        offsets = np.frombuffer(data.buffers()[1], dtype=np.int32,
                                count=nn + 1, offset=data.offset * 4)
        lengths = np.diff(offsets).astype(np.int64)
        child = np.asarray(
            data.values[offsets[0]:offsets[-1]]).astype(np.int64)
        streams.append((col_id, kc["LENGTH"],
                        rle2.encode(lengths, signed=False)))
        encodings.append((col_id, ec["DIRECT_V2"], 0))
        streams.append((col_id + 1, kc["DATA"],
                        rle2.encode(child, signed=True)))
        encodings.append((col_id + 1, ec["DIRECT_V2"], 0))
    else:
        raise ValueError(f"unsupported type for ORC writer: {typ}")
    return streams, encodings


def write_orc(table: pa.Table, path: str,
              specs: list[stripe_mod.ColumnSpec] | None = None,
              codec: str = "zlib",
              stripe_rows: int = 1 << 20) -> dict:
    """Write an Arrow table as a real ORC file. Returns size stats."""
    if specs is None:
        specs = stripe_mod.TOKEN_SCHEMA
    comp_code = {"none": 0, "zlib": 1}[codec]

    def frame(blob: bytes) -> bytes:
        return compression.compress(blob, codec) if codec != "none" else blob

    out = bytearray()
    out.extend(MAGIC)
    stripe_infos = []
    n_total = 0

    for start in range(0, table.num_rows, stripe_rows):
        batch = table.slice(start, stripe_rows)
        n_rows = batch.num_rows
        n_total += n_rows
        streams: list = []
        encodings: list = [(0, 0, 0)]  # root struct: DIRECT
        col_id = 1
        for spec in specs:
            s, e = _encode_column_streams(
                batch.column(spec.name), spec, col_id)
            streams.extend(s)
            encodings.extend(e)
            col_id += 2 if spec.is_list else 1
        # order streams: PRESENT first per column id then others, in
        # (col, kind) order — any consistent directory order is valid
        streams.sort(key=lambda t: (t[0], t[1]))
        offset = len(out)
        directory = []
        for col, kindc, blob in streams:
            framed = frame(blob)
            directory.append((col, kindc, len(framed)))
            out.extend(framed)
        data_len = len(out) - offset
        sf = bytearray()
        for col, kindc, ln in directory:
            sf.extend(b"\x0a")  # field 1, wire 2
            body = _message([(1, "varint", kindc), (2, "varint", col),
                             (3, "varint", ln)])
            write_vulong(sf, len(body))
            sf.extend(body)
        for col, encc, dsize in sorted(encodings):
            sf.extend(b"\x12")  # field 2, wire 2
            body = _message([(1, "varint", encc)] +
                            ([(2, "varint", dsize)] if dsize else []))
            write_vulong(sf, len(body))
            sf.extend(body)
        sf_framed = frame(bytes(sf))
        out.extend(sf_framed)
        stripe_infos.append((offset, 0, data_len, len(sf_framed), n_rows))

    # footer
    footer = bytearray()
    _varint_field(footer, 1, 3)  # headerLength = len(MAGIC)
    _varint_field(footer, 2, len(out))  # contentLength
    for info in stripe_infos:
        body = _message([(i + 1, "varint", v) for i, v in enumerate(info)])
        _bytes_field(footer, 3, body)
    for tm in _type_messages(specs):
        _bytes_field(footer, 4, tm)
    _varint_field(footer, 6, n_total)
    _varint_field(footer, 8, 0)  # rowIndexStride 0 = no row index
    footer_framed = frame(bytes(footer))
    out.extend(footer_framed)

    ps = bytearray()
    _varint_field(ps, 1, len(footer_framed))
    _varint_field(ps, 2, comp_code)
    _varint_field(ps, 3, compression.DEFAULT_CHUNK_SIZE)
    packed = bytearray()
    write_vulong(packed, 0)
    write_vulong(packed, 12)
    _bytes_field(ps, 4, bytes(packed))  # version [0,12]
    _varint_field(ps, 5, 0)  # metadataLength
    _bytes_field(ps, 8000, MAGIC)  # magic (field 8000)
    out.extend(ps)
    out.append(len(ps))

    with open(path, "wb") as f:
        f.write(out)
    return {"bytes": len(out), "rows": n_total,
            "stripes": len(stripe_infos)}


def dataframe_to_orc_dir(df, out_dir: str,
                         specs=None, codec: str = "zlib",
                         stripe_rows: int = 1 << 20) -> None:
    """Distributed ORC sink: each Spark partition writes one real .orc
    file into ``out_dir`` via our kernels (mapInArrow; no JVM ORC
    writer involved). The directory is readable by ``spark.read.orc``.
    Local/shared filesystem paths only."""
    import os
    import pyarrow as pa
    from pyspark.sql import types as T
    from .. import stripe as stripe_mod

    if specs is None:
        specs = stripe_mod.TOKEN_SCHEMA
    os.makedirs(out_dir, exist_ok=True)
    names = [s.name for s in specs]

    def kernel(batches):
        from pyspark import TaskContext
        from orc_spark._alloc import tune_worker
        tune_worker()
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        collected = list(batches)
        n = 0
        if collected:
            table = pa.Table.from_batches(collected)
            n = table.num_rows
            if n:
                write_orc(table, os.path.join(out_dir, f"part-{pid:05d}.orc"),
                          specs=specs, codec=codec, stripe_rows=stripe_rows)
        yield pa.RecordBatch.from_arrays(
            [pa.array([n], pa.int64())],
            schema=pa.schema([("n_rows", pa.int64())]))

    out_schema = T.StructType([T.StructField("n_rows", T.LongType())])
    df.select(names).mapInArrow(kernel, out_schema) \
        .agg({"n_rows": "sum"}).collect()
