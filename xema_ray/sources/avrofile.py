"""Avro Object Container File source — the Hadoop-era row format
training corpora are still delivered in.

Same extension path as the Arrow-IPC / ORC sources: a
``FileBasedDatasource`` subclass, one read task per file, one Arrow
table yielded per AVRO BLOCK — and Avro is stream-friendly (header,
then length-prefixed blocks), so the reader consumes the sequential
``NativeFile`` incrementally with no whole-file buffering.

Pure stdlib + numpy implementation of the public Avro 1.x spec subset
the mirrors need (no avro package in this environment): zigzag-varint
longs, ``null``/``deflate`` codecs, flat records of primitives
(``string bytes long int double float boolean``) and two-branch
``["null", T]`` unions.  Row decode is a sequential byte walk (Avro is
row-oriented by design — block payload sizes are data-dependent, so
the loop cannot vectorize); parallelism comes from one task per file
and one table per block, which is how the format is meant to shard.

``mirror_documents_avro`` writes a deterministic sharded mirror of a
parquet table (idempotence + staleness semantics in
:func:`xema_ray.sources.mirror.mirror_sharded`).
"""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np
import pyarrow as pa

from xema_ray.sources.mirror import mirror_sharded

_MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))  # fixed marker: deterministic mirrors


class AvroError(ValueError):
    pass


# ----------------------------------------------------------------------
# zigzag varints
# ----------------------------------------------------------------------


def _enc_long(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _ByteReader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read_long(self) -> int:
        buf, pos = self.buf, self.pos
        z = 0
        shift = 0
        while True:
            if pos >= len(buf):
                raise AvroError("varint truncated")
            b = buf[pos]
            pos += 1
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        self.pos = pos
        return (z >> 1) ^ -(z & 1)

    def read_bytes(self) -> bytes:
        n = self.read_long()
        if n < 0 or self.pos + n > len(self.buf):
            raise AvroError("bytes field truncated")
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def read_fixed(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise AvroError("fixed field truncated")
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out


# ----------------------------------------------------------------------
# writer (mirror subset)
# ----------------------------------------------------------------------

_ARROW_TO_AVRO = [
    (pa.types.is_string, "string"), (pa.types.is_large_string, "string"),
    (pa.types.is_int64, "long"), (pa.types.is_int32, "int"),
    (pa.types.is_float64, "double"), (pa.types.is_float32, "float"),
    (pa.types.is_boolean, "boolean"), (pa.types.is_binary, "bytes"),
    (pa.types.is_large_binary, "bytes"),
]


def _avro_type(t: pa.DataType) -> str:
    for pred, name in _ARROW_TO_AVRO:
        if pred(t):
            return name
    raise AvroError(f"unsupported arrow type for avro mirror: {t}")


def _enc_value(out: bytearray, typ: str, v):
    if typ == "string":
        b = v.encode() if isinstance(v, str) else bytes(v)
        out += _enc_long(len(b))
        out += b
    elif typ == "bytes":
        out += _enc_long(len(v))
        out += bytes(v)
    elif typ in ("long", "int"):
        out += _enc_long(int(v))
    elif typ == "double":
        out += struct.pack("<d", float(v))
    elif typ == "float":
        out += struct.pack("<f", float(v))
    elif typ == "boolean":
        out.append(1 if v else 0)
    else:  # pragma: no cover - guarded by _avro_type
        raise AvroError(f"unsupported avro type {typ}")


def write_avro(tbl: pa.Table, path: str, codec: str = "deflate",
               rows_per_block: int = 1000,
               nullable_cols=None) -> None:
    """Write an Arrow table as an Avro Object Container File (flat
    record schema; nullable columns become ``["null", T]`` unions).

    ``nullable_cols`` pins which columns get the union schema (so every
    shard of a mirrored table carries the SAME schema regardless of
    where the nulls land); default = infer from this table's nulls."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported avro codec {codec!r}")
    fields = []
    col_types = []
    for f in tbl.schema:
        at = _avro_type(f.type)
        nullable = (tbl[f.name].null_count > 0 if nullable_cols is None
                    else f.name in nullable_cols)
        if nullable_cols is not None and f.name not in nullable_cols \
                and tbl[f.name].null_count > 0:
            raise AvroError(f"column {f.name} has nulls but was pinned "
                            "non-nullable")
        fields.append({"name": f.name,
                       "type": ["null", at] if nullable else at})
        col_types.append((f.name, at, nullable))
    schema = {"type": "record", "name": "row", "fields": fields}
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    out = bytearray(_MAGIC)
    out += _enc_long(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _enc_long(len(kb))
        out += kb
        out += _enc_long(len(v))
        out += v
    out += _enc_long(0)  # end of metadata map
    out += _SYNC
    cols = {nm: tbl[nm].to_pylist() for nm, _t, _nl in col_types}
    n = tbl.num_rows
    for start in range(0, max(n, 1), rows_per_block):
        stop = min(n, start + rows_per_block)
        if stop <= start:
            break
        body = bytearray()
        for i in range(start, stop):
            for nm, at, nullable in col_types:
                v = cols[nm][i]
                if nullable:
                    if v is None:
                        body += _enc_long(0)
                        continue
                    body += _enc_long(1)
                _enc_value(body, at, v)
        payload = zlib.compress(bytes(body))[2:-4] \
            if codec == "deflate" else bytes(body)
        out += _enc_long(stop - start)
        out += _enc_long(len(payload))
        out += payload
        out += _SYNC
    with open(path, "wb") as f:
        f.write(bytes(out))


# ----------------------------------------------------------------------
# reader
# ----------------------------------------------------------------------


def _read_header(f):
    """Parse the OCF header from a sequential stream.  Returns
    ``(field_specs, codec, sync)`` where field_specs rows are
    ``(name, type, null_branch)`` — null_branch is the union index of
    the ``"null"`` branch (0 or 1), or ``None`` for plain fields."""
    if f.read(4) != _MAGIC:
        raise AvroError("not an Avro object container file")

    def read_long_stream():
        z = 0
        shift = 0
        while True:
            b = f.read(1)
            if not b:
                raise AvroError("header truncated")
            z |= (b[0] & 0x7F) << shift
            if not b[0] & 0x80:
                return (z >> 1) ^ -(z & 1)
            shift += 7

    meta = {}
    while True:
        cnt = read_long_stream()
        if cnt == 0:
            break
        if cnt < 0:  # spec: negative count -> abs count + block size
            cnt = -cnt
            read_long_stream()
        for _ in range(cnt):
            k = f.read(read_long_stream()).decode()
            meta[k] = f.read(read_long_stream())
    sync = f.read(16)
    if len(sync) != 16:
        raise AvroError("header sync truncated")
    if "avro.schema" not in meta:
        raise AvroError("avro.schema metadata key missing")
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported avro codec {codec!r}")
    if schema.get("type") != "record" or "fields" not in schema:
        raise AvroError("only record-schema avro files are supported")
    specs = []
    for fld in schema["fields"]:
        t = fld["type"]
        null_branch = None
        if isinstance(t, list):  # two-branch null union, either order
            branches = [x for x in t if x != "null"]
            if len(t) != 2 or len(branches) != 1 or \
                    not isinstance(branches[0], str):
                raise AvroError(f"unsupported union {t}")
            null_branch = t.index("null")
            t = branches[0]
        if not isinstance(t, str) or t not in (
                "string", "bytes", "long", "int", "double", "float",
                "boolean"):
            raise AvroError(f"unsupported avro field type {t}")
        specs.append((fld["name"], t, null_branch))
    return specs, codec, sync


_PA_TYPES = {"string": pa.string(), "bytes": pa.binary(),
             "long": pa.int64(), "int": pa.int32(),
             "double": pa.float64(), "float": pa.float32(),
             "boolean": pa.bool_()}


def _decode_block(payload: bytes, count: int, specs) -> pa.Table:
    rd = _ByteReader(payload)
    cols = [[] for _ in specs]
    for _ in range(count):
        for ci, (_nm, t, null_branch) in enumerate(specs):
            if null_branch is not None:
                idx = rd.read_long()
                if idx == null_branch:
                    cols[ci].append(None)
                    continue
                if idx != 1 - null_branch:
                    raise AvroError("bad union branch index")
            if t == "string":
                cols[ci].append(rd.read_bytes().decode())
            elif t == "bytes":
                cols[ci].append(rd.read_bytes())
            elif t in ("long", "int"):
                cols[ci].append(rd.read_long())
            elif t == "double":
                cols[ci].append(struct.unpack("<d", rd.read_fixed(8))[0])
            elif t == "float":
                cols[ci].append(struct.unpack("<f", rd.read_fixed(4))[0])
            else:  # boolean
                cols[ci].append(rd.read_fixed(1)[0] != 0)
    if rd.pos != len(payload):
        raise AvroError("avro block has trailing bytes")
    return pa.table({nm: pa.array(c, type=_PA_TYPES[t])
                     for (nm, t, _nl), c in zip(specs, cols)})


def iter_avro_blocks(f):
    """Yield one Arrow table per Avro block from a sequential stream
    (used by the datasource; also handy for tests)."""
    specs, codec, sync = _read_header(f)

    def read_long_stream():
        z = 0
        shift = 0
        while True:
            b = f.read(1)
            if not b:
                if shift:  # EOF only legal BETWEEN blocks
                    raise AvroError("avro varint truncated at EOF")
                return None
            z |= (b[0] & 0x7F) << shift
            if not b[0] & 0x80:
                return (z >> 1) ^ -(z & 1)
            shift += 7

    while True:
        cnt = read_long_stream()
        if cnt is None:
            return  # clean EOF
        size = read_long_stream()
        if size is None or size < 0 or cnt < 0:
            raise AvroError("avro block header corrupt")
        payload = f.read(size)
        if len(payload) != size:
            raise AvroError("avro block truncated")
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        marker = f.read(16)
        if marker != sync:
            raise AvroError("avro sync marker mismatch")
        yield _decode_block(payload, cnt, specs)


def _parquet_nullable_cols(parquet_path: str, columns) -> frozenset:
    """Columns with any null in the parquet file, from FOOTER statistics
    only (no column read).  A column whose stats are absent is treated
    as nullable — a union schema holds all-non-null data fine, and the
    answer stays the same for every shard."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(parquet_path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    nullable = set()
    for name in columns:
        ci = idx.get(name)
        if ci is None:
            continue  # write_avro will fail on the missing column read
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(ci).statistics
            if stats is None or stats.null_count is None \
                    or stats.null_count > 0:
                nullable.add(name)
                break
    return frozenset(nullable)


def mirror_documents_avro(parquet_path: str, out_dir: str,
                          columns=("doc_id", "text"),
                          rows_per_shard: int = 25_000) -> list:
    """Deterministic sharded Avro mirror of selected parquet columns.
    Returns the shard paths (sorted).  Nullability is decided ONCE from
    the parquet footer so every shard carries the same Avro schema."""
    nullable_cols = _parquet_nullable_cols(parquet_path, columns)

    def write_shard(shard: pa.Table, tmp: str) -> None:
        write_avro(shard, tmp, nullable_cols=nullable_cols)

    return mirror_sharded(parquet_path, out_dir, "avro", write_shard,
                          columns, rows_per_shard)


def read_avro(paths, **kwargs):
    """Ray Dataset over Avro Object Container Files (one read task per
    file; one Arrow table per Avro block, streamed — the sequential
    NativeFile is consumed incrementally, never whole-file-buffered)."""
    import ray.data as rd
    from ray.data.datasource import FileBasedDatasource

    class AvroDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["avro"]

        def _read_stream(self, f, path: str):
            yield from iter_avro_blocks(f)

    return rd.read_datasource(AvroDatasource(paths, **kwargs))
