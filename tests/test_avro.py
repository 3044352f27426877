"""Pure-Python Avro container source (sources/avro.py): spec-pinned
decode, round-trip, splittable Spark reads, and failure contracts."""

from __future__ import annotations

import struct
from datetime import date, datetime, timezone

import pytest

from gcp_batch_load_hive_partitioned_data_from_gcs_to_bigquery_spark.sources import avro as AV


def _zigzag(v: int) -> bytes:
    z = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_reader_decodes_hand_assembled_spec_bytes(tmp_path):
    """The golden pin: a container file assembled byte-by-byte from the
    Avro 1.x spec (NOT via write_avro), so the reader is checked against
    the public format, not against its sibling writer."""
    schema = (
        b'{"type":"record","name":"r","fields":'
        b'[{"name":"a","type":"long"},{"name":"b","type":"string"}]}'
    )
    sync = bytes(range(16))
    body = _zigzag(3) + _zigzag(2) + b"hi" + _zigzag(-4) + _zigzag(5) + b"world"
    blob = (
        b"Obj\x01"
        + _zigzag(1)  # metadata map: one entry
        + _zigzag(len(b"avro.schema")) + b"avro.schema"
        + _zigzag(len(schema)) + schema
        + b"\x00"  # end of map
        + sync
        + _zigzag(2)            # block: 2 records
        + _zigzag(len(body))
        + body
        + sync
    )
    p = tmp_path / "golden.avro"
    p.write_bytes(blob)
    assert list(AV.read_avro_records(str(p))) == [(3, "hi"), (-4, "world")]
    assert AV.spark_schema_of(str(p)) == "a bigint, b string"


def test_roundtrip_all_supported_types_deflate(tmp_path):
    schema = {
        "type": "record",
        "name": "evt",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "flag", "type": "boolean"},
            {"name": "small", "type": "int"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "raw", "type": "bytes"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "day", "type": {"type": "int", "logicalType": "date"}},
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            },
        ],
    }
    rows = [
        (
            i,
            i % 2 == 0,
            -i,
            float(struct.unpack("<f", struct.pack("<f", i / 3.0))[0]),
            i / 7.0,
            bytes([i % 256, 255 - i % 256]),
            None if i % 5 == 0 else f"n{i}",
            [f"t{i}", "x"] if i % 3 else [],
            date(1970, 1, 1),
            datetime(2024, 1, 1, 0, 0, i % 60, tzinfo=timezone.utc),
        )
        for i in range(250)
    ]
    p = str(tmp_path / "rt.avro")
    AV.write_avro(p, schema, rows, codec="deflate", block_rows=64)  # 4 blocks
    got = list(AV.read_avro_records(p))
    assert got == rows
    # block index: planner sees 4 blocks without reading payloads
    blocks = list(AV.scan_blocks(p))
    assert [n for _, n, _ in blocks] == [64, 64, 64, 58]


def test_spark_reads_avro_dir_with_splits(spark, tmp_path):
    """format('pyavro') over a directory: schema from the writer schema,
    rows complete, and a tiny split_mb forces >1 input partition per
    file (the sync-marker splittability the 100-TB shape relies on)."""
    schema = {
        "type": "record",
        "name": "n",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "w", "type": "double"},
        ],
    }
    d = tmp_path / "land"
    d.mkdir()
    rows_a = [(i, f"a{i}", i / 2.0) for i in range(500)]
    rows_b = [(1000 + i, None if i % 4 == 0 else f"b{i}", -i / 2.0) for i in range(300)]
    AV.write_avro(str(d / "a.avro"), schema, rows_a, codec="deflate", block_rows=50)
    AV.write_avro(str(d / "b.avro"), schema, rows_b, codec="null", block_rows=50)
    try:
        spark.dataSource.register(AV.AvroDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("pyavro")
        .option("path", str(d))
        .option("split_mb", str(0.002))  # ~2 KB -> many block-run splits
        .load()
    )
    assert df.schema.simpleString() == "struct<k:bigint,name:string,w:double>"
    assert df.rdd.getNumPartitions() > 2
    got = sorted((r.k, r.name, r.w) for r in df.collect())
    assert got == sorted(rows_a + rows_b)


def test_failure_contracts(tmp_path):
    p = tmp_path / "bad.avro"
    p.write_bytes(b"PAR1whatever")
    with pytest.raises(ValueError, match="magic"):
        list(AV.read_avro_records(str(p)))

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": "long"}],
    }
    good = str(tmp_path / "good.avro")
    AV.write_avro(good, schema, [(1,), (2,)], block_rows=1)
    blob = bytearray(open(good, "rb").read())
    blob[-1] ^= 0xFF  # corrupt the final sync marker
    bad_sync = str(tmp_path / "badsync.avro")
    open(bad_sync, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="sync"):
        list(AV.read_avro_records(bad_sync))

    # a MULTI-branch union (genuine schema evolution) stays a clear
    # unsupported-feature guard (enum/map/fixed/decimal are supported
    # as of r16 — see test_enum_map_fixed_decimal_roundtrip)
    union_schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "u", "type": ["null", "long", "string"]}],
    }
    with pytest.raises(NotImplementedError):
        AV.write_avro(str(tmp_path / "union3.avro"), union_schema, [(1,)])
    # reader-side: a valid container whose schema holds the 3-branch node
    import json as _json

    raw = _json.dumps(union_schema).encode()
    sync = bytes(16)
    blob = (
        b"Obj\x01" + _zigzag(1)
        + _zigzag(11) + b"avro.schema" + _zigzag(len(raw)) + raw
        + b"\x00" + sync
    )
    union_file = str(tmp_path / "union3b.avro")
    open(union_file, "wb").write(blob)
    with pytest.raises(NotImplementedError, match="union"):
        AV.spark_schema_of(union_file)


def test_snappy_decompress_spec_bytes():
    """The snappy block format pinned against hand-assembled bytes from
    the public format description (NOT via _snappy_compress): every
    literal length form, all three copy tags, the overlapping-copy RLE
    rule, and the failure contracts."""
    # literal "abc" + OVERLAPPING copy (tag 01, offset 3 < length 9) + literal "X"
    s = b"\x0d" + b"\x08abc" + bytes([((9 - 4) << 2) | 1, 3]) + b"\x00X"
    assert AV._snappy_decompress(s) == b"abcabcabcabcX"

    # 2-byte-offset copy (tag 10): "0123456789" then copy len 4 @ off 10
    s = (
        b"\x0e"
        + bytes([(10 - 1) << 2]) + b"0123456789"
        + bytes([((4 - 1) << 2) | 2]) + (10).to_bytes(2, "little")
    )
    assert AV._snappy_decompress(s) == b"01234567890123"

    # 4-byte-offset copy (tag 11), same semantics
    s = (
        b"\x0e"
        + bytes([(10 - 1) << 2]) + b"0123456789"
        + bytes([((4 - 1) << 2) | 3]) + (10).to_bytes(4, "little")
    )
    assert AV._snappy_decompress(s) == b"01234567890123"

    # long literal (> 60 bytes -> 1-byte extended length form)
    raw = bytes(range(256)) * 2  # 512 bytes
    s = bytearray()
    v = len(raw)
    while True:
        b = v & 0x7F
        v >>= 7
        s.append(b | 0x80 if v else b)
        if not v:
            break
    s.append(61 << 2)  # 2-byte length form
    s += (len(raw) - 1).to_bytes(2, "little")
    s += raw
    assert AV._snappy_decompress(bytes(s)) == raw

    with pytest.raises(ValueError, match="offset"):
        AV._snappy_decompress(b"\x04" + bytes([((4 - 4) << 2) | 1, 9]))  # off 9 > out 0
    with pytest.raises(ValueError, match="length mismatch"):
        AV._snappy_decompress(b"\x7f" + b"\x08abc")  # claims 127, yields 3
    with pytest.raises(EOFError):
        AV._snappy_decompress(b"\x0a\xf0")  # truncated extended literal length

    # compressor: spec-valid literal-only stream, empty + >256 chunking
    assert AV._snappy_decompress(AV._snappy_compress(b"")) == b""
    big = bytes(i % 251 for i in range(70_000))  # spans 2-byte form + 2 chunks
    assert AV._snappy_decompress(AV._snappy_compress(big)) == big


def test_avro_snappy_golden_block_and_crc(tmp_path):
    """Golden pin for the snappy CODEC layer: an Avro container
    assembled byte-by-byte whose block payload is hand-built snappy —
    including a genuine COPY element over the repeated record text —
    plus the big-endian CRC32-of-uncompressed suffix the Avro spec
    appends. A flipped CRC byte must fail loudly."""
    import zlib

    schema = (
        b'{"type":"record","name":"r","fields":'
        b'[{"name":"a","type":"long"},{"name":"b","type":"string"}]}'
    )
    sync = bytes(range(16))
    # two records sharing text so the copy element has a real match
    body = (
        _zigzag(3) + _zigzag(6) + b"ababab" + _zigzag(-4) + _zigzag(6) + b"ababab"
    )
    head = body[: body.index(b"ababab") + 6 + len(_zigzag(-4) + _zigzag(6))]
    assert body == head + b"ababab"  # tail is an exact 6-byte repeat
    off = 6 + len(_zigzag(-4) + _zigzag(6))  # distance back to first "ababab"
    snappy = bytearray()
    v = len(body)
    while True:
        b = v & 0x7F
        v >>= 7
        snappy.append(b | 0x80 if v else b)
        if not v:
            break
    snappy.append((len(head) - 1) << 2)  # literal: everything before the repeat
    snappy += head
    snappy.append(((6 - 4) << 2) | 1)  # copy tag 01: len 6, 1-byte offset
    snappy.append(off)
    payload = bytes(snappy) + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "big")
    blob = (
        b"Obj\x01"
        + _zigzag(2)
        + _zigzag(len(b"avro.schema")) + b"avro.schema"
        + _zigzag(len(schema)) + schema
        + _zigzag(len(b"avro.codec")) + b"avro.codec"
        + _zigzag(len(b"snappy")) + b"snappy"
        + b"\x00"
        + sync
        + _zigzag(2)
        + _zigzag(len(payload))
        + payload
        + sync
    )
    p = tmp_path / "golden_snappy.avro"
    p.write_bytes(blob)
    assert list(AV.read_avro_records(str(p))) == [(3, "ababab"), (-4, "ababab")]

    bad = bytearray(blob)
    bad[-17] ^= 0xFF  # last CRC byte (payload tail, just before final sync)
    p2 = tmp_path / "badcrc.avro"
    p2.write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="CRC"):
        list(AV.read_avro_records(str(p2)))


def test_roundtrip_snappy_spark(spark, tmp_path):
    """write_avro(codec='snappy') -> format('pyavro') round trip, split
    planning unchanged (block seeks use the byte-size prefix, codec
    doesn't matter to the planner)."""
    schema = {
        "type": "record",
        "name": "n",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "w", "type": "double"},
        ],
    }
    d = tmp_path / "land_snappy"
    d.mkdir()
    rows = [(i, None if i % 7 == 0 else f"s{i}" * 20, i / 3.0) for i in range(600)]
    AV.write_avro(str(d / "s.avro"), schema, rows, codec="snappy", block_rows=40)
    try:
        spark.dataSource.register(AV.AvroDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("pyavro")
        .option("path", str(d))
        .option("split_mb", str(0.002))
        .load()
    )
    assert df.rdd.getNumPartitions() > 2
    assert sorted((r.k, r.name, r.w) for r in df.collect()) == sorted(rows)


def test_enum_map_fixed_decimal_roundtrip(spark, tmp_path):
    """r16: the last writer-type gaps the r15 verdict listed —
    enum (→ string), map (→ map<string,V>), fixed (→ binary), and the
    decimal logical type on bytes AND fixed (big-endian
    two's-complement unscaled per the spec, → DecimalType) — round-trip
    through write_avro → format('pyavro'), plus a golden decode of
    hand-assembled spec bytes for each node so the reader is pinned to
    the public format, not its sibling writer."""
    from decimal import Decimal

    schema = {
        "type": "record",
        "name": "n",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "status", "type": {"type": "enum", "name": "S",
                                        "symbols": ["OK", "WARN", "ERR"]}},
            {"name": "tags", "type": {"type": "map", "values": "long"}},
            {"name": "sig", "type": {"type": "fixed", "name": "F4", "size": 4}},
            {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                        "precision": 10, "scale": 2}},
            {"name": "rate", "type": {"type": "fixed", "name": "F3", "size": 3,
                                      "logicalType": "decimal",
                                      "precision": 7, "scale": 3}},
        ],
    }
    rows = [
        (1, "OK", {"a": 2, "b": -3}, b"\x01\x02\x03\x04", Decimal("12345.67"), Decimal("1.500")),
        (2, "ERR", {}, b"\xff\x00\xff\x00", Decimal("-0.01"), Decimal("-2.048")),
    ]
    p = str(tmp_path / "typed.avro")
    AV.write_avro(p, schema, rows, codec="snappy", block_rows=1)
    assert AV.spark_schema_of(p) == (
        "k bigint, status string, tags map<string,bigint>, sig binary,"
        " amount decimal(10,2), rate decimal(7,3)"
    )
    assert list(AV.read_avro_records(p)) == rows

    try:
        spark.dataSource.register(AV.AvroDataSource)
    except Exception:
        pass
    df = spark.read.format("pyavro").option("path", p).load()
    got = sorted(
        (r.k, r.status, dict(r.tags), bytes(r.sig), r.amount, r.rate)
        for r in df.collect()
    )
    assert got == sorted(rows)

    # golden spec bytes: one record, hand-encoded per the Avro spec
    schema2 = (
        b'{"type":"record","name":"g","fields":['
        b'{"name":"e","type":{"type":"enum","name":"E","symbols":["X","Y"]}},'
        b'{"name":"m","type":{"type":"map","values":"string"}},'
        b'{"name":"f","type":{"type":"fixed","name":"F","size":2}},'
        b'{"name":"d","type":{"type":"bytes","logicalType":"decimal",'
        b'"precision":6,"scale":2}}]}'
    )
    sync = bytes(range(16))
    body = (
        _zigzag(1)                       # enum index 1 -> "Y"
        + _zigzag(1)                     # map: one entry in this block
        + _zigzag(2) + b"hi"             # key "hi"
        + _zigzag(3) + b"yes"            # value "yes"
        + _zigzag(0)                     # map terminator
        + b"\xab\xcd"                    # fixed, 2 raw bytes
        + _zigzag(2) + b"\xfb\x2e"       # decimal bytes: -1234 -> -12.34
    )
    blob = (
        b"Obj\x01" + _zigzag(1)
        + _zigzag(11) + b"avro.schema" + _zigzag(len(schema2)) + schema2
        + b"\x00" + sync
        + _zigzag(1) + _zigzag(len(body)) + body + sync
    )
    g = tmp_path / "golden_typed.avro"
    g.write_bytes(blob)
    assert list(AV.read_avro_records(str(g))) == [
        ("Y", {"hi": "yes"}, b"\xab\xcd", Decimal("-12.34"))
    ]


def test_zstandard_codec_roundtrip_and_spec_pins(spark, tmp_path):
    """r17 (r16 verdict frontier item 4): the ``zstandard`` codec —
    each block one zstd frame, no Avro-level checksum. Pins:
    (a) write→read round-trip across multi-block files (typed fields
    included) plus the Spark datasource path; (b) a GOLDEN container
    whose block payload is a HAND-ASSEMBLED RFC 8878 frame (raw block,
    single-segment header with 1-byte Frame_Content_Size) so the
    reader is pinned to the public frame format, not pyarrow's sibling
    compressor; (c) a frame that legitimately OMITS Frame_Content_Size
    (streaming producer) raises the documented explicit guard instead
    of guessing buffer sizes."""
    from decimal import Decimal

    import pytest

    schema = {
        "type": "record",
        "name": "n",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                        "precision": 10, "scale": 2}},
        ],
    }
    rows = [(i, f"row-{i}" * 20, Decimal(f"{i}.25")) for i in range(50)]
    p = str(tmp_path / "z.avro")
    AV.write_avro(p, schema, rows, codec="zstandard", block_rows=7)
    assert AV.spark_schema_of(p) == "k bigint, name string, amount decimal(10,2)"
    assert list(AV.read_avro_records(p)) == rows
    # blocks are genuinely zstd frames (magic), and compression bites
    # on the repetitive payload
    blocks = list(AV.scan_blocks(p))
    assert len(blocks) == 8  # 50 rows at 7/block
    with open(p, "rb") as fh:
        off, nrec, nbytes = blocks[0]
        fh.seek(off)
        AV._read_long(fh); AV._read_long(fh)
        frame = fh.read(nbytes)
    assert frame[:4] == AV._ZSTD_MAGIC

    try:
        spark.dataSource.register(AV.AvroDataSource)
    except Exception:
        pass
    df = spark.read.format("pyavro").option("path", p).load()
    got = sorted((r.k, r.name, r.amount) for r in df.collect())
    assert got == sorted(rows)

    # golden: hand-assembled RFC 8878 frame — single_segment=1 (bit 5),
    # fcs_code=0 → 1-byte FCS; one RAW block (header 3 bytes LE:
    # bit0 last=1, bits1-2 type=00, size<<3)
    body = bytearray()
    AV._encode("long", 7, body)
    AV._encode("string", "zs", body)
    raw = bytes(body)
    frame = (
        AV._ZSTD_MAGIC
        + bytes([0x20])                      # FHD: single-segment, 1-byte FCS
        + bytes([len(raw)])                  # Frame_Content_Size
        + ((len(raw) << 3) | 1).to_bytes(3, "little")  # RAW last block
        + raw
    )
    assert AV._zstd_frame_content_size(frame) == len(raw)
    assert AV._zstd_block_decode(frame) == raw
    schema2 = (b'{"type":"record","name":"g","fields":['
               b'{"name":"k","type":"long"},{"name":"s","type":"string"}]}')
    sync = bytes(range(16))
    blob = (
        b"Obj\x01" + _zigzag(2)
        + _zigzag(11) + b"avro.schema" + _zigzag(len(schema2)) + schema2
        + _zigzag(10) + b"avro.codec" + _zigzag(9) + b"zstandard"
        + b"\x00" + sync
        + _zigzag(1) + _zigzag(len(frame)) + frame + sync
    )
    g = tmp_path / "golden_zstd.avro"
    g.write_bytes(blob)
    assert list(AV.read_avro_records(str(g))) == [(7, "zs")]

    # FCS-absent frame (FHD 0x00: windowed, no FCS) → explicit guard
    no_fcs = (
        AV._ZSTD_MAGIC
        + bytes([0x00, 0x00])                # FHD + Window_Descriptor
        + ((len(raw) << 3) | 1).to_bytes(3, "little")
        + raw
    )
    assert AV._zstd_frame_content_size(no_fcs) == -1
    with pytest.raises(NotImplementedError, match="Frame_Content_Size"):
        AV._zstd_block_decode(no_fcs)


def test_decimal_writer_rejects_excess_scale(tmp_path):
    """r17 (r16 ADVICE): a Decimal with more fractional digits than the
    schema's declared scale must FAIL the encode, not silently round
    HALF_EVEN — a fixture writer emitting different bytes than the
    value it was given would mask round-trip bugs. Exact-trailing-zero
    values still pass."""
    import pytest
    from decimal import Decimal

    schema = {
        "type": "record",
        "name": "n",
        "fields": [
            {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                        "precision": 10, "scale": 2}},
        ],
    }
    ok = str(tmp_path / "ok.avro")
    AV.write_avro(ok, schema, [(Decimal("1.230"),)])  # exact at scale 2
    assert list(AV.read_avro_records(ok)) == [(Decimal("1.23"),)]

    with pytest.raises(ValueError, match="scale"):
        AV.write_avro(str(tmp_path / "bad.avro"), schema, [(Decimal("1.234"),)])

    # r18 (r17 ADVICE): an exactly-representable value with MORE
    # significant digits than the default 28-digit context must still
    # encode — the Inexact trap exists to catch scale violations, not
    # precision-rounding artifacts of the working context
    wide_schema = {
        "type": "record",
        "name": "w",
        "fields": [
            {"name": "amount", "type": {"type": "bytes", "logicalType": "decimal",
                                        "precision": 38, "scale": 2}},
        ],
    }
    wide = Decimal("123456789012345678901234567890123456.78")  # 38 digits
    wp = str(tmp_path / "wide.avro")
    AV.write_avro(wp, wide_schema, [(wide,)])
    assert list(AV.read_avro_records(wp)) == [(wide,)]
    # and the trap still fires on a genuine scale violation at width
    with pytest.raises(ValueError, match="scale"):
        AV.write_avro(
            str(tmp_path / "widebad.avro"),
            wide_schema,
            [(Decimal("123456789012345678901234567890123456.789"),)],
        )


# ---------------------------------------------------------------------------
# property tests (hypothesis): the snappy layer and the container writer
# under arbitrary inputs — the hand-assembled pins above check known
# byte sequences; these check the invariants hold everywhere.

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=70_000))
def test_snappy_roundtrip_property(data):
    """decompress(compress(x)) == x for arbitrary bytes, across the
    short/1-byte/2-byte literal length forms and the chunk boundary."""
    assert AV._snappy_decompress(AV._snappy_compress(data)) == data


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-(2**40), 2**40), st.text(max_size=40)),
        max_size=60,
    ),
    st.sampled_from(["null", "deflate", "snappy", "zstandard"]),
)
def test_container_roundtrip_property(tmp_path_factory, rows, codec):
    """write_avro -> read_avro_records is identity for arbitrary
    (long, string) rows under every supported codec (zigzag negatives,
    unicode, empty blocks, empty files)."""
    schema = {
        "type": "record",
        "name": "p",
        "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": "string"}],
    }
    p = str(tmp_path_factory.mktemp("prop") / "p.avro")
    AV.write_avro(p, schema, rows, codec=codec, block_rows=7)
    assert list(AV.read_avro_records(p)) == rows


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=70_000))
def test_zstd_block_roundtrip_property(data):
    """decode(encode(x)) == x for arbitrary bytes through the zstd
    layer, and the RFC 8878 frame-header parse recovers the exact
    Frame_Content_Size from every frame the encoder emits (covering
    the 1/2/4-byte FCS field widths and the fcs_code=1 +256 offset
    as sizes cross 256 and 64 KiB)."""
    frame = AV._zstd_block_encode(data)
    assert frame[:4] == AV._ZSTD_MAGIC
    assert AV._zstd_frame_content_size(frame) == len(data)
    assert AV._zstd_block_decode(frame) == data
