"""Stripe-level encode/decode round trips over Arrow batches, covering
the writer_test.go edge patterns (FIXTURES.md §3) adapted to the token
schema: nulls, empty arrays, all-null rows, alternating patterns."""

import numpy as np
import pyarrow as pa
import pytest

from orc_spark import stripe

RNG = np.random.default_rng(42)


def _token_batch(n=1000, with_nulls=False, with_empties=False):
    lens = RNG.integers(1, 80, n)
    tokens = [RNG.integers(0, 50257, l).astype(np.int32) for l in lens]
    if with_empties:
        for i in range(0, n, 7):
            tokens[i] = np.array([], dtype=np.int32)
    tokens = [t.tolist() for t in tokens]
    if with_nulls:
        tokens = [None if i % 11 == 0 else t for i, t in enumerate(tokens)]
    n_tok = [len(t) if t is not None else None for t in tokens]
    return pa.table({
        "doc_id": [f"doc-{i:012d}" for i in range(n)],
        "tokens": pa.array(tokens, pa.list_(pa.int32())),
        "n_tok": pa.array(n_tok, pa.int32()),
        "source": pa.array([["cc", "wiki", "books", "code"][i % 4]
                            for i in range(n)]),
    })


@pytest.mark.parametrize("codec", ["none", "zlib"])
@pytest.mark.parametrize("nulls,empties", [(False, False), (True, True)])
def test_token_stripe_roundtrip(codec, nulls, empties):
    batch = _token_batch(1000, with_nulls=nulls, with_empties=empties)
    row = stripe.encode_stripe(batch, stripe.TOKEN_SCHEMA, codec=codec)
    assert row["n_rows"] == 1000
    out = stripe.decode_stripe(row, stripe.TOKEN_SCHEMA, codec=codec)
    assert out.num_rows == 1000
    for col in ("doc_id", "tokens", "n_tok", "source"):
        assert out.column(col).to_pylist() == batch.column(col).to_pylist(), col


def test_source_uses_dictionary_doc_id_direct():
    batch = _token_batch(500)
    row = stripe.encode_stripe(batch, stripe.TOKEN_SCHEMA, codec="none")
    import json
    encodings = json.loads(row["encodings"])
    assert encodings["source"].startswith("DICTIONARY_V2")  # 4 distinct / 500
    assert encodings["doc_id"].startswith("DIRECT_V2")  # all distinct
    # present streams elided when no nulls
    assert row["doc_id__PRESENT"] is None
    assert row["tokens__PRESENT"] is None


def test_all_null_rows():
    # writer_test.go:217-262 analog
    batch = pa.table({
        "doc_id": pa.array([None, None], pa.string()),
        "tokens": pa.array([None, None], pa.list_(pa.int32())),
        "n_tok": pa.array([None, None], pa.int32()),
        "source": pa.array([None, None], pa.string()),
    })
    row = stripe.encode_stripe(batch, stripe.TOKEN_SCHEMA)
    out = stripe.decode_stripe(row, stripe.TOKEN_SCHEMA)
    assert out.column("tokens").to_pylist() == [None, None]
    assert out.column("doc_id").to_pylist() == [None, None]


def test_mixed_types_roundtrip():
    specs = stripe.parse_schema([
        ("i", "int"), ("l", "bigint"), ("d", "double"), ("f", "float"),
        ("b", "boolean"), ("s", "string"), ("bin", "binary"),
        ("ts", "timestamp"), ("dt", "date"), ("arr", "list<bigint>"),
    ])
    n = 777
    batch = pa.table({
        "i": pa.array(RNG.integers(-2**31, 2**31, n), pa.int32()),
        "l": pa.array(RNG.integers(-2**62, 2**62, n), pa.int64()),
        "d": pa.array(RNG.normal(size=n)),
        "f": pa.array(RNG.normal(size=n).astype(np.float32)),
        "b": pa.array(RNG.integers(0, 2, n).astype(bool)),
        "s": pa.array([f"s{i % 50}" for i in range(n)]),
        "bin": pa.array([bytes([i % 256, (i * 7) % 256]) for i in range(n)],
                        pa.binary()),
        "ts": pa.array(RNG.integers(1.3e15, 1.8e15, n), pa.timestamp("us")),
        "dt": pa.array(RNG.integers(0, 20000, n).astype(np.int32), pa.date32()),
        "arr": pa.array([RNG.integers(-10**12, 10**12, RNG.integers(0, 9)).tolist()
                         for _ in range(n)], pa.list_(pa.int64())),
    })
    row = stripe.encode_stripe(batch, specs)
    out = stripe.decode_stripe(row, specs)
    for name in batch.column_names:
        got = out.column(name).to_pylist()
        want = batch.column(name).to_pylist()
        assert got == want, name


def test_timestamp_nanos_roundtrip():
    specs = stripe.parse_schema([("ts", "timestamp")])
    us = [0, 1, 999999, 1_000_000, 1420070400_000000, -5_000_001]
    batch = pa.table({"ts": pa.array(us, pa.timestamp("us"))})
    row = stripe.encode_stripe(batch, specs)
    out = stripe.decode_stripe(row, specs)
    assert out.column("ts").cast(pa.int64()).to_pylist() == us


def test_compression_accounting():
    batch = _token_batch(2000)
    row = stripe.encode_stripe(batch, stripe.TOKEN_SCHEMA, codec="zlib")
    raw = stripe.encode_stripe(batch, stripe.TOKEN_SCHEMA, codec="none")
    assert row["enc_bytes"] < raw["enc_bytes"]
    assert row["enc_bytes"] > 0


def test_decimal_roundtrip():
    from decimal import Decimal
    specs = stripe.parse_schema([("d", "decimal(18,4)")])
    vals = [Decimal("123.4567"), Decimal("-0.0001"), None,
            Decimal("99999999999999.9999"), Decimal("0.0000")]
    batch = pa.table({"d": pa.array(vals, pa.decimal128(18, 4))})
    row = stripe.encode_stripe(batch, specs)
    out = stripe.decode_stripe(row, specs)
    assert out.column("d").to_pylist() == vals


def test_dictionary_v1_insertion_order():
    from orc_spark.codecs import dictionary as d
    # dictionary_test.go:8-71 semantics: arrival-order indexes
    idx, keys = d.dictionary_v1(["owen", "ashutosh", "owen", "alan"])
    assert idx.tolist() == [0, 1, 0, 2]
    assert keys == ["owen", "ashutosh", "alan"]


def test_stream_bytes_recorded():
    import json
    batch = _token_batch(500)
    row = stripe.encode_stripe(batch, stripe.TOKEN_SCHEMA, codec="zlib")
    st = json.loads(row["stats"])
    assert "DATA" in st["tokens"]["stream_bytes"]
    raw, framed = st["tokens"]["stream_bytes"]["DATA"]
    assert raw > 0 and framed > 0


def test_schema_string_roundtrip():
    s = "struct<doc_id:string,tokens:array<int>,n_tok:int,source:string>"
    specs = stripe.parse_schema_string(s)
    assert [(c.name, c.typ) for c in specs] == [
        ("doc_id", "string"), ("tokens", "list<int>"), ("n_tok", "int"),
        ("source", "string")]
    assert stripe.schema_string(specs) == s
    nested = stripe.parse_schema_string(
        "struct<a:decimal(18,4),b:array<bigint>,c:timestamp>")
    assert nested[0].decimal_params() == (18, 4)
    assert nested[1].child_typ == "bigint"
