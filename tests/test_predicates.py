"""SQL-string predicate parser (orc_spark/predicates.py)."""

import pytest

from orc_spark.predicates import parse_predicate


def test_parse_single_comparison():
    assert parse_predicate("n_tok >= 60") == [("n_tok", ">=", 60)]
    assert parse_predicate("v<3") == [("v", "<", 3)]
    assert parse_predicate("x = 1.5") == [("x", "==", 1.5)]
    assert parse_predicate("x == -2e3") == [("x", "==", -2000.0)]


def test_parse_string_literals():
    assert parse_predicate("source = 'web'") == \
        [("source", "==", "web")]
    assert parse_predicate("s = 'it''s'") == [("s", "==", "it's")]


def test_parse_conjunction_and_between():
    assert parse_predicate(
        "n_tok >= 60 AND source = 'web' AND v BETWEEN 2 AND 7") == [
            ("n_tok", ">=", 60), ("source", "==", "web"),
            ("v", "between", (2, 7))]
    # AND is case-insensitive
    assert parse_predicate("a > 1 and b < 2") == \
        [("a", ">", 1), ("b", "<", 2)]


def test_parse_rejects_disjunction_and_garbage():
    with pytest.raises(ValueError, match="df.filter"):
        parse_predicate("a > 1 OR b < 2")
    with pytest.raises(ValueError):
        parse_predicate("a > 1 AND")
    with pytest.raises(ValueError):
        parse_predicate("(a > 1)")
    with pytest.raises(ValueError):
        parse_predicate("a !> 1")
    with pytest.raises(ValueError):
        parse_predicate("a BETWEEN 1 OR 2")


def test_parse_in_and_like_prefix():
    """IN lists and prefix LIKE parse to the pruning grammar (r5);
    non-prunable LIKE patterns still raise with a df.filter hint."""
    assert parse_predicate("source IN ('web', 'book') AND n >= 3") \
        == [("source", "in", ("web", "book")), ("n", ">=", 3)]
    assert parse_predicate("k in (1, 2.5, 3)") == \
        [("k", "in", (1, 2.5, 3))]
    assert parse_predicate("doc_id LIKE 'ab%'") == \
        [("doc_id", "prefix", "ab")]
    assert parse_predicate("rec.x IN (7)") == [("rec.x", "in", (7,))]
    for bad in ("a LIKE '%ab'", "a LIKE 'a%b%'", "a LIKE 'a_b%'",
                "a LIKE '%'", "a IN ()", "a IN ('x' 'y')",
                "a IN ('x',)", "a LIKE 5"):
        with pytest.raises(ValueError):
            parse_predicate(bad)


def test_string_predicate_equals_tuple_predicate(spark, tmp_path):
    """orc_scan and decode accept the SQL form; results identical to
    the tuple form (same pruning, same residual)."""
    import numpy as np
    import pyarrow as pa
    from orc_spark.sources import orcscan, orcwriter
    batch = pa.RecordBatch.from_arrays(
        [pa.array(np.arange(4000, dtype=np.int64)),
         pa.array([f"s{i // 1000}" for i in range(4000)])],
        names=["v", "tag"])
    p = str(tmp_path / "a.orc")
    w = orcwriter.ORCFileWriter(p, codec="zlib", stripe_rows=1000)
    w.write_batch(batch)
    w.close()
    a = orcscan.orc_scan(spark, p,
                         predicate=[("v", ">=", 1500), ("v", "<", 2600)]) \
        .orderBy("v").collect()
    b = orcscan.orc_scan(spark, p,
                         predicate="v >= 1500 AND v < 2600") \
        .orderBy("v").collect()
    assert a == b and len(a) == 1100
    c = orcscan.orc_scan(spark, p, predicate="tag = 's0'").count()
    assert c == 1000


def test_parse_predicate_roundtrip_fuzz():
    """Seeded fuzz: render random conjunction tuples to SQL and parse
    back — identity for every op/type combination the grammar covers."""
    import random
    random.seed(5)
    ops = [">=", ">", "<=", "<", "=="]
    for _ in range(200):
        preds = []
        parts = []
        for _ in range(random.randrange(1, 4)):
            col = random.choice(["n_tok", "v", "source", "a_1"])
            kind = random.choice(["int", "float", "str", "between"])
            if kind == "between":
                lo, hi = sorted(random.sample(range(-50, 50), 2))
                preds.append((col, "between", (lo, hi)))
                parts.append(f"{col} BETWEEN {lo} AND {hi}")
            elif kind == "int":
                op = random.choice(ops)
                v = random.randrange(-1000, 1000)
                preds.append((col, op, v))
                parts.append(
                    f"{col} {'=' if op == '==' else op} {v}")
            elif kind == "float":
                op = random.choice(ops)
                v = round(random.uniform(-10, 10), 3)
                preds.append((col, op, v))
                parts.append(f"{col} {op} {v}")
            else:
                v = random.choice(["web", "it's", "a b c", ""])
                preds.append((col, "==", v))
                parts.append(f"{col} = '" + v.replace("'", "''") + "'")
        assert parse_predicate(" AND ".join(parts)) == preds
