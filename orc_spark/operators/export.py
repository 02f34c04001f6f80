"""Export utilities — the orc2csv tool analog
(reference tools/orc2csv/main.go:1-70): decode selected columns of an
encoded stripe table and write CSV.  Spark's writer replaces the
streaming cursor; column selection maps to stream projection."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..stripe import DEFAULT_CODEC as stripe_DEFAULT_CODEC,  TOKEN_SCHEMA
from . import encode as enc_ops


def encoded_to_csv(enc_df: DataFrame, path: str, specs=TOKEN_SCHEMA,
                   columns: list[str] | None = None,
                   codec: str = stripe_DEFAULT_CODEC) -> None:
    dec = enc_ops.decode(enc_df, specs, columns=columns, codec=codec)
    out = dec
    for f in dec.schema.fields:
        t = f.dataType.typeName()
        # CSV cannot carry containers or raw bytes: containers go to
        # JSON text, binary to hex (the decode layer supports
        # struct/map/binary, so the exporter must too)
        if t in ("array", "map", "struct"):
            out = out.withColumn(f.name, F.to_json(F.col(f.name)))
        elif t == "binary":
            out = out.withColumn(f.name, F.hex(F.col(f.name)))
    out.write.mode("overwrite").option("header", True).csv(path)
