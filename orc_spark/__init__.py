"""orc_spark: a PySpark-native columnar lightweight-compression engine.

Re-creates the encoding semantics of the Apache ORC writer (behavioral
reference: scritchley/orc) — dictionary, RLE v1/v2 with delta and
patched-base, bit-packing, frame-of-reference, FSST — as vectorized
pandas/Arrow UDF kernels over DataFrames of pre-tokenized training
sequences, with Spark supplying scan/shuffle/parallelism.
"""

__version__ = "0.1.0"
