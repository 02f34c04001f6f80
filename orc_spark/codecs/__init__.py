"""Pure-numpy ORC-style codec kernels (array-in / bytes-out).

These are the executor-side building blocks: the Spark layer calls them
from vectorized mapInPandas kernels; nothing here touches Spark.
"""

from . import (bits, byterle, compression, decimal, dictionary, fsst, rle1,
               rle2)

__all__ = [
    "bits", "byterle", "compression", "decimal", "dictionary", "fsst",
    "rle1", "rle2",
]
