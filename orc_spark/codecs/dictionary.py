"""String column encoding: sorted dictionary vs direct, auto-selected.

Behavioral reference: scritchley/orc treewriter.go:543-720 (string tree
writer), dictionary_v2.go:14-59 (distinct keys sorted lexicographically
before index assignment), DictionaryEncodingThreshold = 0.49
(treewriter.go:537): a stripe's string column is dictionary-encoded when
``distinct/total <= 0.49``.

Streams:
* DICTIONARY_V2: DATA = row-order dictionary indexes (unsigned RLE v2),
  DICTIONARY_DATA = concatenated sorted keys, LENGTH = key byte lengths
  (unsigned RLE v2).
* DIRECT_V2: DATA = concatenated values, LENGTH = per-value byte
  lengths (unsigned RLE v2).

``np.unique(return_inverse=True)`` is the vectorized equivalent of
DictionaryV2.prepare(): UTF-8 byte order equals codepoint order, so
numpy's string sort matches Go's sort.Strings byte-wise ordering.
"""

from __future__ import annotations

import numpy as np

from . import rle2

DICTIONARY_THRESHOLD = 0.49

DICT_V2 = "DICTIONARY_V2"
DIRECT_V2 = "DIRECT_V2"


def dictionary_v1(values) -> tuple[np.ndarray, list]:
    """Insertion-ordered dictionary (dictionary.go:11-61 semantics):
    indexes assigned in first-arrival order.  ``pandas.factorize``
    equivalent, done here with a plain dict to avoid the pandas import.
    Returns (indexes int64, keys list in arrival order)."""
    seen: dict = {}
    idx = np.empty(len(values), dtype=np.int64)
    keys = []
    for i, v in enumerate(values):
        j = seen.get(v)
        if j is None:
            j = len(keys)
            seen[v] = j
            keys.append(v)
        idx[i] = j
    return idx, keys


def _to_bytes_array(values) -> np.ndarray:
    """Normalize a sequence of str/bytes to an object array of bytes.
    Per-ELEMENT conversion (deciding from element [0] mis-encoded
    mixed input); None is rejected explicitly — null handling belongs
    to the PRESENT layer above this codec."""
    out = np.empty(len(values), dtype=object)
    for i, v in enumerate(values):
        if isinstance(v, str):
            out[i] = v.encode("utf-8")
        elif isinstance(v, (bytes, bytearray)):
            out[i] = bytes(v)
        else:
            raise ValueError(
                f"dictionary codec takes str/bytes, got {type(v).__name__}"
                f" at index {i} (drop nulls before encoding)")
    return out


def encode_strings(values) -> dict:
    """Encode a string column buffer (one stripe's worth).

    Returns {"encoding", "streams": {name: bytes}, "dict_size"}.
    """
    arr = _to_bytes_array(values)
    n = len(arr)
    if n == 0:
        return {"encoding": DIRECT_V2,
                "streams": {"DATA": b"", "LENGTH": b""}, "dict_size": 0}
    keys, inverse = np.unique(arr, return_inverse=True)
    n_distinct = len(keys)
    if float(n_distinct) / float(n) <= DICTIONARY_THRESHOLD:
        dict_blob = b"".join(keys.tolist())
        key_lengths = np.array([len(k) for k in keys.tolist()], dtype=np.int64)
        return {
            "encoding": DICT_V2,
            "streams": {
                "DATA": rle2.encode(inverse.astype(np.int64), signed=False),
                "DICTIONARY_DATA": dict_blob,
                "LENGTH": rle2.encode(key_lengths, signed=False),
            },
            "dict_size": n_distinct,
        }
    data_blob = b"".join(arr.tolist())
    lengths = np.array([len(s) for s in arr.tolist()], dtype=np.int64)
    return {
        "encoding": DIRECT_V2,
        "streams": {
            "DATA": data_blob,
            "LENGTH": rle2.encode(lengths, signed=False),
        },
        "dict_size": 0,
    }


def decode_strings(encoding: str, streams: dict, n: int) -> np.ndarray:
    """Decode a string column stripe back to an object array of bytes."""
    if n == 0:
        return np.empty(0, dtype=object)
    if encoding == DICT_V2:
        indexes = rle2.decode(streams["DATA"], n, signed=False)
        blob = streams["DICTIONARY_DATA"]
        # key count = max referenced index + 1: valid because
        # encode_strings builds the dictionary with np.unique over the
        # stripe, so every key is referenced at least once (callers
        # with externally-built dictionaries pass n_keys explicitly
        # via the stripe layer, which tracks dict_size)
        n_keys = int(indexes.max()) + 1 if n else 0
        lengths = rle2.decode(streams["LENGTH"], n_keys, signed=False)
        offsets = np.zeros(n_keys + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        keys = np.array(
            [blob[offsets[i]:offsets[i + 1]] for i in range(n_keys)],
            dtype=object)
        return keys[indexes]
    lengths = rle2.decode(streams["LENGTH"], n, signed=False)
    blob = streams["DATA"]
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return np.array(
        [blob[offsets[i]:offsets[i + 1]] for i in range(n)], dtype=object)
