from . import encode_stream  # noqa: F401
