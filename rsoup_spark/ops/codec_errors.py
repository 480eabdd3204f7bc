"""One quarantine-able error class for every pure-Python codec.

Malformed media from a web crawl fails decode in whatever way the
bytes happen to be broken: truncated chunks raise ``struct.error``,
corrupt deflate streams raise ``zlib.error``, short sub-block chains
raise ``IndexError``/``EOFError``.  None of those are ``ValueError``,
so without normalization they escape the operators'
``except (NotImplementedError, ValueError)`` quarantine and fail the
Spark task (and, after retries, the whole job) on one bad blob.

``ops.jpeg`` established the pattern (normalize at the public decode
boundary); this decorator applies it to the other codecs.  Genuine
code bugs still surface: only the exception types malformed *input*
produces are normalized -- TypeError/AttributeError/etc. propagate.
"""

from __future__ import annotations

import functools
import struct
import zlib

#: exception types malformed input is known to produce in the codecs
DECODE_INPUT_ERRORS = (
    zlib.error,     # corrupt deflate stream (png, vp8l)
    struct.error,   # short fixed-layout header/chunk unpack
    IndexError,     # truncated sub-block / out-of-range table index
    EOFError,       # truncated gzip member
    StopIteration,  # exhausted bit/byte reader
)


def normalize_decode_errors(fmt: str):
    """Decorator: re-raise malformed-input exception types from a
    decode function as ``ValueError`` (the single error class the
    mapInPandas operators quarantine-drop on)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except DECODE_INPUT_ERRORS as e:
                raise ValueError(
                    f"malformed {fmt} ({type(e).__name__})"
                ) from e

        return wrapped

    return deco
