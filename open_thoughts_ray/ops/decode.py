"""Image decode/validate stage (stateless ``map_batches`` task).

Decodes every payload with the pure-numpy codecs, validates the declared
(w, h) against the payload, and emits ``decode_ok`` + a cheap pixel
statistic (mean luminance).  The heavy ``bytes`` column is DROPPED on the
way out so everything downstream (scoring, rules, dedup shuffle) moves
only small columns — at 100 TB the image payload never crosses a shuffle
boundary.

Payload access is zero-copy: the Arrow binary column's offsets/data
buffers are viewed as numpy arrays and each image is a slice — no
per-row Python ``bytes`` materialization (``to_pylist`` would copy every
payload).

Multimodal note (SURVEY.md §7.0): with real codecs (PIL/libjpeg) only the
body of the decode call changes; the Ray-side plumbing (binary column in,
zero-copy Arrow batch, byte-aware batch size) is the real, tested part.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..io import codecs


def binary_column_views(batch: pa.Table, column: str):
    """(data, offsets) numpy views over an Arrow binary column — slicing
    ``data[offsets[i]:offsets[i+1]]`` is the i-th value, zero-copy."""
    arr = batch.column(column).combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return data, offsets


def decode_validate_batch(batch: pa.Table) -> pa.Table:
    data, offsets = binary_column_views(batch, "bytes")
    ws = batch.column("w").to_numpy(zero_copy_only=False)
    hs = batch.column("h").to_numpy(zero_copy_only=False)
    fmts = batch.column("fmt").to_pylist()
    n = len(fmts)
    ok = np.zeros(n, dtype=bool)
    mean_lum = np.zeros(n, dtype=np.float32)
    for i in range(n):
        try:
            px = codecs.decode(
                data[offsets[i] : offsets[i + 1]], int(ws[i]), int(hs[i]), fmts[i]
            )
            ok[i] = True
            mean_lum[i] = np.float32(px.mean())
        except Exception:  # malformed payload → decode_ok False
            ok[i] = False
    out = batch.drop_columns(["bytes"])
    out = out.append_column("decode_ok", pa.array(ok, pa.bool_()))
    return out.append_column("mean_lum", pa.array(mean_lum, pa.float32()))
