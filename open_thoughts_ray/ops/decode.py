"""Image decode/validate stage (stateless ``map_batches`` task).

Decodes every payload with the pure-numpy codecs, validates the declared
(w, h) against the payload, and emits ``decode_ok`` + a cheap pixel
statistic (mean luminance).  The heavy ``bytes`` column is DROPPED on the
way out so everything downstream (scoring, rules, dedup shuffle) moves
only small columns — at 100 TB the image payload never crosses a shuffle
boundary.

Multimodal note (SURVEY.md §7.0): with real codecs (PIL/libjpeg) only the
body of ``_decode_one`` changes; the Ray-side plumbing (binary column in,
zero-copy Arrow batch, byte-aware batch size) is the real, tested part.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..io import codecs


def decode_validate_batch(batch: pa.Table) -> pa.Table:
    bufs = batch.column("bytes").to_pylist()
    ws = batch.column("w").to_pylist()
    hs = batch.column("h").to_pylist()
    fmts = batch.column("fmt").to_pylist()
    n = len(bufs)
    ok = np.zeros(n, dtype=bool)
    mean_lum = np.zeros(n, dtype=np.float32)
    for i in range(n):
        try:
            px = codecs.decode(bufs[i], ws[i], hs[i], fmts[i])
            ok[i] = True
            mean_lum[i] = float(px.mean())
        except Exception:  # malformed payload → decode_ok False
            ok[i] = False
    out = batch.drop_columns(["bytes"])
    out = out.append_column("decode_ok", pa.array(ok, pa.bool_()))
    return out.append_column("mean_lum", pa.array(mean_lum, pa.float32()))
