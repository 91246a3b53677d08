"""open_thoughts_ray — a Ray-Data-native data-processing engine.

A from-scratch rebuild of the query / data-processing capabilities of the
reference repo (banerRana/open-thoughts, surveyed in /root/repo/SURVEY.md),
re-expressed as idiomatic Ray Data pipelines:

* ``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
  batches for every per-record transform,
* callable-class actor pools for stateful stages (language-ID model,
  n-gram perplexity scorer),
* ``groupby`` / ``sort`` / ``repartition`` shuffles for the wide steps
  (exact dedup, phash-banded near-dup collapse, grouped aggregates),
* per-partition checkpoint manifests for resumable runs.

The flagship pipeline (``open_thoughts_ray.pipeline``) is a quality filter
over Lance-style tables of image+caption pairs: decode/validate → langid →
perplexity → heuristic keep/drop rules → regex PII/toxicity scrub →
phash-keyed near-duplicate collapse.
"""

__version__ = "0.1.0"

from . import lognoise as _lognoise  # noqa: E402

# Two precisely-scoped filters on Ray-internal cosmetic warnings (empty
# shuffle-partition RefBundles; pyarrow schema-hash failure on
# pandas-written parquet) — see lognoise.py for the full rationale.
# Real schema mismatches still log.
_lognoise.install()
