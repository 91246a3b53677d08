"""Flagship quality-filter pipeline over image+caption Lance-style tables.

    read fragments → decode/validate (drops payload bytes)
    → langid actor pool → perplexity actor pool
    → heuristic rules + regex scrub (vectorized, stateless)
    → phash-banded near-dup collapse (groupby shuffle + union-find)
    → decisions table

Ray-Data-first rebuild of the reference's curation DAG
(open_thoughts/math/maths.py:15-36: load → heuristic filter → dedup →
annotate; engine ops per SURVEY.md §2).  Two entry points:

* ``quality_filter_dataset``  — in-memory, returns the decisions Dataset
  (tests, ``__ray_entry__.entry()``, small inputs).
* ``run_checkpointed``       — the scale path: scores fragment-chunks with
  per-chunk lineage (skip completed chunks on rerun), then dedups and
  writes final decisions.  See checkpoint.py.

Only small columns (ids, caption, scores) survive past the decode stage;
image payloads never enter a shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .ops.decode import decode_validate_batch
from .ops.dedup import near_dup_canonical_map
from .ops.langid import LangIdScorer
from .ops.perplexity import PerplexityScorer
from .ops.scrub import scrub_many
from .ops.text_rules import RuleConfig, caption_stats, first_drop_reason

DECISION_COLUMNS = [
    "image_id", "keep", "drop_reason", "scrubbed_caption", "dup_group",
    "lang", "lang_conf", "ppl",
]


@dataclass
class PipelineOptions:
    rules: RuleConfig = field(default_factory=RuleConfig)
    decode_batch_size: int = 256        # byte-aware: ~256 images ≈ 3-12 MB raw
    score_batch_size: int = 2048
    # Actor-pool size per scoring stage.  The pools reserve fractional
    # CPUs so that together they can never starve the stateless
    # decode/rules tasks or the dedup shuffle of scheduling slots (a
    # full-reservation pool deadlocks the streaming executor).
    score_concurrency: int | tuple = 2
    score_num_cpus: float = 0.5
    max_bucket: int = 512
    neighbor_window: int = 64
    dedup_partitions: int = 64

    @classmethod
    def for_cluster(cls, num_cpus: int, **overrides) -> "PipelineOptions":
        """Size the actor pools and shuffle partitioning to the cluster:
        each scoring pool autoscale-caps at ~3/4 of the CPUs (at 0.5 CPU
        per actor the two pools can then reserve at most ~75 % of the
        cluster, leaving slots for the stateless stages)."""
        hi = max(4, int(num_cpus * 3 / 4))
        defaults = dict(
            score_concurrency=(max(2, num_cpus // 4), hi),
            dedup_partitions=max(16, num_cpus * 2),
        )
        defaults.update(overrides)
        return cls(**defaults)


def broadcast_models():
    """Load model artifacts once on the driver and put them in the object
    store; every actor reads the same ref (no re-shipping per batch)."""
    import ray

    from .models.artifacts import get_artifact_bytes

    return {
        "langid": ray.put(get_artifact_bytes("langid")),
        "lm": ray.put(get_artifact_bytes("lm")),
    }


def _rules_scrub_batch(batch: pa.Table, cfg: RuleConfig) -> pa.Table:
    """Stateless vectorized stage: heuristic reasons + scrubbed caption."""
    captions = batch.column("caption").to_pylist()
    stats = caption_stats(captions)
    lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
    ppl = batch.column("ppl").to_numpy(zero_copy_only=False)
    reasons = first_drop_reason(stats, lang, ppl, cfg)
    if "decode_ok" in batch.schema.names:
        ok = batch.column("decode_ok").to_numpy(zero_copy_only=False)
        reasons = np.where(~ok, "decode", reasons)
    scrubbed = scrub_many(captions)
    keep = np.asarray([r == "" for r in reasons], dtype=bool)
    out = batch.drop_columns(
        [c for c in ("caption", "decode_ok", "mean_lum") if c in batch.schema.names]
    )
    out = out.append_column("keep", pa.array(keep, pa.bool_()))
    out = out.append_column(
        "drop_reason", pa.array([str(r) for r in reasons], pa.string())
    )
    return out.append_column("scrubbed_caption", pa.array(scrubbed, pa.string()))


def score_stage(ds, model_refs, opts: PipelineOptions):
    """Per-row stages only (no shuffle): decode → langid → ppl → rules."""
    ds = ds.map_batches(
        decode_validate_batch, batch_format="pyarrow",
        batch_size=opts.decode_batch_size,
    )
    ds = ds.map_batches(
        LangIdScorer, batch_format="pyarrow", batch_size=opts.score_batch_size,
        concurrency=opts.score_concurrency, num_cpus=opts.score_num_cpus,
        fn_constructor_kwargs={"model_ref": model_refs["langid"]},
    )
    ds = ds.map_batches(
        PerplexityScorer, batch_format="pyarrow", batch_size=opts.score_batch_size,
        concurrency=opts.score_concurrency, num_cpus=opts.score_num_cpus,
        fn_constructor_kwargs={"model_ref": model_refs["lm"]},
    )
    return ds.map_batches(
        _rules_scrub_batch, batch_format="pyarrow", fn_kwargs={"cfg": opts.rules}
    )


class _ApplyDedup:
    """Final stage: rewrite keep/drop with the broadcast canonical map."""

    def __init__(self, canon_ref=None, canon: dict | None = None):
        if canon is None:
            import ray

            canon = ray.get(canon_ref)
        self.canon = canon

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        keep = batch.column("keep").to_numpy(zero_copy_only=False).copy()
        reasons = batch.column("drop_reason").to_pylist()
        dup_group = []
        for i, (iid, k) in enumerate(zip(ids, keep)):
            if not k:
                dup_group.append("")
                continue
            c = self.canon.get(iid, iid)
            dup_group.append(c)
            if c != iid:
                keep[i] = False
                reasons[i] = "near_dup"
        out = batch.drop_columns(["keep", "drop_reason"])
        out = out.append_column("keep", pa.array(keep, pa.bool_()))
        out = out.append_column("drop_reason", pa.array(reasons, pa.string()))
        return out.append_column("dup_group", pa.array(dup_group, pa.string()))


def dedup_stage(scored, opts: PipelineOptions):
    """Near-dup collapse over already-scored rows → final decisions."""
    import ray

    kept = scored.map_batches(
        lambda t: t.filter(t.column("keep")).select(["image_id", "phash"]),
        batch_format="pyarrow",
    )
    canon = near_dup_canonical_map(
        kept, bands=opts.rules.dup_bands, hamming_max=opts.rules.dup_hamming_max,
        max_bucket=opts.max_bucket, window=opts.neighbor_window,
        num_partitions=opts.dedup_partitions,
    )
    canon_ref = ray.put(canon)
    final = scored.map_batches(
        _ApplyDedup, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs={"canon_ref": canon_ref},
    )
    return final.select_columns(DECISION_COLUMNS)


def quality_filter_dataset(ds, opts: PipelineOptions | None = None, model_refs=None):
    """images Dataset → decisions Dataset (in-memory path).

    Materializes the scored intermediate once because two consumers read
    it (the dedup shuffle and the final rewrite) — acceptable at test /
    entry scale; the 100 TB path is ``run_checkpointed`` which persists
    the scored table instead.
    """
    opts = opts or PipelineOptions()
    model_refs = model_refs or broadcast_models()
    scored = score_stage(ds, model_refs, opts).materialize()
    return dedup_stage(scored, opts)


def run_checkpointed(
    table_dir: str,
    out_dir: str,
    opts: PipelineOptions | None = None,
    chunk_fragments: int = 16,
):
    """Scale path with per-chunk lineage; see checkpoint.run_flagship."""
    from .checkpoint import run_flagship

    return run_flagship(table_dir, out_dir, opts or PipelineOptions(),
                        chunk_fragments=chunk_fragments)
