"""Flagship quality-filter pipeline over image+caption Lance-style tables.

    read fragments
    → ScoreActor pool (decode/validate → langid → perplexity → rules →
      scrub, one combined stateful stage; payload bytes dropped inside)
    → phash-banded near-dup collapse (groupby shuffle + union-find)
    → decisions table

(The four-operator chained layout is kept as score_stage_chained and
tested equivalent; the combined pool is the fast path — see BASELINE.md.)

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
    # pool size for the chained (non-combined) scoring layout
    score_concurrency: int | tuple = 2
    # per-stage fixed pool sizes (None → fall back to score_concurrency);
    # fixed (not autoscaling) because upstream task operators keep every
    # free slot busy, so an autoscaling pool never grows past its min
    langid_concurrency: int | tuple | None = None
    ppl_concurrency: int | tuple | None = None
    # combined ScoreActor pool size (None → 3/4 of num_cpus)
    score_pool: int | None = None
    # "tasks" (default): stateless score tasks + per-worker-process model
    # cache — no pool launch, executor autoscales; "actor_pool": explicit
    # combined actor pool (use when per-worker state is expensive)
    score_layout: str = "tasks"
    # 1.0 CPU per scoring actor measured fastest at BOTH 8 and 32 cores
    # (0.5-CPU oversubscription thrashes caches); the two-level scaling
    # runs are additionally pinned to physical cores with taskset because
    # Ray scheduler tokens alone don't confine a process to N cores.
    score_num_cpus: float = 1.0
    max_bucket: int = 512
    neighbor_window: int = 64
    dedup_partitions: int = 16
    # above this many near-dup edges the flagship abandons driver-side
    # union-find for distributed label propagation (a 99%-duplicate crawl
    # shard has O(N) edges — they must never be collected to the driver)
    max_driver_edges: int = 2_000_000
    # cluster size the options were built for (for_cluster); drives the
    # read-block sizing (~2 blocks per CPU keeps tasks coarse enough that
    # per-task overhead stays <5% while still feeding every core)
    num_cpus: int = 8
    # OPT-IN metadata-only geometry pre-gate (DataComp min-side/aspect
    # rule) applied BEFORE decode so rejected rows never pay the decode
    # cost; off by default — the reference labels assume every row is
    # scored, and the oracle-parity gates depend on that
    geometry_gate: bool = False
    geometry_min_side: int = 16
    geometry_max_aspect: float = 4.0
    # OPT-IN image–caption alignment pre-filter (the LAION/DataComp
    # CLIP-score gate, ops/align.py) applied after the geometry gate
    # and before scoring; None = off (the oracle-parity gates assume
    # every geometry-surviving row is scored)
    align_min_score: float | None = None

    @classmethod
    def for_cluster(cls, num_cpus: int, **overrides) -> "PipelineOptions":
        """Size the actor pools and shuffle partitioning to the cluster.

        The combined ScoreActor pool takes ~3/4 of the CPUs (set in
        score_stage); read/write task operators use the rest."""
        # fixed pool sizes proportional to each stage's measured per-row
        # cost (ppl ≈ 2× langid); together ≤ 3/8 of the CPUs so the
        # stateless decode/rules/write stages always keep slots (a
        # full-reservation pool set would deadlock the executor)
        defaults = dict(
            langid_concurrency=max(1, num_cpus // 8),
            ppl_concurrency=max(1, num_cpus // 4),
            dedup_partitions=max(8, num_cpus // 2),
            num_cpus=num_cpus,
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


class ScoreActor:
    """Combined per-row scorer: decode/validate → langid → perplexity →
    rules → scrub in ONE actor ``__call__``.

    One actor pool instead of four chained operators: the image payload is
    decoded and dropped inside the same task that consumes it (bytes never
    re-enter the object store), both models load once per actor from the
    broadcast refs, and Ray's operator fusion can't accidentally funnel
    the stateless decode work through an undersized pool (which is exactly
    what happened with a chained task-op → actor-op layout: the fused
    operator inherits the actor pool's concurrency).
    """

    def __init__(self, langid_ref=None, lm_ref=None, cfg: RuleConfig | None = None,
                 model_bytes: tuple | None = None):
        from .models.fasttext_like import HashedNgramClassifier
        from .models.ngram_lm import BigramLM

        if model_bytes is None:
            import ray

            model_bytes = (ray.get(langid_ref), ray.get(lm_ref))
        self.langid = HashedNgramClassifier.from_bytes(model_bytes[0])
        self.lm = BigramLM.from_bytes(model_bytes[1])
        self.cfg = cfg or RuleConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = decode_validate_batch(batch)
        captions = batch.column("caption").to_pylist()
        labels, confs = self.langid.predict_batch(captions)
        batch = batch.append_column("lang", pa.array(labels, pa.string()))
        batch = batch.append_column(
            "lang_conf", pa.array(np.asarray(confs, dtype=np.float32), pa.float32())
        )
        batch = batch.append_column(
            "ppl", pa.array(self.lm.perplexity_batch(captions), pa.float32())
        )
        return _rules_scrub_batch(batch, self.cfg)


#: per-worker-process model cache for the task-based score stage: Ray
#: reuses worker processes across tasks, so each process deserializes the
#: broadcast model bytes ONCE (~5 ms) — actor-pool once-per-actor
#: semantics without paying actor-pool launch latency or pool sizing
_MODEL_CACHE: dict = {}


def _score_batch_task(batch: pa.Table, langid_ref, lm_ref,
                      cfg: RuleConfig) -> pa.Table:
    key = (langid_ref.hex(), lm_ref.hex())
    scorer = _MODEL_CACHE.get(key)
    if scorer is None:
        import ray

        scorer = ScoreActor(model_bytes=(ray.get(langid_ref), ray.get(lm_ref)),
                            cfg=cfg)
        _MODEL_CACHE[key] = scorer
    scorer.cfg = cfg
    return scorer(batch)


def score_stage(ds, model_refs, opts: PipelineOptions):
    """Per-row scoring (no shuffle).

    Default layout = plain TASKS with a per-worker-process model cache:
    the streaming executor fuses read → score → write into one task
    pipeline that fills every core with zero pool-sizing knobs, and
    model deserialization (5 ms from broadcast bytes) happens once per
    reused worker process.  ``opts.score_layout="actor_pool"`` keeps the
    explicit combined-actor layout (the right shape when per-worker
    state is EXPENSIVE — big models, GPU weights)."""
    if getattr(opts, "score_layout", "tasks") == "tasks":
        return ds.map_batches(
            _score_batch_task, batch_format="pyarrow",
            batch_size=opts.decode_batch_size,
            fn_kwargs={
                "langid_ref": model_refs["langid"],
                "lm_ref": model_refs["lm"],
                "cfg": opts.rules,
            },
        )
    import ray

    pool = opts.score_pool or max(2, opts.num_cpus * 3 // 4)
    # never request more fixed actors than the live cluster can schedule
    # (a fixed pool larger than the CPU count deadlocks waiting to start)
    live = int(ray.cluster_resources().get("CPU", pool))
    pool = max(1, min(pool, live * 3 // 4 or 1))
    return ds.map_batches(
        ScoreActor, batch_format="pyarrow", batch_size=opts.decode_batch_size,
        concurrency=pool, num_cpus=opts.score_num_cpus,
        fn_constructor_kwargs={
            "langid_ref": model_refs["langid"],
            "lm_ref": model_refs["lm"],
            "cfg": opts.rules,
        },
    )


def score_stage_chained(ds, model_refs, opts: PipelineOptions):
    """The four-operator form (decode task pool → langid actor pool → ppl
    actor pool → rules tasks).  Kept as the reference layout for the
    operator library; slower than the combined ScoreActor because Ray
    fuses the decode tasks into the first actor pool."""
    ds = ds.map_batches(
        decode_validate_batch, batch_format="pyarrow",
        batch_size=opts.decode_batch_size,
    )
    ds = ds.map_batches(
        LangIdScorer, batch_format="pyarrow", batch_size=opts.score_batch_size,
        concurrency=opts.langid_concurrency or opts.score_concurrency,
        num_cpus=opts.score_num_cpus,
        fn_constructor_kwargs={"model_ref": model_refs["langid"]},
    )
    ds = ds.map_batches(
        PerplexityScorer, batch_format="pyarrow", batch_size=opts.score_batch_size,
        concurrency=opts.ppl_concurrency or opts.score_concurrency,
        num_cpus=opts.score_num_cpus,
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
        import pandas as pd

        ids = pd.Series(batch.column("image_id").to_pylist(), dtype=object)
        keep = batch.column("keep").to_numpy(zero_copy_only=False).copy()
        reasons = np.asarray(batch.column("drop_reason").to_pylist(), dtype=object)
        # vectorized: canonical id per row (own id when not in a dup group)
        canon = ids.map(self.canon).fillna(ids).to_numpy(dtype=object)
        dup_group = np.where(keep, canon, "")
        demoted = keep & (canon != ids.to_numpy(dtype=object))
        keep[demoted] = False
        reasons[demoted] = "near_dup"
        out = batch.drop_columns(["keep", "drop_reason"])
        out = out.append_column("keep", pa.array(keep, pa.bool_()))
        out = out.append_column("drop_reason", pa.array(list(reasons), pa.string()))
        return out.append_column("dup_group", pa.array(list(dup_group), pa.string()))


def _apply_dedup_joined_batch(batch: pa.Table) -> pa.Table:
    """Join-path analogue of _ApplyDedup: ``dup_canon`` column (null for
    rows outside any dup group, else the canonical min-id; only demoted
    members carry a non-null value ≠ own id)."""
    import pyarrow.compute as pc

    ids = batch.column("image_id")
    keep = batch.column("keep").to_numpy(zero_copy_only=False).copy()
    reasons = np.asarray(batch.column("drop_reason").to_pylist(), dtype=object)
    canon = pc.coalesce(batch.column("dup_canon"), ids)
    demoted = keep & pc.not_equal(canon, ids).to_numpy(zero_copy_only=False)
    dup_group = np.where(keep, canon.to_numpy(zero_copy_only=False), "")
    keep[demoted] = False
    reasons[demoted] = "near_dup"
    out = batch.drop_columns(["keep", "drop_reason", "dup_canon"])
    out = out.append_column("keep", pa.array(keep, pa.bool_()))
    out = out.append_column("drop_reason", pa.array(list(reasons), pa.string()))
    return out.append_column("dup_group", pa.array(list(dup_group), pa.string()))


def dedup_stage(scored, opts: PipelineOptions, kept_source=None,
                force_distributed: bool = False):
    """Near-dup collapse over already-scored rows → final decisions.

    ``kept_source`` lets the caller pass a column-pruned reread of the
    scored table (only image_id/phash/keep) so the edge-finding pass does
    not decompress every column twice.

    Two component-labeling paths with identical decisions:
    * edge list ≤ opts.max_driver_edges → driver union-find + broadcast
      canonical map (no extra shuffle over the full table),
    * above the threshold (or ``force_distributed``) → distributed label
      propagation + left-outer join of the demoted-member labels — no
      O(#edges) driver state, the 99%-duplicate-shard safe path.
    """
    import ray

    from .ops.dedup import edges_to_labels, near_dup_edges, union_find_canonical

    kept = (kept_source if kept_source is not None else scored).map_batches(
        lambda t: t.filter(t.column("keep")).select(["image_id", "phash"]),
        batch_format="pyarrow",
    )
    edges = near_dup_edges(
        kept, bands=opts.rules.dup_bands, hamming_max=opts.rules.dup_hamming_max,
        max_bucket=opts.max_bucket, window=opts.neighbor_window,
        num_partitions=opts.dedup_partitions,
    ).materialize()
    live = int(ray.cluster_resources().get("CPU", opts.num_cpus))
    if force_distributed or edges.count() > opts.max_driver_edges:
        labels = edges_to_labels(edges, num_partitions=opts.dedup_partitions)
        canon_ds = labels.map_batches(
            lambda t: pa.table({"image_id": t.column("id"),
                                "dup_canon": t.column("label")}),
            batch_format="pyarrow",
        )
        joined = scored.join(
            canon_ds, join_type="left_outer", on=("image_id",),
            num_partitions=opts.dedup_partitions,
        )
        final = joined.map_batches(_apply_dedup_joined_batch,
                                   batch_format="pyarrow", batch_size=4096)
        return final.select_columns(DECISION_COLUMNS)
    edf = edges.to_pandas()
    canon = (
        union_find_canonical(edf["a"].tolist(), edf["b"].tolist())
        if not edf.empty and "a" in edf.columns else {}
    )
    if len(canon) <= 200_000:
        # small canonical map rides in plain task closures — skips a
        # second actor-pool launch (~1-2 s fixed cost per run)
        apply = _ApplyDedup(canon=canon)
        final = scored.map_batches(apply.__call__, batch_format="pyarrow",
                                   batch_size=4096)
        return final.select_columns(DECISION_COLUMNS)
    canon_ref = ray.put(canon)
    # fixed-size pool: an autoscaling pool never grows past its min while
    # upstream read tasks keep the scheduler busy
    pool = max(2, min(opts.num_cpus, live) // 2)
    final = scored.map_batches(
        _ApplyDedup, batch_format="pyarrow", batch_size=4096,
        concurrency=pool, num_cpus=0.5,
        fn_constructor_kwargs={"canon_ref": canon_ref},
    )
    return final.select_columns(DECISION_COLUMNS)


def quality_filter_dataset(ds, opts: PipelineOptions | None = None, model_refs=None,
                           force_distributed: bool = False):
    """images Dataset → decisions Dataset (in-memory path).

    Materializes the scored intermediate once because two consumers read
    it (the dedup shuffle and the final rewrite) — acceptable at test /
    entry scale; the 100 TB path is ``run_checkpointed`` which persists
    the scored table instead.
    """
    opts = opts or PipelineOptions()
    model_refs = model_refs or broadcast_models()
    if opts.geometry_gate:
        from .ops.multimodal import geometry_gate_batch

        ds = ds.map_batches(
            geometry_gate_batch, batch_format="pyarrow",
            fn_kwargs=dict(min_side=opts.geometry_min_side,
                           max_aspect=opts.geometry_max_aspect,
                           mode="filter"))
    if opts.align_min_score is not None:
        from .ops.align import align_filter

        ds = align_filter(ds, min_score=float(opts.align_min_score))
    scored = score_stage(ds, model_refs, opts).materialize()
    return dedup_stage(scored, opts, force_distributed=force_distributed)


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
