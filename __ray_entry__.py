"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship image+caption quality-filter pipeline on a
deterministically synthesized benchmark table (the BASELINE.json
input_hint shape); ``queries()`` exposes one callable per implemented
operator family from SURVEY.md §2 over the driver's TPC-H-ish parquet
tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query (same column names, quantized floats / integer-cent
sums so value hashes match bit-for-bit).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _rp(sf_dir: str, name: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _r2i(vals) -> pa.Array:
    """floor(x + 0.5) → int64: round-half-up, bit-identical to the DuckDB
    oracle expression floor(x + 0.5) (DuckDB round() is half-away-from-
    zero while pyarrow round() is half-to-even — using floor on both
    sides removes the ambiguity; values here are non-negative)."""
    return pc.floor(pc.add(vals, 0.5)).cast(pa.int64())


# --------------------------------------------------------------- entry()
def entry() -> Any:
    """Flagship pipeline on a synthesized 2000-row image+caption table."""
    from open_thoughts_ray.fixtures.images import build_images_table
    from open_thoughts_ray.io import lance_table
    from open_thoughts_ray.pipeline import quality_filter_dataset

    table = build_images_table(
        "/tmp/otr_entry_images", n_rows=2000, n_parts=16, seed=42, use_ray=True
    )
    return quality_filter_dataset(lance_table.read_dataset(table))


# -------------------------------------------------------------- queries
def _q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-style grouped aggregate with partial pre-aggregation
    (groupby does per-block combine before the shuffle)."""
    from ray.data.aggregate import Count, Sum

    ds = _rp(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
              "l_discount"])

    def add_cents(t: pa.Table) -> pa.Table:
        qty = _r2i(t.column("l_quantity"))
        base = _r2i(pc.multiply(t.column("l_extendedprice"), 100.0))
        disc = _r2i(
            pc.multiply(
                pc.multiply(t.column("l_extendedprice"),
                            pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
                100.0,
            )
        )
        t = t.append_column("qty_i", qty)
        t = t.append_column("base_cents", base)
        return t.append_column("disc_cents", disc)

    return (
        ds.map_batches(add_cents, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_i", alias_name="sum_qty"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("disc_cents", alias_name="sum_disc_cents"),
            Count(alias_name="count_order"),
        )
    )


def _q_filter_documents(sf_dir: str):
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    ds = R.filter_in(ds, "lang", ["en"])
    ds = R.filter_expr(
        ds,
        lambda t: pc.and_(
            pc.greater_equal(t.column("n_chars"), 100),
            pc.less_equal(t.column("n_chars"), 400),
        ),
    )
    return R.keep_only_columns(ds, ["doc_id", "source", "n_chars"])


def _q_grouped_count_having(sf_dir: str):
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["source"])
    return R.grouped_count_having(ds, "source", min_count=5, count_name="n_docs")


def _q_top_k_events(sf_dir: str):
    ds = _rp(sf_dir, "events", ["event_id", "value"])
    return ds.sort(["value", "event_id"], descending=[True, False]).limit(50)


def _q_sample_mod10(sf_dir: str):
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "lang"])
    return R.sample_by_hash(ds, "doc_id", keep_every=10, residue=3)


def _q_exact_dedup_documents(sf_dir: str):
    from ray.data.aggregate import Count, Min

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return (
        ds.groupby("text")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
        .select_columns(["doc_id", "n_copies"])
    )


def _q_broadcast_join(sf_dir: str):
    import pyarrow.parquet as pq

    from ray.data.aggregate import Count, Sum

    from open_thoughts_ray.ops import relational as R

    orders = _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = (
        pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                      columns=["c_custkey", "c_mktsegment"])
        .to_pandas()
        .rename(columns={"c_custkey": "o_custkey"})
    )

    def add_cents(t: pa.Table) -> pa.Table:
        return t.append_column(
            "total_cents", _r2i(pc.multiply(t.column("o_totalprice"), 100.0))
        )

    joined = R.broadcast_join(
        orders.map_batches(add_cents, batch_format="pyarrow"), cust, on="o_custkey",
        how="inner",
    )
    return joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("total_cents", alias_name="sum_total_cents")
    )


def _q_hash_join(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    from open_thoughts_ray.ops import relational as R

    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def add_cents(t: pa.Table) -> pa.Table:
        rev = _r2i(
            pc.multiply(
                pc.multiply(t.column("l_extendedprice"),
                            pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
                100.0,
            )
        )
        return t.append_column("rev_cents", rev).drop_columns(
            ["l_extendedprice", "l_discount"]
        )

    li = li.map_batches(add_cents, batch_format="pyarrow")
    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).rename_columns(
        {"o_orderkey": "l_orderkey"}
    )
    import ray

    # at bench scale the hash-shuffle aggregator startup dominates —
    # fewer, fatter partitions win (sweep: 8 parts fastest at 600k rows);
    # at 10^12 rows num_partitions should track total cores instead
    parts = max(8, int(ray.cluster_resources().get("CPU", 16)) // 4) \
        if ray.is_initialized() else 16
    # small-input fast path: each shuffle-submitted block pays ~90 ms of
    # fixed cost, so merging the 64 tiny read blocks to ~2 per join
    # partition cuts the join 20-40% (interleaved sweep, min-of-3).
    # Gated on a metadata-only row count — at crawl scale read blocks
    # are already target-sized and merging them would build multi-GB
    # blocks, so the coalesce must NOT run there.
    import pyarrow.parquet as _pq

    li_rows = _pq.read_metadata(
        os.path.join(sf_dir, "lineitem.parquet")).num_rows
    if li_rows < 10_000_000:
        li = li.repartition(parts)
        orders = orders.repartition(max(2, parts // 4))
    joined = R.hash_join(li, orders, on="l_orderkey", num_partitions=parts)

    # pre-aggregate inside each join output block (5 priorities → ≤5
    # rows per block) so the final groupby shuffles ~5·P rows, not the
    # full join output — Ray's AggregateMap was the query's hottest
    # stage (1.1 s/task sorting whole blocks).  Integer sums, so the
    # two-level combine is exact.
    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        g = pa.TableGroupBy(t.select(["o_orderpriority", "rev_cents"]),
                            "o_orderpriority").aggregate(
            [("rev_cents", "sum"), ("rev_cents", "count")])
        return pa.table({
            "o_orderpriority": g.column("o_orderpriority"),
            "revenue_cents": g.column("rev_cents_sum"),
            "n_items": g.column("rev_cents_count").cast(pa.int64()),
        })

    part = joined.map_batches(partial, batch_format="pyarrow")
    return part.groupby("o_orderpriority").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n_items", alias_name="n_items"),
    )


def _q_quantile_filter_events(sf_dir: str):
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "events", ["event_id", "value"])
    out, _thr = R.global_quantile_threshold(ds, "value", 0.9, keep="ge")
    return out


def _q_stratified_first2(sf_dir: str):
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "lang"])
    return R.stratified_first_k(ds, "lang", k=2, order_col="doc_id")


def _q_window_events(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "events", ["ts", "event_type", "value"])

    def add_cents(t: pa.Table) -> pa.Table:
        return t.append_column("value_cents", _r2i(pc.multiply(t.column("value"), 100.0)))

    ds = ds.map_batches(add_cents, batch_format="pyarrow")
    return R.tumbling_window_agg(
        ds, ts_col="ts", key_col="event_type", window_s=3600,
        aggs=(Count(alias_name="n_events"),
              Sum("value_cents", alias_name="sum_value_cents")),
    )


def _q_union_tagged(sf_dir: str):
    from open_thoughts_ray.ops import relational as R

    docs_en = R.filter_in(_rp(sf_dir, "documents", ["doc_id", "lang", "n_chars"]),
                          "lang", ["en"])
    docs_long = R.filter_expr(
        _rp(sf_dir, "documents", ["doc_id", "lang", "n_chars"]),
        lambda t: pc.greater(t.column("n_chars"), 400),
    )
    u = R.union_tagged([("en", docs_en), ("long", docs_long)], tag_col="subset")
    return R.grouped_count_having(u, "subset", count_name="n")


def _q_token_count(sf_dir: str):
    from open_thoughts_ray.ops.textstats import token_count_batch

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens"]
    )


def _q_quality_stats(sf_dir: str):
    from open_thoughts_ray.ops.textstats import quality_stats_batch

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(quality_stats_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens", "n_unique", "rep_ratio"]
    )


def _q_gopher_repetition(sf_dir: str):
    # Gopher repetition signals + the keep verdict at the published
    # thresholds (Rae et al. 2021 §A1.1), hash-checked against a DuckDB
    # replay of the same bigram/trigram/line counting.
    import pyarrow.compute as pc

    from open_thoughts_ray.ops.textstats import gopher_repetition_batch

    def apply(t):
        t = gopher_repetition_batch(t)
        keep = pc.and_(
            pc.and_(pc.less_equal(t.column("dup_line_frac"), 0.30),
                    pc.less_equal(t.column("top_bigram_frac"), 0.20)),
            pc.less_equal(t.column("dup_trigram_frac"), 0.30))
        return t.append_column("keep", keep)

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(apply, batch_format="pyarrow").select_columns(
        ["doc_id", "dup_line_frac", "top_bigram_frac",
         "dup_trigram_frac", "keep"]
    )


def _q_doc_quality_filter(sf_dir: str):
    """Documents-table quality filter (keep/drop decision, SQL-checked):
    keep iff 50 ≤ n_chars ≤ 500 and repetition ratio ≤ 0.6."""
    from open_thoughts_ray.ops.textstats import quality_stats_batch

    ds = _rp(sf_dir, "documents", ["doc_id", "n_chars", "text"])
    ds = ds.map_batches(quality_stats_batch, batch_format="pyarrow")

    def decide(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(t.column("n_chars"), 50),
                pc.less_equal(t.column("n_chars"), 500),
            ),
            pc.less_equal(t.column("rep_ratio"), 0.6),
        )
        return pa.table({"doc_id": t.column("doc_id"), "keep": keep})

    return ds.map_batches(decide, batch_format="pyarrow")


def _q_md5_fingerprint(sf_dir: str):
    from open_thoughts_ray.ops.textstats import md5_fingerprint_batch

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(md5_fingerprint_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "fp"]
    )


def _q_cosine_dedup(sf_dir: str):
    """EXACT low-threshold cosine dedup — O(N²/2) multiply work by
    design, practical to N ~ 10⁶ rows (block-pair plan, peak 2 blocks
    per worker; the last block's task walks all earlier blocks).  Above
    that, or at high thresholds, use cosine_dedup_lsh_embeddings (one
    banded shuffle, near-linear)."""
    from open_thoughts_ray.ops.similarity import cosine_dedup_earlier

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_dedup_earlier(ds, threshold=0.4).select_columns(["vec_id"])


def _q_ann_topk(sf_dir: str):
    import pyarrow.parquet as pq

    from open_thoughts_ray.ops.similarity import ann_topk

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    qtab = emb.filter(pc.less(emb.column("vec_id"), 8))
    flat = qtab.column("embedding").combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    q = flat.reshape(qtab.num_rows, -1)
    qids = qtab.column("vec_id").to_pylist()
    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann_topk(ds, q, k=10, query_ids=qids)


def _q_minhash_dedup(sf_dir: str):
    from open_thoughts_ray.ops.dedup_text import minhash_lsh_dedup

    path = os.path.join(sf_dir, "documents.parquet")

    def fetch(cand_ids):
        # predicate-pushdown candidate re-read (no second Dataset pass)
        import pyarrow.dataset as pads

        return (
            pads.dataset(path)
            .to_table(columns=["doc_id", "text"],
                      filter=pads.field("doc_id").isin(sorted(cand_ids)))
            .to_pandas()
        )

    # hasher="md5" + semantics="earlier" (r3): the md5 gram hashes, the
    # (a·x+b) mod 2^61−1 signature family, band equality and the ≥0.7
    # agreement rule are all replayed verbatim by the DuckDB oracle, so
    # the query is hash-checked (previously rows-only).
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_dedup(ds, threshold=0.7, source_fetch=fetch,
                             hasher="md5",
                             semantics="earlier").select_columns(["doc_id"])


def _q_simhash_dedup(sf_dir: str):
    # hasher="md5" + semantics="earlier": with bands=4 / hamming_max=3
    # banding recall is 1 by pigeonhole, so the survivor set is exactly
    # the SQL NOT-EXISTS-earlier rule and the query is DuckDB-hash-checked
    # (r3; previously rows-only with the crc hash + union-find semantics).
    from open_thoughts_ray.ops.dedup_text import simhash_dedup

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return simhash_dedup(ds, hamming_max=3, hasher="md5",
                         semantics="earlier").select_columns(["doc_id"])


def _q_majority_event_type(sf_dir: str):
    from open_thoughts_ray.ops.consensus import majority_vote

    ds = _rp(sf_dir, "events", ["user_id", "event_type"])
    return majority_vote(ds, "user_id", "event_type")


def _q_token_entropy(sf_dir: str):
    from open_thoughts_ray.ops.consensus import token_entropy

    ds = _rp(sf_dir, "documents", ["text"])
    val = token_entropy(ds)
    import math

    q = math.floor(val * 1_000_000) / 1_000_000
    return pa.table({"entropy": pa.array([q], pa.float64())})


def _q_self_bleu(sf_dir: str):
    # exact-integer micro-unit summation (order-free) + one final
    # division, so the DuckDB replay is bit-identical.
    from open_thoughts_ray.ops.consensus import self_bleu

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return pa.table({"self_bleu": pa.array([self_bleu(ds)], pa.float64())})


def _q_token_gini(sf_dir: str):
    # exact-integer numerator/denominator → one float division, so no
    # quantization needed: the DuckDB row_number() formulation lands on
    # the identical double.
    from open_thoughts_ray.ops.consensus import token_gini

    ds = _rp(sf_dir, "documents", ["text"])
    return pa.table({"token_gini": pa.array([token_gini(ds)], pa.float64())})


def _q_decontaminate(sf_dir: str):
    """Broadcast anti-join decontamination: documents minus rows whose
    8-gram overlap with the first-5-docs 'benchmark' is >= 0.5."""
    import pyarrow.parquet as pq

    from open_thoughts_ray.ops.decontaminate import decontaminate

    bench = (
        pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id")
        .head(5)["text"]
        .tolist()
    )
    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return decontaminate(ds, bench, overlap_threshold=0.5).select_columns(["doc_id"])


def _q_asof_join(sf_dir: str):
    """As-of join: each 'error' event ⟵ latest prior 'purchase' by the
    same user (co-group merge_asof; one groupby shuffle)."""
    from open_thoughts_ray.ops import relational as R
    from open_thoughts_ray.ops.temporal import asof_join

    ev = _rp(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    errors = R.filter_in(ev, "event_type", ["error"]).drop_columns(["event_type"])
    purchases = (
        R.filter_in(ev, "event_type", ["purchase"])
        .drop_columns(["event_type"])
        .rename_columns({"event_id": "p_event_id"})
    )
    out = asof_join(errors, purchases, key="user_id", ts="ts",
                    right_value_cols=["p_event_id"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id").cast(pa.int64()),
            "p_event_id": t.column("p_event_id").cast(pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def _q_sessionize(sf_dir: str):
    from open_thoughts_ray.ops.temporal import sessionize

    ev = _rp(sf_dir, "events", ["ts", "user_id"])
    return sessionize(ev, key="user_id", ts_col="ts", gap_s=1800)


def _q_approx_distinct(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT user_id).  The md5 hasher
    is bit-reproducible in DuckDB (hex-prefix cast), so the oracle SQL
    rebuilds the identical registers and estimate — a deterministic
    sketch is hash-checkable, not merely 'approximately right'."""
    from open_thoughts_ray.ops.sketch import approx_distinct

    ds = _rp(sf_dir, "events", ["user_id"])
    est = approx_distinct(ds, "user_id", hasher="md5")
    return pa.table({"approx_distinct_users": pa.array([int(round(est))], pa.int64())})


def _q3_shipping_priority(sf_dir: str):
    """3-way join: customer (broadcast) ⋈ orders ⋈ lineitem (hash) →
    revenue per market segment and order priority."""
    import pyarrow.parquet as pq

    from ray.data.aggregate import Count, Sum

    from open_thoughts_ray.ops import relational as R

    cust = (
        pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                      columns=["c_custkey", "c_mktsegment"])
        .to_pandas()
        .rename(columns={"c_custkey": "o_custkey"})
    )
    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderpriority"])
    orders = R.broadcast_join(orders, cust, on="o_custkey", how="inner")
    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def add_cents(t: pa.Table) -> pa.Table:
        rev = _r2i(
            pc.multiply(
                pc.multiply(t.column("l_extendedprice"),
                            pc.subtract(pa.scalar(1.0), t.column("l_discount"))),
                100.0,
            )
        )
        return t.append_column("rev_cents", rev).drop_columns(
            ["l_extendedprice", "l_discount"]
        )

    li = li.map_batches(add_cents, batch_format="pyarrow")
    orders = orders.rename_columns({"o_orderkey": "l_orderkey"})
    joined = R.hash_join(li, orders, on="l_orderkey", num_partitions=16)
    return joined.groupby(["c_mktsegment", "o_orderpriority"]).aggregate(
        Sum("rev_cents", alias_name="revenue_cents"), Count(alias_name="n_items")
    )


def _q_domain_annotate(sf_dir: str):
    """Root-domain extraction + frequent-domain annotate (reference
    WebInstruct/utils.py:104-192).  The corpus has no URL column, so
    each row gets a deterministic doc_id-keyed URL (identical ||
    expression in the oracle): three repeating hosts become frequent,
    the per-doc site<N>.io hosts stay rare."""
    from open_thoughts_ray.ops.web import annotate_frequent_domains

    def add_url(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        hosts = ["www.alpha.example.com", "beta.example.org",
                 "cdn.gamma.net", None]
        urls = [
            f"https://{hosts[i % 4] or f'site{i}.io'}/p/{i}" for i in ids
        ]
        return t.append_column("url", pa.array(urls, pa.string()))

    ds = _rp(sf_dir, "documents", ["doc_id"]).map_batches(
        add_url, batch_format="pyarrow")
    return annotate_frequent_domains(ds, min_count=5).select_columns(
        ["doc_id", "root_domain", "is_frequent_domain"])


def _q_scrub_documents(sf_dir: str):
    """Ordered regex PII/toxicity scrub — the north-star's
    scrubbed-caption semantic as a standalone SQL-checked query (the
    flagship applies the same rules inside the score stage).  The
    synthetic corpus contains no PII, so each row is deterministically
    augmented with doc_id-derived URL / email / SSN / phone / toxic
    tokens (the identical || expression in the oracle) so every rule
    fires on every row and the exact-string-equality check is
    non-trivial."""
    from open_thoughts_ray.fixtures.textgen import TOXIC_LEXICON
    from open_thoughts_ray.ops.scrub import scrub_many

    lex = list(TOXIC_LEXICON)

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        aug = [
            f"{txt} contact user{i}@example.com or https://ex.com/p/{i}"
            f" ssn 123-45-6789 call (555) 123-4567 you {lex[i % len(lex)]}"
            for i, txt in zip(ids, texts)
        ]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "scrubbed": pa.array(scrub_many(aug), pa.string()),
        })

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")


def _q_latest_event_per_user(sf_dir: str):
    """Distributed argmax per group (row_number()=1 window semantics):
    per-batch vectorized pre-reduce, then a keyed shuffle carrying at
    most one candidate row per (batch, user)."""
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    out = R.argmax_per_group(ds, "user_id", ["ts", "event_id"],
                             descending=True)
    return out.select_columns(["user_id", "event_id", "event_type"])


def _q_median_quantity(sf_dir: str):
    """Exact per-group median (non-mergeable aggregate → keyed shuffle
    of (group, value) only).  Emitted as 2×median in integer cents —
    always integral for int inputs — so the hash is float-free."""
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "qty_cents": _r2i(pc.multiply(t.column("l_quantity"), 100.0)),
        })

    out = R.grouped_median(ds.map_batches(cents, batch_format="pyarrow"),
                           "l_returnflag", "qty_cents", out_col="m")

    def x2(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "median_x2_cents": _r2i(pc.multiply(t.column("m"), 2.0)),
        })

    return out.map_batches(x2, batch_format="pyarrow")


def _q_max_gap_events(sf_dir: str):
    """Lag-window analytics: largest inter-event gap per user, integer
    microseconds (users with ≥2 events)."""
    from open_thoughts_ray.ops.temporal import max_gap_per_key

    return max_gap_per_key(_rp(sf_dir, "events", ["user_id", "ts"]),
                           "user_id", "ts")


def _q_corr_qty_price(sf_dir: str):
    """Distributed Pearson correlation from five mergeable sums (no
    shuffle); floor-quantized at 1e-6 on both sides like token_entropy."""
    import math

    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    r = R.pearson_corr(ds, "l_quantity", "l_extendedprice")
    q = math.floor(r * 1_000_000) / 1_000_000
    return pa.table({"corr_qty_price": pa.array([q], pa.float64())})


def _q_range_join_events(sf_dir: str):
    """Time-range (non-equi) join Ray Data lacks natively: every error
    event paired with purchase events within ±5 minutes, via the bucketed
    interval_join composition (one keyed shuffle, ≤2× replication of the
    right side)."""
    from open_thoughts_ray.ops import relational as R
    from open_thoughts_ray.ops.temporal import interval_join

    ev = _rp(sf_dir, "events", ["event_id", "ts", "event_type"])
    errors = R.filter_in(ev, "event_type", ["error"]).map_batches(
        lambda t: t.select(["event_id", "ts"]).rename_columns(
            ["err_id", "ts"]),
        batch_format="pyarrow",
    )
    buys = R.filter_in(ev, "event_type", ["purchase"]).map_batches(
        lambda t: t.select(["event_id", "ts"]).rename_columns(
            ["buy_id", "buy_ts"]),
        batch_format="pyarrow",
    )
    return interval_join(
        errors, buys, left_ts="ts", right_ts="buy_ts",
        lower_us=-300_000_000, upper_us=300_000_000,
        left_cols=["err_id"], right_cols=["buy_id"],
    )


def _q_rolling_sum_events(sf_dir: str):
    """Rolling-window aggregate (SQL ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW): per-user running 3-row sum of value cents ordered by
    (ts, event_id)."""
    from open_thoughts_ray.ops.temporal import rolling_sum_per_key

    ds = _rp(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return t.append_column(
            "value_cents", _r2i(pc.multiply(t.column("value"), 100.0))
        ).drop_columns(["value"])

    ds = ds.map_batches(cents, batch_format="pyarrow")
    return rolling_sum_per_key(ds, "user_id", "ts", "event_id",
                               "value_cents", window_rows=3,
                               out_col="roll3_cents")


def _q_top2_events_per_user(sf_dir: str):
    """Top-n-per-group window (row_number() <= 2): the two most recent
    events per user, per-batch pre-reduced before the keyed shuffle."""
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    out = R.top_n_per_group(ds, "user_id", ["ts", "event_id"], n=2,
                            descending=True)
    return out.select_columns(["user_id", "event_id", "event_type"])


def _q_distinct_types_per_user(sf_dir: str):
    """Exact count(DISTINCT …) per group — distinct-pairs groupby then a
    small count (the HLL sketch query is the approximate one-pass
    sibling)."""
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "events", ["user_id", "event_type"])
    return R.grouped_nunique(ds, "user_id", "event_type",
                             out_col="n_types")


def _q_langs_per_source(sf_dir: str):
    """Deterministic ordered string_agg: sorted distinct langs per
    source, comma-joined."""
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["source", "lang"])
    return R.grouped_string_agg(ds, "source", "lang", ",",
                                out_col="langs")


def _q_pack_documents(sf_dir: str):
    """Sequence packing by cumulative length: pack_id = exclusive global
    running sum of n_chars (ordered by doc_id) // 4096 — the two-phase
    distributed prefix sum (ordered range buckets, O(#buckets) driver
    state)."""
    from open_thoughts_ray.ops import packing as P

    ds = _rp(sf_dir, "documents", ["doc_id", "n_chars"])
    return P.pack_sequences(ds, "doc_id", "n_chars", budget=4096,
                            pack_col="pack_id")


def _q_ntile_events(sf_dir: str):
    """NTILE(4) within each event type ordered by (value, event_id) —
    the quartile-bucketing window used for quality-score banding."""
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "events", ["event_id", "event_type", "value"])
    out = R.grouped_ntile(ds, "event_type", ["value", "event_id"], 4)
    return out.select_columns(["event_id", "event_type", "tile"])


def _q_mixture_sample(sf_dir: str):
    """Per-source weighted mixture sampling (domain-mixing ratios for
    training-data assembly): md5-cutoff keep decision, deterministic
    across partitionings and resumes."""
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "source"])
    rates = {"src0": 0.9, "src1": 0.9, "src2": 0.9,
             "src3": 0.5, "src4": 0.5}
    return R.mixture_sample(ds, "source", "doc_id", rates,
                            default_rate=0.2)


def _q_pivot_events(sf_dir: str):
    """Wide count pivot (SQL count(*) FILTER pattern): per-user event
    counts, one column per event type."""
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "events", ["user_id", "event_type"])
    return R.pivot_count(ds, "user_id", "event_type",
                         ["click", "view", "purchase", "signup", "error"])


def _q_p90_value_per_type(sf_dir: str):
    """Exact per-group p90 (quantile_cont interpolation), emitted in
    floor-quantized milli-units so the hash is float-free."""
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "events", ["event_type", "value"])
    out = R.grouped_quantile(ds, "event_type", "value", 0.9, out_col="p90")

    def milli(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t.column("event_type"),
            "p90_milli": pc.floor(
                pc.multiply(t.column("p90"), 1000.0)).cast(pa.int64()),
        })

    return out.map_batches(milli, batch_format="pyarrow")


def _q_flagship(sf_dir: str):
    return entry()


_BM25_QUERIES = {0: ["hash", "join"], 1: ["merge", "sort", "window"],
                 2: ["stream", "filter", "big"]}


def _q_bm25_topk(sf_dir: str):
    """Distributed BM25 keyword retrieval, global top-10 per query
    (integer micro-unit scores — order-free summation, SQL-checkable)."""
    from open_thoughts_ray.ops.retrieval import bm25_topk

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(ds, _BM25_QUERIES, k=10)


def _q_curriculum_interleave(sf_dir: str):
    """Weighted round-robin mixture order: src0/src1 upweighted 2×,
    everything else 1× — mix_key = rank_within_source / weight."""
    from open_thoughts_ray.ops.packing import curriculum_interleave

    ds = _rp(sf_dir, "documents", ["doc_id", "source"])
    out = curriculum_interleave(ds, "source", "doc_id",
                                weights={"src0": 2.0, "src1": 2.0})
    return out.select_columns(["doc_id", "source", "mix_key"])


def _q_rule_funnel(sf_dir: str):
    """Quality-rule funnel: cumulative pass counts over the three Gopher
    repetition thresholds — per-batch int partials, one Sum; the audit
    view that tells you WHICH rule does the cutting."""
    from open_thoughts_ray.ops.textstats import gopher_repetition_batch

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        g = gopher_repetition_batch(t)
        dl = g.column("dup_line_frac").to_numpy(zero_copy_only=False)
        tb = g.column("top_bigram_frac").to_numpy(zero_copy_only=False)
        dt = g.column("dup_trigram_frac").to_numpy(zero_copy_only=False)
        p1 = dl <= 0.30
        p2 = p1 & (tb <= 0.20)
        p3 = p2 & (dt <= 0.30)
        return pa.table({
            "n_total": pa.array([t.num_rows], pa.int64()),
            "n_pass1": pa.array([int(p1.sum())], pa.int64()),
            "n_pass2": pa.array([int(p2.sum())], pa.int64()),
            "n_pass3": pa.array([int(p3.sum())], pa.int64()),
        })

    sums = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["n_total", "n_pass1", "n_pass2", "n_pass3"])
    return pa.table({k: pa.array([int(sums[f"sum({k})"] or 0)], pa.int64())
                     for k in ("n_total", "n_pass1", "n_pass2", "n_pass3")})


def _q_lang_consistency(sf_dir: str):
    """Keep docs whose lang matches their source's MAJORITY lang
    (cross-doc consistency filter): one majority groupby, broadcast
    {source: majority} map, vectorized filter."""
    from open_thoughts_ray.ops.consensus import majority_vote

    ds = _rp(sf_dir, "documents", ["doc_id", "source", "lang"])
    maj = majority_vote(ds.select_columns(["source", "lang"]),
                        "source", "lang").to_pandas()  # O(#sources)
    winners = dict(zip(maj["source"], maj["majority_lang"]))

    def f(t: pa.Table) -> pa.Table:
        keep = [winners.get(s) == l
                for s, l in zip(t.column("source").to_pylist(),
                                t.column("lang").to_pylist())]
        return t.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(f, batch_format="pyarrow")


def _q_source_scorecard(sf_dir: str):
    """Per-slice audit scorecard: docs, exact mean length (one integer
    division), distinct langs per source — per-batch int partials, one
    grouped Sum + one distinct groupby."""
    from ray.data.aggregate import Sum

    from open_thoughts_ray.ops.relational import grouped_nunique

    ds = _rp(sf_dir, "documents", ["source", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.select(["source", "n_chars"]).to_pandas()
        g = df.groupby("source", sort=False)["n_chars"].agg(["count", "sum"])
        return pa.table({
            "source": pa.array(g.index.tolist(), pa.string()),
            "n_docs": pa.array(g["count"].astype("int64").tolist(),
                               pa.int64()),
            "sum_chars": pa.array(g["sum"].astype("int64").tolist(),
                                  pa.int64()),
        })

    stats = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("source", num_partitions=8)
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("sum_chars", alias_name="sum_chars")))
    langs = grouped_nunique(ds.select_columns(["source", "lang"]),
                            "source", "lang", out_col="n_langs")
    from open_thoughts_ray.ops.joinsafe import safe_join

    joined = safe_join(stats, langs, join_type="inner", on=("source",),
                       num_partitions=8)

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np

        n = t.column("n_docs").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("sum_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "source": t.column("source"),
            "n_docs": t.column("n_docs"),
            "mean_chars": pa.array(s / n, pa.float64()),
            "n_langs": t.column("n_langs"),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def _q_snapshot_diff(sf_dir: str):
    """Corpus snapshot diff: OLD = doc_id%10 < 9, NEW = doc_id%10 > 0
    with text marked '[edited]' when doc_id%7 == 0 — all four classes
    (added/removed/changed/unchanged) fire; one full-outer fingerprint
    join, int-partial counts."""
    import pyarrow.compute as pc

    from open_thoughts_ray.ops.dedup import snapshot_diff
    from open_thoughts_ray.ops.relational import filter_expr

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    import numpy as np

    def mod(t, m):
        return pa.array(
            t.column("doc_id").to_numpy(zero_copy_only=False) % m,
            pa.int64())

    old = filter_expr(ds, lambda t: pc.less(mod(t, 10), 9))
    new = filter_expr(ds, lambda t: pc.greater(mod(t, 10), 0))

    def edit(t: pa.Table) -> pa.Table:
        mask = pc.equal(mod(t, 7), 0)
        edited = pc.binary_join_element_wise(
            t.column("text"), pa.array(["[edited]"] * t.num_rows), " ")
        out = pc.if_else(mask, edited, t.column("text"))
        return pa.table({"doc_id": t.column("doc_id"), "text": out})

    return snapshot_diff(old, new.map_batches(edit,
                                              batch_format="pyarrow"))


def _q_retrieval_eval(sf_dir: str):
    """Retrieval eval: recall@10 and MRR of the raw term-count ranker
    against BM25-as-gold — the evaluate leg of the retrieval stack;
    metrics floor-quantized at 1e-6."""
    import math

    from open_thoughts_ray.ops.retrieval import (bm25_topk, ranking_eval,
                                                 termcount_topk)

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    gold = bm25_topk(ds, _BM25_QUERIES, k=10).materialize()
    sys = termcount_topk(ds, _BM25_QUERIES, k=10).materialize()
    t = ranking_eval(sys, gold, k=10)

    # HALF-UP rounding, not floor: the metrics are small-denominator
    # rationals (exact 0.4 here vs the SQL float sum 0.3999…97), and a
    # floor straddles that boundary; denominators ≤ 30 can never land on
    # a 1e-6 midpoint, so half-up is unambiguous on both sides
    def q(v: float) -> float:
        return math.floor(v * 1_000_000 + 0.5) / 1_000_000

    return pa.table({
        "n_queries": t.column("n_queries"),
        "recall_at_k": pa.array([q(t.column("recall_at_k")[0].as_py())],
                                pa.float64()),
        "mrr": pa.array([q(t.column("mrr")[0].as_py())], pa.float64()),
    })


def _q_rerank_topk(sf_dir: str):
    """Retrieve → fuse → rerank: the hybrid RRF top-10 candidates
    re-scored by token-set F1 (deterministic cross-encoder stand-in),
    top-5 per query."""
    from open_thoughts_ray.ops.retrieval import (hybrid_rrf_topk,
                                                 token_f1_rerank)

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    hyb = hybrid_rrf_topk(ds, _BM25_QUERIES, k=10).materialize()
    return token_f1_rerank(ds, hyb, _BM25_QUERIES, k=5)


def _q_math_verify(sf_dir: str):
    """Math answer verification (reference verify.py gate): rows are
    deterministically augmented with doc_id-keyed solution/ground-truth
    pairs so every extractor branch fires (boxed fraction-vs-decimal,
    mismatch, no-box fallback, percent, thousands commas); the REAL
    extractor runs on the Ray side and the oracle replays the
    construction rules — any extractor misbehaviour hash-mismatches."""
    from open_thoughts_ray.ops.math_answers import math_answer_verify

    ds = _rp(sf_dir, "documents", ["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        preds, golds = [], []
        for d in t.column("doc_id").to_pylist():
            r = d % 5
            if r == 0:
                preds.append(f"thus \\boxed{{\\frac{{{d}}}{{2}}}}")
                golds.append(f"ans \\boxed{{{d / 2:.1f}}}")
            elif r == 1:
                preds.append(f"so \\boxed{{{d}}}")
                golds.append(f"\\boxed{{{d + 1}}}")
            elif r == 2:
                preds.append(f"the value is {d}.25")
                golds.append(f"\\boxed{{{d}.25}}")
            elif r == 3:
                preds.append("\\boxed{50%}")
                golds.append("\\boxed{0.5}")
            else:
                preds.append("\\boxed{1,234}")
                golds.append("\\boxed{1234}")
        return t.append_column("solution", pa.array(preds, pa.string())) \
                .append_column("ground_truth", pa.array(golds, pa.string()))

    ann = math_answer_verify(ds.map_batches(synth, batch_format="pyarrow"),
                             "solution", "ground_truth")
    return ann.select_columns(["doc_id", "extracted_answer",
                               "extracted_gold", "verifier_label"])


def _q_normalize_text(sf_dir: str):
    """CCNet-style canonical text form — vectorized Arrow regex kernels,
    no per-row Python."""
    from open_thoughts_ray.ops.columns import normalize_text_batch

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(normalize_text_batch,
                          batch_format="pyarrow").select_columns(
        ["doc_id", "norm_text"])


def _q_component_sizes(sf_dir: str):
    """Dup-cluster audit: histogram of fingerprint-component sizes —
    components from the distributed label-propagation engine, then two
    tiny grouped counts."""
    from open_thoughts_ray.ops.dedup import fingerprint_components

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    comp = fingerprint_components(ds, "doc_id", "text", 3, 3)
    sizes = comp.groupby("component").count().map_batches(
        lambda t: pa.table({"size": t.column("count()")}),
        batch_format="pyarrow")
    return sizes.groupby("size").count().map_batches(
        lambda t: pa.table({"size": t.column("size"),
                            "n_components": t.column("count()")}),
        batch_format="pyarrow")


def _q_pmi_bigrams(sf_dir: str):
    """Top-20 collocations by PMI (pair count ≥ 5) — Church & Hanks
    association mining; exact-integer ratios through one libm ln."""
    from open_thoughts_ray.ops.consensus import pmi_top_bigrams

    ds = _rp(sf_dir, "documents", ["text"])
    return pmi_top_bigrams(ds, "text", k=20, min_count=5)


def _q_ks_documents(sf_dir: str):
    """Two-sample KS statistic on n_chars between the even/odd doc_id
    halves — binning-free distribution-shift test; quantized at 1e-6."""
    import math

    import pyarrow.compute as pc

    from open_thoughts_ray.ops.relational import filter_expr, ks_statistic

    ds = _rp(sf_dir, "documents", ["doc_id", "n_chars"])
    even = filter_expr(ds, lambda t: pc.equal(
        pc.bit_wise_and(t.column("doc_id"), 1), 0))
    odd = filter_expr(ds, lambda t: pc.equal(
        pc.bit_wise_and(t.column("doc_id"), 1), 1))
    val = ks_statistic(even, odd, "n_chars")
    return pa.table({"ks": pa.array(
        [math.floor(val * 1_000_000) / 1_000_000], pa.float64())})


def _q_components_documents(sf_dir: str):
    """Connected components of the shares-a-prefix-or-suffix-fingerprint
    graph, computed by the DISTRIBUTED label-propagation engine (the
    10^12-row path) — the oracle replays connectivity with a recursive
    transitive closure, so the component machinery itself is
    hash-checked."""
    from open_thoughts_ray.ops.dedup import fingerprint_components

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return fingerprint_components(ds, "doc_id", "text", 3, 3)


def _q_delta_ingest(sf_dir: str):
    """Incremental-ingest dedup: the doc_id%4==3 quarter is 'today's
    crawl', deduped by 10-token-prefix fingerprint against the already-
    ingested three quarters — one thin hash anti-join."""
    import pyarrow.compute as pc

    from open_thoughts_ray.ops.dedup import delta_ingest_dedup
    from open_thoughts_ray.ops.relational import filter_expr

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    seen = filter_expr(ds, lambda t: pc.less(
        pc.bit_wise_and(t.column("doc_id"), 3), 3))
    new = filter_expr(ds, lambda t: pc.equal(
        pc.bit_wise_and(t.column("doc_id"), 3), 3))
    out = delta_ingest_dedup(new, seen, prefix_tokens=10)
    return out.select_columns(["doc_id", "fp"])


def _q_funnel_events(sf_dir: str):
    """Ordered view → click → purchase funnel: per-stage user counts
    with strictly-increasing timestamps between stages."""
    from open_thoughts_ray.ops.temporal import funnel_counts

    ds = _rp(sf_dir, "events", ["user_id", "event_type", "ts"])
    return funnel_counts(ds, ["view", "click", "purchase"])


def _q_profile_documents(sf_dir: str):
    """One-row dataset card (n_docs / tokens / chars / distinct tokens /
    entropy) — entropy floor-quantized at 1e-6 like token_entropy."""
    import math

    from open_thoughts_ray.ops.textstats import corpus_profile

    ds = _rp(sf_dir, "documents", ["text"])
    p = corpus_profile(ds)
    return pa.table({
        "n_docs": pa.array([p["n_docs"]], pa.int64()),
        "n_tokens": pa.array([p["n_tokens"]], pa.int64()),
        "n_chars": pa.array([p["n_chars"]], pa.int64()),
        "distinct_tokens": pa.array([p["distinct_tokens"]], pa.int64()),
        "token_entropy": pa.array(
            [math.floor(p["token_entropy"] * 1_000_000) / 1_000_000],
            pa.float64()),
    })


def _q_ctfidf_per_source(sf_dir: str):
    """c-TF-IDF (BERTopic): top-5 terms most characteristic of each
    source — class term counts + class-df, fully shuffle-based."""
    from open_thoughts_ray.ops.retrieval import ctfidf_top_terms_per_class

    ds = _rp(sf_dir, "documents", ["source", "text"])
    return ctfidf_top_terms_per_class(ds, "source", "text", k=5)


def _q_rrf_hybrid_topk(sf_dir: str):
    """Hybrid retrieval: BM25 top-10 ⊕ raw-term-count top-10 fused by
    reciprocal-rank fusion (floor(1e9/(60+rank)) int64 contributions —
    order-free sums, bit-identical SQL replay)."""
    from open_thoughts_ray.ops.retrieval import hybrid_rrf_topk

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return hybrid_rrf_topk(ds, _BM25_QUERIES, k=10)


def _q_hash_split(sf_dir: str):
    """Deterministic md5-bucket train/val/test assignment (80/10/10)."""
    from open_thoughts_ray.ops.columns import hash_split_batch

    ds = _rp(sf_dir, "documents", ["doc_id"])
    return ds.map_batches(hash_split_batch, batch_format="pyarrow")


def _q_chunk_documents(sf_dir: str):
    """Overlapping 32-token windows every 24 tokens (RAG chunk prep) —
    pure fan-out, no shuffle."""
    from open_thoughts_ray.ops.packing import chunk_tokens

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return chunk_tokens(ds, chunk_size=32, stride=24)


def _q_dedup_lines_within(sf_dir: str):
    """Intra-doc line dedup (CCNet paragraph dedup): first occurrence
    of each 6-token window line wins, order preserved; doc-local, no
    shuffle."""
    from open_thoughts_ray.ops.boilerplate import dedup_lines_within_doc

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return dedup_lines_within_doc(ds, "doc_id", "text", line_tokens=6)


def _q_zscore_events(sf_dir: str):
    """Global z-score standardization of events.value on exact integer
    cents moments — bit-identical SQL replay, no quantization."""
    from open_thoughts_ray.ops.relational import zscore_column

    ds = _rp(sf_dir, "events", ["event_id", "value"])
    return zscore_column(ds, "value", "z_value").select_columns(
        ["event_id", "z_value"])


def _q_minmax_events(sf_dir: str):
    """Global min-max normalization of events.value — min/max are exact
    value picks, so the rescale hash-matches SQL with no quantization."""
    from open_thoughts_ray.ops.relational import minmax_normalize_column

    ds = _rp(sf_dir, "events", ["event_id", "value"])
    return minmax_normalize_column(ds, "value", "norm_value").select_columns(
        ["event_id", "norm_value"])


def _q_psi_events(sf_dir: str):
    """Population Stability Index between the even/odd event_id halves
    of events.value (20 bins over [0, 200)) — drift monitor; quantized
    at 1e-6."""
    import math

    import pyarrow.compute as pc

    from open_thoughts_ray.ops.relational import (filter_expr,
                                                  population_stability_index)

    ds = _rp(sf_dir, "events", ["event_id", "value"])
    even = filter_expr(ds, lambda t: pc.equal(
        pc.bit_wise_and(t.column("event_id"), 1), 0))
    odd = filter_expr(ds, lambda t: pc.equal(
        pc.bit_wise_and(t.column("event_id"), 1), 1))
    val = population_stability_index(even, odd, "value", 0.0, 200.0, 20)
    q = math.floor(val * 1_000_000) / 1_000_000
    return pa.table({"psi": pa.array([q], pa.float64())})


def _q_zscore_per_type_events(sf_dir: str):
    """Per-event_type z-score of value on exact cents moments — the
    within-group normalizer; hash-identical to the SQL window replay."""
    from open_thoughts_ray.ops.relational import zscore_per_group

    ds = _rp(sf_dir, "events", ["event_id", "event_type", "value"])
    return zscore_per_group(ds, "event_type", "value",
                            "z_value").select_columns(
        ["event_id", "z_value"])


def _q_dau_events(sf_dir: str):
    """Daily active users: exact count(DISTINCT user) per day — derived
    day key + two-level distinct groupby (no per-group sets)."""
    import pyarrow.compute as pc

    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "events", ["ts", "user_id"])
    withday = ds.map_batches(
        lambda t: t.append_column(
            "day", pc.strftime(t.column("ts"), format="%Y-%m-%d")),
        batch_format="pyarrow",
    ).select_columns(["day", "user_id"])
    return R.grouped_nunique(withday, "day", "user_id", out_col="dau")


def _q_weighted_sample_documents(sf_dir: str):
    """Deterministic weighted Bernoulli sample: keep iff
    md5-uniform(doc_id) < n_chars/1000 — quality-weighted downsampling,
    partition-order free."""
    from open_thoughts_ray.ops.columns import weighted_bernoulli_sample_batch

    ds = _rp(sf_dir, "documents", ["doc_id", "n_chars"])
    return ds.map_batches(
        weighted_bernoulli_sample_batch, batch_format="pyarrow",
        fn_kwargs=dict(id_col="doc_id", weight_col="n_chars", scale=1000.0))


def _q_percent_rank_documents(sf_dir: str):
    """Global percent-rank (ECDF) of n_chars — frequency-table broadcast,
    no global sort; exact-integer division, no quantization."""
    from open_thoughts_ray.ops.relational import percent_rank_annotate

    ds = _rp(sf_dir, "documents", ["doc_id", "n_chars"])
    return percent_rank_annotate(ds, "n_chars").select_columns(
        ["doc_id", "pr_n_chars"])


def _q_mi_lang_source(sf_dir: str):
    """Mutual information (nats) between lang and source — one
    contingency groupby; floor-quantized at 1e-6 like token_entropy."""
    import math

    from open_thoughts_ray.ops.relational import mutual_information

    ds = _rp(sf_dir, "documents", ["lang", "source"])
    val = mutual_information(ds, "lang", "source")
    q = math.floor(val * 1_000_000) / 1_000_000
    return pa.table({"mi": pa.array([q], pa.float64())})


def _q_robust_scale_events(sf_dir: str):
    """Median/IQR robust standardization of events.value (exact
    quantile_cont quantiles + deterministic double rescale — no
    quantization needed)."""
    from open_thoughts_ray.ops.relational import robust_scale_column

    ds = _rp(sf_dir, "events", ["event_id", "value"])
    return robust_scale_column(ds, "value", "robust_value").select_columns(
        ["event_id", "robust_value"])


def _q_histogram_events(sf_dir: str):
    """Fixed-width 20-bin histogram of events.value over [0, 200) —
    per-batch pre-combined bucket counts, one tiny groupby Sum."""
    from open_thoughts_ray.ops.relational import histogram_column

    ds = _rp(sf_dir, "events", ["value"])
    return histogram_column(ds, "value", 0.0, 200.0, 20)


def _q_tfidf_top_terms(sf_dir: str):
    """Top-3 TF-IDF terms per document (keyword extraction).  No float
    sums anywhere — every score is a product of exact-integer ratios and
    one libm ln, so the ranking matches DuckDB bit-for-bit."""
    from open_thoughts_ray.ops.retrieval import tfidf_top_terms

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_top_terms(ds, "doc_id", "text", k=3)


def _q_bow_dedup_keep_best(sf_dir: str):
    """Bag-of-words-fingerprint dedup keeping the BEST representative
    per cluster (max n_chars, tie → min doc_id) — the keep-best variant
    of exact_dedup over a token-shuffle-insensitive key."""
    from open_thoughts_ray.ops.dedup import bow_fingerprint_batch, dedup_keep_best

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    fp = ds.map_batches(bow_fingerprint_batch, batch_format="pyarrow")
    best = dedup_keep_best(fp, ["bow_fp"], ["n_chars", "doc_id"],
                           ascending=[False, True])
    return best.select_columns(["doc_id", "n_chars", "bow_fp"])


def _q_jsd_drift(sf_dir: str):
    """Jensen–Shannon drift between the even- and odd-doc_id halves of
    the corpus (stand-in for two crawl snapshots) — exact-integer
    mixture scale, floor-quantized at 1e-6 like token_entropy."""
    import math

    from open_thoughts_ray.ops.consensus import js_divergence
    from open_thoughts_ray.ops.relational import filter_expr

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    import pyarrow.compute as pc

    even = filter_expr(ds, lambda t: pc.equal(
        pc.bit_wise_and(t.column("doc_id"), 1), 0))
    odd = filter_expr(ds, lambda t: pc.equal(
        pc.bit_wise_and(t.column("doc_id"), 1), 1))
    val = js_divergence(even, odd)
    q = math.floor(val * 1_000_000) / 1_000_000
    return pa.table({"jsd": pa.array([q], pa.float64())})


def _q_boilerplate_removal(sf_dir: str):
    """C4/CCNet-style corpus-frequent-line pruning: lines = 6-token
    windows (deterministic stand-in for newline lines — the synthetic
    corpus has none), drop every line whose document frequency ≥ 2,
    rejoin in order.  One (8-byte hash, count) shuffle; the DuckDB
    oracle replays the rule on the line STRINGS, so the driver gate
    also proves the 64-bit line hash never collided."""
    from open_thoughts_ray.ops.boilerplate import remove_boilerplate_lines

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return remove_boilerplate_lines(ds, "doc_id", "text", line_tokens=6,
                                    min_df=2)


def _q_metamath_extract_answer(sf_dir: str):
    """ExtractMathAnswerMap (Metamath/extract_math_answer_map.py:15-79
    shape): structured numerical-answer extraction with the
    digit-presence keep filter, replayed in SQL via regexp_matches."""
    from open_thoughts_ray.llm import completions
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    ds = R.sample_by_hash(ds, "doc_id", keep_every=25, residue=9)
    out = completions(
        ds, "metamath_extract_math_answer",
        {"detailed_answer_column": "text",
         "output_numerical_answer_column": "num"},
        concurrency=2, batch_size=512,
    )
    return out.select_columns(["doc_id", "num"])


def _q_url_classify(sf_dir: str):
    """URLClassifyMap (WebInstruct/url_classify_map.py:17-103 shape):
    free-text classification with the last-word yes/no protocol over
    the documents' source field."""
    from open_thoughts_ray.llm import completions
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "source"])
    ds = R.sample_by_hash(ds, "doc_id", keep_every=25, residue=10)
    out = completions(
        ds, "url_classify", {"input_url_column": "source"},
        concurrency=2, batch_size=512,
    )
    return out.select_columns(["doc_id", "url_classification"])


def _q_webinstruct_qa(sf_dir: str):
    """ExtractQAMap (WebInstruct/extract_qa_map.py:8-76 shape): QA-pair
    fan-out gated on the model's qa_exists flag — 0 or num_pairs output
    rows per document."""
    from open_thoughts_ray.llm import completions
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    ds = R.sample_by_hash(ds, "doc_id", keep_every=25, residue=11)
    out = completions(
        ds, "webinstruct_extract_qa",
        {"input_text_column": "text", "output_question_column": "q",
         "output_answer_column": "a", "num_pairs": 2},
        concurrency=2, batch_size=512,
    )
    return out.select_columns(["doc_id", "q", "a"])


def _q_substring_scrub(sf_dir: str):
    """Cross-document duplicated-substring scrub (Lee et al. 2022
    semantics at k-gram granularity): every token covered by a 5-gram
    occurring in >= 2 distinct documents is removed.  The DuckDB oracle
    replays the rule on the gram STRINGS, so the gate also proves the
    64-bit gram hash never collided at test scale."""
    from open_thoughts_ray.ops.substring import exact_substring_scrub

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return exact_substring_scrub(ds, id_col="doc_id", text_col="text",
                                 k=5, min_docs=2, out_col="clean_text")


def _q_token_budget(sf_dir: str):
    """Per-source token-budget quota (ops/packing.token_budget_select):
    keep each source's (n_chars DESC, doc_id) prefix while cumulative
    whitespace-token count stays ≤ 2000 — integer window cumsum, so the
    SQL window replay is bit-identical."""
    from open_thoughts_ray.ops.packing import token_budget_select
    from open_thoughts_ray.ops.textstats import token_count_batch

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "source", "n_chars"])
    ds = ds.map_batches(token_count_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "source", "n_chars", "n_tokens"])
    out = token_budget_select(ds, "source", "n_chars", "n_tokens",
                              budget=2000, id_col="doc_id")
    return out.select_columns(["doc_id", "source", "n_tokens"])


_DELTA_SEEN_SOURCES = ("src0", "src1")


def _q_delta_neardup(sf_dir: str):
    """Incremental MinHash near-dup ingest: documents from src0/src1
    are the already-seen corpus, the rest are the NEW delta; a new doc
    survives iff it has no verified near-dup edge to any seen doc or
    earlier new doc.  md5 hasher + earlier semantics → the full rule
    replays in SQL (the parameterized _minhash_oracle with an
    id-offset source relation)."""
    import pyarrow.compute as pc

    from open_thoughts_ray.ops.dedup_text import delta_neardup_ingest

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "source"])
    seen = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column("source"),
                                    pa.array(_DELTA_SEEN_SOURCES))),
        batch_format="pyarrow")
    new = ds.map_batches(
        lambda t: t.filter(pc.invert(
            pc.is_in(t.column("source"), pa.array(_DELTA_SEEN_SOURCES)))),
        batch_format="pyarrow")
    out = delta_neardup_ingest(new, seen, threshold=0.7, hasher="md5")
    return out.select_columns(["doc_id"])


def _q_delta_neardup_indexed(sf_dir: str):
    """Same rule as delta_neardup_documents but through the PERSISTED
    signature index (ops/minhash_index.py): seen docs' signatures are
    built once into a parquet index and the delta is vetted against it
    by signature agreement — the seen corpus text is never re-read.
    Shares the delta oracle SQL (the two paths are semantically
    identical, so this doubles as an equivalence check)."""
    import tempfile

    import pyarrow.compute as pc

    from open_thoughts_ray.ops.minhash_index import (
        build_minhash_index,
        delta_neardup_vs_index,
    )

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "source"])
    seen = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column("source"),
                                    pa.array(_DELTA_SEEN_SOURCES))),
        batch_format="pyarrow")
    new = ds.map_batches(
        lambda t: t.filter(pc.invert(
            pc.is_in(t.column("source"), pa.array(_DELTA_SEEN_SOURCES)))),
        batch_format="pyarrow")
    idx = build_minhash_index(seen, tempfile.mkdtemp(prefix="otr_mhidx_"),
                              hasher="md5")
    out = delta_neardup_vs_index(new, idx, threshold=0.7,
                                 update_index=False)
    return out.select_columns(["doc_id"])


def _q_delta_exact_indexed(sf_dir: str):
    """Exact-fingerprint incremental ingest through the PERSISTED
    Bloom index (ops/bloom_index.py): seen docs' md5-64 content hashes
    are written once as a hash-partitioned table + per-partition Bloom
    filters; the delta is vetted by Bloom prefilter (no disk on a
    miss) + partition-pruned exact verify (false positives rescued).
    Fingerprint is DuckDB-replayable (md5 first 16 hex chars), so the
    whole three-tier decision is SQL-hash-checked."""
    import tempfile

    import pyarrow.compute as pc

    from open_thoughts_ray.ops.bloom_index import (
        build_bloom_index,
        delta_exact_dedup_vs_index,
    )

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "source"])
    seen = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column("source"),
                                    pa.array(_DELTA_SEEN_SOURCES))),
        batch_format="pyarrow")
    new = ds.map_batches(
        lambda t: t.filter(pc.invert(
            pc.is_in(t.column("source"), pa.array(_DELTA_SEEN_SOURCES)))),
        batch_format="pyarrow")
    idx = build_bloom_index(seen, tempfile.mkdtemp(prefix="otr_blidx_"),
                            n_parts=8)
    out = delta_exact_dedup_vs_index(new, idx, update_index=False)
    return out.select_columns(["doc_id"])


def _q_tree_search(sf_dir: str):
    """Level-synchronous tree search (reference tree_search_operator.py
    re-expressed).  The per-level recursion is impractical in one SQL
    statement, so the oracle is the golden-fixture replay
    (scripts/gen_golden.py — bit-identical at 8 and 32 CPUs); BFS
    structure/budget/determinism are asserted in
    tests/test_tree_search.py and the building blocks are
    SQL-hash-checked by llm_list_fanout / llm_annotate."""
    from open_thoughts_ray.llm.tree_search import tree_search
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "text"]).rename_columns(
        {"text": "instruction"})
    ds = R.sample_by_hash(ds, "doc_id", keep_every=50, residue=0)
    out = tree_search(ds, beam_width=2, beam_depth=2, node_budget=5)

    def flat(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "trace": pa.array([" | ".join(s) for s in
                               t.column("steps").to_pylist()],
                              pa.string()),
            "is_terminal": t.column("is_terminal"),
            "depth": t.column("depth"),
        })

    return out.map_batches(flat, batch_format="pyarrow")


def _q_distill_quality(sf_dir: str):
    """FineWeb-Edu-style teacher→classifier distillation (distill.py):
    keyword-rubric teacher scores a 20% seeded sample, distilled
    hashed-n-gram classifier scores the full corpus.  The count-based
    classifier's softmax isn't SQL, so the oracle is the golden-fixture
    replay (scripts/gen_golden.py); rule-reproduction accuracy ≥95% is
    asserted in tests/test_distill.py."""
    from open_thoughts_ray.distill import distill_quality_classifier, \
        score_with_classifier

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    model = distill_quality_classifier(
        ds, sample_frac=0.2, backend="keyword_rubric",
        backend_kwargs={"keyword": "the"}, score_threshold=50.0)
    out = score_with_classifier(ds, model)
    return out.select_columns(["doc_id", "quality_score"])


def _q_image_search(sf_dir: str):
    """Cross-modal retrieval: text queries over the image corpus through
    the shared alignment space (golden-fixture oracle,
    scripts/gen_golden.py); self-retrieval rank-1 is asserted in
    tests/test_align.py."""
    from open_thoughts_ray.fixtures.images import build_images_table
    from open_thoughts_ray.io import lance_table
    from open_thoughts_ray.ops.align import image_search

    table = build_images_table(
        "/tmp/otr_align_images", n_rows=2000, n_parts=16, seed=42,
        use_ray=True)
    ds = lance_table.read_dataset(table)
    return image_search(ds, {0: "bright contrast", 1: "dark smooth"},
                        k=10)


def _q_kcenter_select(sf_dir: str):
    """Greedy k-center diversity selection (the iterative farthest-point
    greedy is not SQL-expressible; golden-fixture oracle via
    scripts/gen_golden.py, serial parity asserted in
    tests/test_diversity.py)."""
    from open_thoughts_ray.ops.diversity import kcenter_select_dataset

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kcenter_select_dataset(ds, k=20).select_columns(["vec_id"])


def _q_image_caption_alignment(sf_dir: str):
    """Image–caption alignment (CLIP-score analogue, ops/align.py):
    deterministic two-tower stand-in in a shared hashed-token space.
    The seeded projection is not SQL-expressible; golden-fixture oracle
    via scripts/gen_golden.py, serial bit-parity +
    matched-vs-mismatched separation asserted in tests/test_align.py."""
    from open_thoughts_ray.fixtures.images import build_images_table
    from open_thoughts_ray.io import lance_table
    from open_thoughts_ray.ops.align import align_score

    table = build_images_table(
        "/tmp/otr_align_images", n_rows=2000, n_parts=16, seed=42,
        use_ray=True)
    ds = lance_table.read_dataset(table)
    return align_score(ds).select_columns(["image_id", "align_score"])


def _q_dsir_select(sf_dir: str):
    """DSIR importance selection (Xie et al. 2023): top-50 documents by
    hashed-unigram+bigram likelihood ratio toward the lang='en' subset.
    Every weight is floor(1e6·ln(int-ratio)) summed in int64, so the
    DuckDB replay matches bit-for-bit (exactness bound in ops/dsir.py)."""
    from open_thoughts_ray.ops import relational as R
    from open_thoughts_ray.ops.dsir import dsir_select

    docs = _rp(sf_dir, "documents", ["doc_id", "text", "lang"])
    target = R.filter_in(docs, "lang", ["en"]).select_columns(
        ["doc_id", "text"])
    raw = docs.select_columns(["doc_id", "text"])
    return dsir_select(raw, target, k=50, buckets=4096)


def _q_substring_flag(sf_dir: str):
    """Screen half of the substring pass: doc_ids containing at least
    one cross-document-duplicated 5-gram (forced through the distributed
    explode/join path so the gate exercises it, not just pytest)."""
    from open_thoughts_ray.ops.substring import flag_dup_substring_docs

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return flag_dup_substring_docs(ds, id_col="doc_id", text_col="text",
                                   k=5, min_docs=2, max_driver_grams=0)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # Order matters: the driver's correctness gate evaluates the
        # FIRST 50 entries, so slots 1-50 carry one representative per
        # operator family (relational/joins/windows/grouped-analytics/
        # temporal/dedup/ANN/text-rules/retrieval/sketch/LLM/normalizer);
        # 51+ are the remaining variants, verified locally by
        # scripts/check_queries.py.
        "q1_pricing_summary": _q1_pricing_summary,
        "filter_documents": _q_filter_documents,
        "grouped_count_having": _q_grouped_count_having,
        "hash_join_lineitem_orders": _q_hash_join,
        "broadcast_join_orders_customers": _q_broadcast_join,
        "top_k_events": _q_top_k_events,
        "window_events_hourly": _q_window_events,
        "union_tagged_documents": _q_union_tagged,
        "sample_mod10": _q_sample_mod10,
        "stratified_first2_documents": _q_stratified_first2,
        "latest_event_per_user": _q_latest_event_per_user,
        "p90_value_per_type": _q_p90_value_per_type,
        "langs_per_source": _q_langs_per_source,
        "substring_scrub_documents": _q_substring_scrub,
        "dsir_select_documents": _q_dsir_select,
        "token_budget_select_documents": _q_token_budget,
        "sessionize_events": _q_sessionize,
        "asof_join_events": _q_asof_join,
        "range_join_events": _q_range_join_events,
        "funnel_events": _q_funnel_events,
        "exact_dedup_documents": _q_exact_dedup_documents,
        "minhash_dedup_documents": _q_minhash_dedup,
        "simhash_dedup_documents": _q_simhash_dedup,
        "ngram_jaccard_dedup_documents": _q_ngram_jaccard_dedup,
        "flagship_quality_filter": _q_flagship,
        "json_source_documents": _q_json_source,
        "bow_dedup_keep_best_documents": _q_bow_dedup_keep_best,
        "embedding_cosine_dedup": _q_cosine_dedup,
        "md5_fingerprint_documents": _q_md5_fingerprint,
        "ann_topk_embeddings": _q_ann_topk,
        "decontaminate_documents": _q_decontaminate,
        "delta_ingest_documents": _q_delta_ingest,
        "components_documents": _q_components_documents,
        "token_count_documents": _q_token_count,
        "scrub_documents": _q_scrub_documents,
        "normalize_text_documents": _q_normalize_text,
        "quality_stats_documents": _q_quality_stats,
        "gopher_repetition_documents": _q_gopher_repetition,
        "doc_quality_filter": _q_doc_quality_filter,
        "boilerplate_removal_documents": _q_boilerplate_removal,
        "dedup_lines_within_documents": _q_dedup_lines_within,
        "token_entropy_documents": _q_token_entropy,
        "jsd_drift_documents": _q_jsd_drift,
        "approx_distinct_users": _q_approx_distinct,
        "bm25_topk_documents": _q_bm25_topk,
        "tfidf_top_terms_documents": _q_tfidf_top_terms,
        "rrf_hybrid_topk_documents": _q_rrf_hybrid_topk,
        "retrieval_eval_documents": _q_retrieval_eval,
        "llm_annotate_documents": _q_llm_annotate,
        "zscore_events": _q_zscore_events,
        # io family extra (beyond the 50-entry driver window by design —
        # json_source_documents is the family's in-window representative)
        "resilient_shard_source_documents": _q_resilient_shard_source,
        # ---- entries 51+ (variants; local gate) ----
        "quantile_filter_events": _q_quantile_filter_events,
        "majority_event_type_per_user": _q_majority_event_type,
        "token_gini_documents": _q_token_gini,
        "self_bleu_documents": _q_self_bleu,
        "q3_revenue_by_segment_priority": _q3_shipping_priority,
        "fuzzy_dedup_documents": _q_fuzzy_dedup,
        "ann_topk_ivf_embeddings": _q_ann_topk_ivf,
        "cosine_dedup_lsh_embeddings": _q_cosine_dedup_lsh,
        "llm_score_filter_documents": _q_llm_score_filter,
        "llm_list_fanout_documents": _q_llm_list_fanout,
        "llm_generate_ideas_documents": _q_llm_generate,
        "llm_test_cases_documents": _q_llm_test_cases,
        "llm_alpaca_documents": _q_llm_alpaca,
        "llm_unnatural_documents": _q_llm_unnatural,
        "llm_seed_task_documents": _q_llm_seed_task,
        "llm_open_gpt_documents": _q_llm_open_gpt,
        "llm_difficulty_documents": _q_llm_difficulty,
        "llm_reasoner_documents": _q_llm_reasoner,
        "bpe_token_count_documents": _q_bpe_token_count,
        "llm_judge_documents": _q_llm_judge,
        "llm_critic_documents": _q_llm_critic,
        "llm_fuse_documents": _q_llm_fuse,
        "top_tokens_documents": _q_top_tokens,
        "distinct_bigram_ratio_documents": _q_distinct_bigram_ratio,
        "priority_sample_documents": _q_priority_sample,
        "stratified_priority_sample_documents": _q_stratified_priority_sample,
        "approx_top_tokens_documents": _q_approx_top_tokens,
        "domain_annotate_documents": _q_domain_annotate,
        "median_quantity_per_flag": _q_median_quantity,
        "corr_qty_price": _q_corr_qty_price,
        "pivot_events_by_type": _q_pivot_events,
        "top2_events_per_user": _q_top2_events_per_user,
        "distinct_types_per_user": _q_distinct_types_per_user,
        "pack_documents": _q_pack_documents,
        "mixture_sample_documents": _q_mixture_sample,
        "semantic_dedup_embeddings": _q_semantic_dedup,
        "levenshtein_dedup_documents": _q_levenshtein_dedup,
        "containment_dedup_documents": _q_containment_dedup,
        "hash_split_documents": _q_hash_split,
        "chunk_documents": _q_chunk_documents,
        "minmax_events": _q_minmax_events,
        "robust_scale_events": _q_robust_scale_events,
        "histogram_events": _q_histogram_events,
        "percent_rank_documents": _q_percent_rank_documents,
        "mi_lang_source_documents": _q_mi_lang_source,
        "dau_events": _q_dau_events,
        "weighted_sample_documents": _q_weighted_sample_documents,
        "psi_events": _q_psi_events,
        "zscore_per_type_events": _q_zscore_per_type_events,
        "ctfidf_per_source_documents": _q_ctfidf_per_source,
        "profile_documents": _q_profile_documents,
        "ks_documents": _q_ks_documents,
        "pmi_bigrams_documents": _q_pmi_bigrams,
        "math_verify_documents": _q_math_verify,
        "rerank_topk_documents": _q_rerank_topk,
        "snapshot_diff_documents": _q_snapshot_diff,
        "source_scorecard_documents": _q_source_scorecard,
        "lang_consistency_documents": _q_lang_consistency,
        "rule_funnel_documents": _q_rule_funnel,
        "curriculum_interleave_documents": _q_curriculum_interleave,
        "component_sizes_documents": _q_component_sizes,
        "metamath_extract_answer_documents": _q_metamath_extract_answer,
        "url_classify_documents": _q_url_classify,
        "webinstruct_qa_documents": _q_webinstruct_qa,
        "substring_flag_documents": _q_substring_flag,
        "rolling_sum_events": _q_rolling_sum_events,
        "ntile_events_by_type": _q_ntile_events,
        "max_gap_events": _q_max_gap_events,
        "image_caption_alignment": _q_image_caption_alignment,
        "kcenter_select_embeddings": _q_kcenter_select,
        "distill_quality_documents": _q_distill_quality,
        "delta_neardup_documents": _q_delta_neardup,
        "image_search_corpus": _q_image_search,
        "delta_neardup_indexed_documents": _q_delta_neardup_indexed,
        "tree_search_documents": _q_tree_search,
        "code_judge_documents": _q_code_judge,
        "arpa_ppl_documents": _q_arpa_ppl,
        "zonemap_pruned_read_documents": _q_zonemap_pruned_read,
        "video_scene_cuts_documents": _q_video_scene_cuts,
        "delta_exact_indexed_documents": _q_delta_exact_indexed,
    }


def _q_arpa_ppl(sf_dir: str):
    """KenLM-style perplexity with the REAL public artifacts
    (models/arpa.py): an order-2 modified-Kneser-Ney LM fit on the
    doc_id%5==0 slice via distributed exact integer counts, serialized
    through the ARPA interchange format, and scored over the whole
    corpus with standard backoff lookup.  Golden-fixture oracle:
    integer counts, fixed-order KN arithmetic and per-row scoring are
    parallelism-independent (tests/test_arpa.py asserts distributed /
    serial bit parity and per-context sum-to-1)."""
    import pyarrow as pa

    from open_thoughts_ray.models.arpa import (ArpaLM,
                                               count_ngrams_distributed)

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    def _train_slice(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 5 == 0))

    train = ds.map_batches(_train_slice, batch_format="pyarrow")
    counts = count_ngrams_distributed(train, "text", order=2)
    # the LM round-trips through the ARPA text (the interchange seam)
    lm = ArpaLM.read_arpa(ArpaLM.from_counts(counts, 2).to_arpa())

    def score(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "arpa_ppl": pa.array(
                lm.perplexity_batch(t.column("text").to_pylist()),
                pa.float32()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def _q_zonemap_pruned_read(sf_dir: str):
    """Manifest zone-map pruned read (io/lance_table.py zone_stats /
    prune_fragments / read_dataset(filter_conjuncts=...)): documents
    is laid out ONCE as a Lance-layout fragment table bucketed into 16
    contiguous doc_id ranges (per-fragment min/max/null stats in the
    manifest), then read back with a range + equality filter.  The
    manifest alone prunes the out-of-range fragments BEFORE any
    parquet footer is opened — the read path a 10^12-row filtered scan
    needs — and the residual row filter pushes into the scan.  The
    callable self-checks that pruning actually fired (≥1 fragment
    skipped), so a silent stats regression fails the gate, and the
    pruned read is hash-compared against the plain SQL WHERE."""
    import hashlib
    import tempfile

    import pyarrow.parquet as pq

    from open_thoughts_ray.io import lance_table as LT

    src = os.path.join(sf_dir, "documents.parquet")
    tbl = pq.read_table(src, columns=["doc_id", "lang", "source",
                                      "n_chars"])
    order = pa.compute.sort_indices(tbl.column("doc_id"))
    tbl = tbl.take(order)
    key = hashlib.md5(f"{os.path.realpath(src)}|{tbl.num_rows}|v1"
                      .encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"otr_zonemap_{key}")
    if not os.path.exists(os.path.join(d, "manifest.json")):
        n_frag = 16
        step = max(1, (tbl.num_rows + n_frag - 1) // n_frag)
        frags = [LT.write_fragment(d, i, tbl.slice(i * step, step))
                 for i in range(n_frag) if i * step < tbl.num_rows]
        LT.write_manifest(d, frags)
    mn = int(pa.compute.min(tbl.column("doc_id")).as_py())
    mx = int(pa.compute.max(tbl.column("doc_id")).as_py())
    lo = mn + (mx - mn) // 4
    hi = mn + (mx - mn) // 2
    conj = [("doc_id", ">=", lo), ("doc_id", "<", hi),
            ("lang", "==", "en")]
    _, n_pruned = LT.prune_fragments(d, conj)
    if n_pruned < 1:
        raise AssertionError("zone maps pruned nothing — stats broken")
    return LT.read_dataset(d, filter_conjuncts=conj)


def _q_video_scene_cuts(sf_dir: str):
    """Scene-cut detection over REAL compressed video (io/avi.py
    RIFF/AVI-MJPEG, every frame a baseline JFIF JPEG): clips are
    synthesized deterministically from doc_id (two gradient segments
    with a planted boundary), encoded through the real container +
    codec, then ``ops/video.scene_cut_stage`` decodes and detects the
    boundary.  Output explodes cuts to (video_id, cut_frame) rows.
    Golden-fixture oracle (scripts/gen_golden.py): synthesis, JPEG
    round-trip and the frame-diff detector are all pure per-row
    functions of doc_id — bit-identical at any parallelism."""
    from open_thoughts_ray.io.avi import encode_avi_mjpeg
    from open_thoughts_ray.ops.video import scene_cut_stage

    ds = _rp(sf_dir, "documents", ["doc_id"]).sort("doc_id").limit(32)

    def synth(t: pa.Table) -> pa.Table:
        vids, bufs = [], []
        for i in t.column("doc_id").to_pylist():
            i = int(i)
            n = 10 + i % 4
            cut = 3 + i % 4
            h, w = 24, 32
            base = np.linspace(0, 255, w)[None, :, None] \
                .repeat(h, 0).repeat(3, 2)
            frames = []
            for f in range(n):
                if f < cut:
                    px = np.clip(base + (i * 7) % 60 + f, 0, 255)
                else:
                    px = np.clip(255 - base - (i * 11) % 60 - f, 0, 255)
                frames.append(px.astype(np.uint8))
            vids.append(f"v{i:05d}")
            bufs.append(encode_avi_mjpeg(np.stack(frames), fps=24,
                                         quality=90))
        return pa.table({"video_id": pa.array(vids, pa.string()),
                         "bytes": pa.array(bufs, pa.binary())})

    out = scene_cut_stage(ds.map_batches(synth, batch_format="pyarrow",
                                         batch_size=8),
                          threshold=40.0)

    def explode(t: pa.Table) -> pa.Table:
        vids, nfs, cuts = [], [], []
        for row in range(t.num_rows):
            for c in t.column("cuts")[row].as_py():
                vids.append(t.column("video_id")[row].as_py())
                nfs.append(t.column("n_frames")[row].as_py())
                cuts.append(c)
        return pa.table({"video_id": pa.array(vids, pa.string()),
                         "n_frames": pa.array(nfs, pa.int32()),
                         "cut_frame": pa.array(cuts, pa.int32())})

    return out.map_batches(explode, batch_format="pyarrow")


def _q_code_judge(sf_dir: str):
    """End-to-end code-judge gate (VERDICT r4 #8): solutions + tests
    are SYNTHESIZED deterministically from doc_id so the verdict of
    every row is SQL-predictable, yet the Ray side actually compiles
    and executes each solution in the sandboxed per-solution
    subprocess — both protocols (std stdin/stdout and call-based
    fn_name) and three verdict classes are exercised and hash-checked
    against the oracle."""
    import json as _json

    from open_thoughts_ray.ops.code_verify import verify_code

    ds = _rp(sf_dir, "documents", ["doc_id"]) \
        .sort("doc_id").limit(48)

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        codes, tests = [], []
        for i in ids:
            m = int(i) % 4
            if m == 0:      # std protocol, correct
                codes.append("print(int(input()) * 2)")
                tests.append(_json.dumps(
                    {"inputs": [f"{i}\n"], "outputs": [f"{int(i) * 2}\n"]}))
            elif m == 1:    # std protocol, wrong answer
                codes.append("print(int(input()) * 2 + 1)")
                tests.append(_json.dumps(
                    {"inputs": [f"{i}\n"], "outputs": [f"{int(i) * 2}\n"]}))
            elif m == 2:    # call-based protocol, correct
                codes.append("def add(a, b):\n    return a + b")
                tests.append(_json.dumps(
                    {"fn_name": "add", "inputs": [[int(i), 7]],
                     "outputs": [int(i) + 7]}))
            else:           # runtime error
                codes.append("raise ValueError('boom')")
                tests.append(_json.dumps(
                    {"inputs": [f"{i}\n"], "outputs": [f"{i}\n"]}))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "solution": pa.array(codes, pa.string()),
            "test_cases": pa.array(tests, pa.string()),
        })

    out = verify_code(ds.map_batches(synth, batch_format="pyarrow"),
                      timeout_s=5.0, concurrency=4)
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "passed": t.column("passed"),
            "n_passed": t.column("n_passed"),
            "n_tests": t.column("n_tests"),
            "verdict": pa.array(
                [(_json.loads(v) or ["none"])[0]
                 for v in t.column("verdicts").to_pylist()], pa.string()),
        }), batch_format="pyarrow")


def _q_ann_topk_ivf(sf_dir: str):
    """IVF-restricted approximate ANN (golden-fixture oracle — exact
    int64 scoring + content-sorted quantizer sample make the op
    block-count-invariant; recall characterized in
    tests/test_similarity_embed.py)."""
    import pyarrow.parquet as pq

    from open_thoughts_ray.ops.similarity import ann_topk_ivf

    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    q = np.stack(tbl.column("embedding").to_pylist()[:5])
    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ann_topk_ivf(ds, q, k=10, query_ids=list(range(5)),
                        n_cells=16, n_probe=8)


def _q_cosine_dedup_lsh(sf_dir: str):
    """Banded-LSH high-threshold near-dup collapse.  In-bucket
    verification is exact, so survivors match the exact NOT-EXISTS
    oracle whenever LSH recall is 1 — which holds on this table (the
    benchmark embeddings top out near cosine 0.48, far below the 0.9
    threshold; recall on corpora with REAL high-cosine dups is
    characterized against brute force in tests/test_similarity_embed)."""
    from open_thoughts_ray.ops.similarity import cosine_dedup_lsh

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_dedup_lsh(ds, threshold=0.9).select_columns(["vec_id"])


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): streamed k-means clustering, then
    cosine near-dup collapse restricted to within-cluster pairs
    (golden-fixture oracle — fixed-point int64 k-means is bit-identical
    at any parallelism; exactness on separated corpora is verified
    against brute force in tests/test_cluster.py)."""
    from open_thoughts_ray.ops.cluster import semantic_dedup

    ds = _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = semantic_dedup(ds, k=8, threshold=0.4, iters=6, seed=11)
    return out.sort("vec_id")


def _q_fuzzy_dedup(sf_dir: str):
    """Indel-ratio (fuzz.ratio) dedup — deduplicate.py:12-55 semantics
    via LSH candidates + exact ratio verification (edit distance is
    not SQL-expressible; golden-fixture oracle via
    scripts/gen_golden.py, recall/verify semantics tested in
    tests/test_editdist.py)."""
    from open_thoughts_ray.ops.fuzzy import fuzzy_dedup

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return fuzzy_dedup(ds, ratio_threshold=90.0).select_columns(["doc_id"])


def _q_llm_annotate(sf_dir: str):
    """LLM annotation (completions operator + ChatMap + deterministic
    mock backend, SURVEY.md §2.5): every response is md5 of the canonical
    prompt, so DuckDB reproduces the column bit-for-bit."""
    from open_thoughts_ray.llm import completions

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = completions(
        ds, "chat",
        {"user_message": "Summarize: {{text}}", "output_column": "annotation"},
        concurrency=4, batch_size=512,
    )
    return out.select_columns(["doc_id", "annotation"])


def _q_llm_score_filter(sf_dir: str):
    """ScorerMap annotation + threshold filter (the reference's AskLLM /
    quality-score rank filtering shape)."""
    from open_thoughts_ray.llm import completions

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    out = completions(
        ds, "scorer",
        {"user_message": "Rate: {{text}}", "output_column": "score"},
        concurrency=4, batch_size=512,
    )

    def finish(t: pa.Table) -> pa.Table:
        scores = t.column("score").cast(pa.int64())
        t = t.drop_columns(["score"]).append_column("score", scores)
        return t.filter(pc.greater_equal(t.column("score"), 50))

    return out.map_batches(finish, batch_format="pyarrow").select_columns(
        ["doc_id", "score"])


def _q_llm_list_fanout(sf_dir: str):
    """ListMap fan-out: one input row → num_items annotation rows
    (list_map.py:28-42 semantics as a flat-map over batches)."""
    from open_thoughts_ray.llm import completions
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    ds = R.sample_by_hash(ds, "doc_id", keep_every=25, residue=0)
    out = completions(
        ds, "list",
        {"user_message": "Ideas: {{text}}", "output_column": "idea",
         "num_items": 3},
        concurrency=2, batch_size=512,
    )
    return out.select_columns(["doc_id", "idea"])


def _q_priority_sample(sf_dir: str):
    """Deterministic distributed uniform sample WITHOUT a seeded global
    shuffle: keep the n rows with the smallest md5(doc_id) priority —
    order-independent, partition-independent, and SQL-reproducible
    (hash-priority / bottom-k sampling; each batch pre-reduces to its
    own 20 smallest, so only ≤ 20 × #batches candidate rows leave the
    scan — no global sort, no random_shuffle pass)."""
    import hashlib

    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "lang"])

    def add_pri(t: pa.Table) -> pa.Table:
        pri = [hashlib.md5(str(v).encode()).hexdigest()
               for v in t.column("doc_id").to_pylist()]
        return t.append_column("pri", pa.array(pri, pa.string()))

    return R.bottom_k_by(
        ds.map_batches(add_pri, batch_format="pyarrow"), ["pri"], 20)


def _q_stratified_priority_sample(sf_dir: str):
    """Unbiased k-per-group cap (at most k hash-random docs per lang) —
    the per-domain quota rule with seeded-hash selection instead of
    stratified_first_k's order bias."""
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "lang"])
    return R.stratified_priority_sample(ds, "lang", k=5, id_col="doc_id",
                                        seed="otr")


def _q_approx_top_tokens(sf_dir: str):
    """Mergeable truncated-count heavy hitters over the token stream
    (golden-fixture oracle — at this vocab/width the sketch never
    truncates, max_underestimate = 0, so counts are exact and
    parallelism-independent; the error bound is asserted in
    tests/test_sketch.py).  At web scale the
    shuffle carries ≤ partial_width rows per 64k-token batch regardless
    of vocabulary size."""
    from open_thoughts_ray.ops.consensus import _partial_token_counts
    from open_thoughts_ray.ops.sketch import approx_top_k

    ds = _rp(sf_dir, "documents", ["text"])
    tokens = ds.map_batches(
        _partial_token_counts, batch_format="pyarrow",
        fn_kwargs={"text_col": "text"},
    )
    # the (token, c) partial stream feeds the sketch as WEIGHTED items,
    # so reported counts are true corpus frequencies (lower-bounded)
    items, bound = approx_top_k(tokens, "token", k=10, partial_width=256,
                                weight_col="c")
    return pa.table({
        "token": pa.array([t for t, _ in items], pa.string()),
        "appearances": pa.array([c for _, c in items], pa.int64()),
        "max_underestimate": pa.array([bound] * len(items), pa.int64()),
    })


def _q_top_tokens(sf_dir: str):
    """Exact heavy hitters: tokens with corpus count ≥ 100 (the
    wordcount shape — per-batch partial counts pre-combine before the
    vocabulary-keyed shuffle; HAVING avoids LIMIT tie ambiguity)."""
    from ray.data.aggregate import Sum

    from open_thoughts_ray.ops.consensus import _partial_token_counts

    ds = _rp(sf_dir, "documents", ["text"])
    tot = ds.map_batches(
        _partial_token_counts, batch_format="pyarrow",
        fn_kwargs={"text_col": "text"},
    ).groupby("token").aggregate(Sum("c", alias_name="n"))
    return tot.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"), 100)),
        batch_format="pyarrow",
    )


def _q_distinct_bigram_ratio(sf_dir: str):
    """Corpus diversity: #distinct word-bigrams / #bigrams, fully
    distributed (nothing vocabulary-sized on the driver)."""
    import math

    from open_thoughts_ray.ops.consensus import distinct_ngram_ratio

    ds = _rp(sf_dir, "documents", ["text"])
    val = distinct_ngram_ratio(ds, n=2)
    q = math.floor(val * 1_000_000) / 1_000_000
    return pa.table({"ratio": pa.array([q], pa.float64())})


def _q_ngram_jaccard_dedup(sf_dir: str):
    """EXACT word-3-gram Jaccard dedup, sequential first-seen semantics
    (drop b iff some numerically-smaller doc has Jaccard ≥ 0.8) — the
    SQL-checkable member of the LSH dedup family (VERDICT r2 #1): shares
    the banded-shuffle + pair-verify machinery with minhash/fuzzy but
    candidates come from recall-1 gram buckets, so DuckDB's NOT EXISTS
    reproduces the survivor set bit-for-bit."""
    from open_thoughts_ray.ops.dedup_text import ngram_jaccard_dedup

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_dedup(ds, threshold=0.8).select_columns(["doc_id"])


def _q_levenshtein_dedup(sf_dir: str):
    """EXACT Levenshtein dedup (drop b iff some numerically-smaller doc
    is within 5 edits) via PassJoin segment candidates (recall 1) +
    distributed banded-DP verification — the SQL-checkable member of
    the edit-distance family: DuckDB's levenshtein() NOT EXISTS
    reproduces the survivor set bit-for-bit."""
    from open_thoughts_ray.ops.editdist import levenshtein_dedup

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return levenshtein_dedup(ds, max_dist=5).select_columns(["doc_id"])


def _q_containment_dedup(sf_dir: str):
    """Substring-containment dedup (drop docs appearing verbatim inside
    a longer doc; equal texts keep the smallest id) via recall-1
    min-gram buckets + distributed substring verification — DuckDB's
    contains() NOT EXISTS reproduces the survivor set bit-for-bit."""
    from open_thoughts_ray.ops.containment import containment_dedup

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return containment_dedup(ds).select_columns(["doc_id"])


def _q_llm_judge(sf_dir: str):
    """JudgeMap (judge_map.py:30-60 last-word yes/no protocol) with the
    md5 mock — SQL-expressible like the other LLM queries."""
    from open_thoughts_ray.llm import completions

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    out = completions(
        ds, "judge",
        {"input_instruction_column": "text",
         "input_golden_answer_column": "lang",
         "input_attempt_answer_column": "source"},
        concurrency=4, batch_size=512,
    )
    return out.select_columns(["doc_id", "model_judgement",
                               "model_judgement_full"])


def _q_llm_critic(sf_dir: str):
    """CriticMap (critic_map.py:16-60): numbered candidates in the
    prompt, free-text critique out.  Candidates are built from existing
    string columns so the prompt is SQL-reproducible."""
    from open_thoughts_ray.llm import completions

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def add_cands(t: pa.Table) -> pa.Table:
        src = t.column("source").to_pylist()
        lng = t.column("lang").to_pylist()
        return t.append_column(
            "cands", pa.array([[s, l] for s, l in zip(src, lng)],
                              pa.list_(pa.string())))

    out = completions(
        ds.map_batches(add_cands, batch_format="pyarrow"), "critic",
        {"query_column": "text", "responses_column": "cands",
         "output_column": "critique"},
        concurrency=4, batch_size=512,
    )
    return out.select_columns(["doc_id", "critique"])


def _q_llm_fuse(sf_dir: str):
    """FuserMap (fuser_map.py:23-90): fuse the top-ranked candidates.
    The ranking column is a FIXED [2, 1] permutation so the prompt —
    and therefore the md5 mock response — is SQL-reproducible (the
    ranker→fuser chain with the seeded mock ranker is pytest-only)."""
    from open_thoughts_ray.llm import completions

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def add_cols(t: pa.Table) -> pa.Table:
        src = t.column("source").to_pylist()
        lng = t.column("lang").to_pylist()
        t = t.append_column(
            "cands", pa.array([[s, l] for s, l in zip(src, lng)],
                              pa.list_(pa.string())))
        return t.append_column(
            "ranking", pa.array([[2, 1]] * t.num_rows, pa.list_(pa.int64())))

    out = completions(
        ds.map_batches(add_cols, batch_format="pyarrow"), "fuser",
        {"query_column": "text", "responses_column": "cands",
         "ranking_column": "ranking", "output_column": "fused"},
        concurrency=4, batch_size=512,
    )
    return out.select_columns(["doc_id", "fused"])


def _q_llm_generate(sf_dir: str):
    """GeneratorMap (generator_map.py:4-26): structured list response
    kept as ONE row — joined to a comma string here so the hash compare
    runs on plain columns."""
    from open_thoughts_ray.llm import completions
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    ds = R.sample_by_hash(ds, "doc_id", keep_every=25, residue=1)
    out = completions(
        ds, "generator",
        {"user_message": "Ideas: {{text}}", "output_column": "ideas",
         "num_items": 3},
        concurrency=2, batch_size=512,
    )

    def join_list(t: pa.Table) -> pa.Table:
        joined = [",".join(v) for v in t.column("ideas").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "ideas": pa.array(joined, pa.string())})

    return out.map_batches(join_list, batch_format="pyarrow")


def _q_llm_test_cases(sf_dir: str):
    """TestCaseMap (test_case_map.py:1-70): parallel test_inputs /
    test_outputs lists, flattened to one row per case for the gate."""
    from open_thoughts_ray.llm import completions
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    ds = R.sample_by_hash(ds, "doc_id", keep_every=25, residue=2)
    out = completions(
        ds, "test_case",
        {"input_prompt_column": "text", "num_cases": 2},
        concurrency=2, batch_size=512,
    )

    def explode(t: pa.Table) -> pa.Table:
        ids, cs, tis, tos = [], [], [], []
        for d, ins, outs in zip(t.column("doc_id").to_pylist(),
                                t.column("test_inputs").to_pylist(),
                                t.column("test_outputs").to_pylist()):
            for i, (a, b) in enumerate(zip(ins, outs)):
                ids.append(d)
                cs.append(i)
                tis.append(a)
                tos.append(b)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "case_idx": pa.array(cs, pa.int64()),
                         "test_input": pa.array(tis, pa.string()),
                         "test_output": pa.array(tos, pa.string())})

    return out.map_batches(explode, batch_format="pyarrow")


def _q_llm_alpaca(sf_dir: str):
    """AlpacaMap (alpaca_map.py:19-109): numbered-block self-instruct
    parse with quality heuristics, fanning each completion into
    num_generated instruction rows."""
    from open_thoughts_ray.llm import completions
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    ds = R.sample_by_hash(ds, "doc_id", keep_every=25, residue=3)
    out = completions(
        ds, "alpaca",
        {"alpaca_prompt_column": "text", "num_seed_instructions": 3,
         "num_generated": 2},
        concurrency=2, batch_size=512,
    )
    return out.select_columns(["doc_id", "instruction", "instr_input",
                               "output"])


def _q_llm_unnatural(sf_dir: str):
    """UnnaturalInstructionsMap (unnatural_instructions_map.py:16-57):
    structured {instruction, input, constraints} appended per row."""
    from open_thoughts_ray.llm import completions
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    ds = R.sample_by_hash(ds, "doc_id", keep_every=25, residue=4)
    out = completions(
        ds, "unnatural_instructions",
        {"user_message": "Create a task from: {{text}}"},
        concurrency=2, batch_size=512,
    )
    return out.select_columns(["doc_id", "instruction", "instr_input",
                               "constraints"])


def _q_llm_seed_task(sf_dir: str):
    """AlpacaSeedTaskMap (alpaca_seed_task_map.py:14-44): each seed row
    fans into its generated variant PLUS the original — 2× rows out."""
    from open_thoughts_ray.llm import completions
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "text", "lang"])
    ds = R.sample_by_hash(ds, "doc_id", keep_every=25, residue=5)

    def seed_cols(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "instruction": t.column("text"),
            "input": pa.array([""] * t.num_rows, pa.string()),
            "output": t.column("lang"),
        })

    out = completions(
        ds.map_batches(seed_cols, batch_format="pyarrow"),
        "alpaca_seed_task",
        {"user_message": "Vary: {{instruction}}"},
        concurrency=2, batch_size=512,
    )
    return out.select_columns(["doc_id", "instruction", "input", "output"])


def _q_llm_open_gpt(sf_dir: str):
    """OpenGPTMap (open_gpt_map.py:17-65): structured task-list response
    fanned into one row per {task, instruction, input, output} item."""
    from open_thoughts_ray.llm import completions
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    ds = R.sample_by_hash(ds, "doc_id", keep_every=25, residue=6)
    out = completions(
        ds, "open_gpt",
        {"user_message": "Make tasks from: {{text}}", "num_tasks": 2},
        concurrency=2, batch_size=512,
    )
    return out.select_columns(["doc_id", "task", "instruction", "input",
                               "output"])


def _q_llm_difficulty(sf_dir: str):
    """DifficultyMap (SkyT1/sky_t1_math_difficulty.py:52-100 shape):
    rubric-graded int difficulty + reasoning per row."""
    from open_thoughts_ray.llm import completions
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    ds = R.sample_by_hash(ds, "doc_id", keep_every=25, residue=7)
    out = completions(
        ds, "difficulty",
        {"problem_column": "text", "criteria": "std"},
        concurrency=2, batch_size=512,
    )
    return out.select_columns(["doc_id", "difficulty"])


def _q_llm_reasoner(sf_dir: str):
    """ReasonerMap (DeepSeekR1/deepseek_reasoner.py:21-50 shape):
    reasoning + solution column pair per row."""
    from open_thoughts_ray.llm import completions
    from open_thoughts_ray.ops import relational as R

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    ds = R.sample_by_hash(ds, "doc_id", keep_every=25, residue=8)
    out = completions(
        ds, "reasoner", {"input_problem_column": "text"},
        concurrency=2, batch_size=512,
    )
    return out.select_columns(["doc_id", "reasoning", "solution"])


def _q_bpe_token_count(sf_dir: str):
    """BPE-ish regex token counting (compiled once per process; the
    pattern is RE2-compatible so DuckDB regexp_extract_all reproduces
    it exactly)."""
    from open_thoughts_ray.ops.textstats import bpe_token_count_batch

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(bpe_token_count_batch,
                          batch_format="pyarrow").select_columns(
        ["doc_id", "n_bpe_tokens"])


def _q_json_source(sf_dir: str):
    """JSON source wrapper (json_source_operator.py:41-216 semantics:
    file/dir read + projection + truncate).  A deterministic JSONL.gz
    derived from the documents table is written once, read back through
    the wrapper, projected and truncated."""
    import gzip
    import hashlib

    import duckdb

    from open_thoughts_ray.io.json_source import read_json_source

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"/tmp/otr_json_src_{tag}.jsonl.gz"
    if not os.path.exists(path):
        df = duckdb.sql(
            "SELECT doc_id, text, lang, source FROM "
            f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}') "
            "ORDER BY doc_id"
        ).df()
        tmp = path + ".tmp"
        with gzip.open(tmp, "wt") as f:
            df.to_json(f, orient="records", lines=True)
        os.replace(tmp, path)
    ds = read_json_source(path, columns=["doc_id", "lang"], limit=200)
    return ds


def _q_resilient_shard_source(sf_dir: str):
    """Resilient sharded source (dclm_refinedweb_source_operator.py
    104-188 semantics: shard fan-out + bounded transient-error backoff
    inside each read task).  The documents table is split into 4
    deterministic jsonl.gz shards once; every shard read FAILS its
    first open attempt via the injected fault hook and must recover
    through the backoff loop — the gate hash proves the recovered read
    is lossless."""
    import gzip
    import hashlib

    import duckdb

    from open_thoughts_ray.io.json_source import read_sharded_jsonl_resilient

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    shard_dir = f"/tmp/otr_shard_src_{tag}"
    done = os.path.join(shard_dir, "_done")
    if not os.path.exists(done):
        os.makedirs(shard_dir, exist_ok=True)
        df = duckdb.sql(
            "SELECT doc_id, text, lang FROM "
            f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}') "
            "ORDER BY doc_id"
        ).df()
        for s in range(4):
            part = df[df.doc_id % 4 == s]
            tmp = os.path.join(shard_dir, f"shard-{s}.jsonl.gz.tmp")
            with gzip.open(tmp, "wt") as f:
                part.to_json(f, orient="records", lines=True)
            os.replace(tmp, os.path.join(shard_dir, f"shard-{s}.jsonl.gz"))
        with open(done, "w") as f:
            f.write("ok")

    def fail_first_attempt(path, attempt):
        if attempt == 0:
            raise OSError(f"SlowDown (simulated) {path}")

    return read_sharded_jsonl_resilient(
        shard_dir, columns=["doc_id", "lang"], max_retries=3,
        backoff_base_s=0.001, _fault_hook=fail_first_attempt)


def _minhash_oracle(k: int = 64, bands: int = 16, shingle_n: int = 3,
                    threshold: float = 0.7,
                    docs_sql: str = "SELECT doc_id, text FROM documents"
                    ) -> str:
    """DuckDB mirror of _q_minhash_dedup (hasher="md5", earlier
    semantics): recompute every doc's k-wide minhash signature — md5
    3-gram hashes rolled with the _GRAM_C multipliers mod 2^61−1, then
    the (a·x+b) mod 2^61−1 family (constants inlined from the engine's
    seeded _hash_family) — find candidates by exact band equality
    (engine band keys are hashes OF the band slice, equal iff the slice
    is equal), verify signature agreement ≥ threshold, and drop every
    doc with a verified edge to a smaller doc_id."""
    from open_thoughts_ray.ops.dedup_text import _hash_family

    a, b = _hash_family(k)
    fam_rows = ", ".join(f"({j}, {int(a[j])}, {int(b[j])})"
                         for j in range(k))
    M = 2305843009213693951  # 2^61 - 1
    r = k // bands
    min_agree = threshold * k
    return f"""
        WITH fam(j, fa, fb) AS (VALUES {fam_rows}),
        toks AS (
          SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
          FROM ({docs_sql}) AS _docs_src
        ),
        grams AS (
          SELECT doc_id, len(t) AS ntok,
            CASE WHEN len(t) = 0 THEN [0::UBIGINT]
                 WHEN len(t) < {shingle_n} THEN
                   [CAST(concat('0x', substr(md5(array_to_string(t, ' ')), 1, 8))
                         AS UBIGINT)]
                 ELSE list_transform(generate_series(1, len(t) - {shingle_n - 1}), i ->
                    ((CAST(concat('0x', substr(md5(t[i]), 1, 8)) AS UBIGINT) * 268435399
                    + CAST(concat('0x', substr(md5(t[i+1]), 1, 8)) AS UBIGINT) * 268435367
                    + CAST(concat('0x', substr(md5(t[i+2]), 1, 8)) AS UBIGINT) * 268435361)
                    % {M}) & 4294967295)
            END AS gs
          FROM toks
        ),
        gx AS (SELECT doc_id, ntok, unnest(gs) AS g FROM grams),
        sig AS (
          SELECT doc_id, j,
                 CASE WHEN max(ntok) = 0 THEN 0::UBIGINT
                      ELSE MIN((fa::UBIGINT * g + fb::UBIGINT) % {M}) END AS v
          FROM gx CROSS JOIN fam GROUP BY doc_id, j
        ),
        bandt AS (
          SELECT doc_id, j // {r} AS bb, list(v ORDER BY j) AS bv
          FROM sig GROUP BY doc_id, j // {r}
        ),
        cand AS (
          SELECT DISTINCT l.doc_id AS a, rr.doc_id AS b
          FROM bandt l JOIN bandt rr
            ON l.bb = rr.bb AND l.bv = rr.bv AND l.doc_id < rr.doc_id
        ),
        ver AS (
          SELECT c.a, c.b
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.a
          JOIN sig sb ON sb.doc_id = c.b AND sb.j = sa.j
          GROUP BY c.a, c.b
          HAVING SUM(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) >= {min_agree}
        )
        SELECT d.doc_id FROM ({docs_sql}) AS d
        WHERE NOT EXISTS (SELECT 1 FROM ver v WHERE v.b = d.doc_id)
    """


def _bm25_oracle() -> str:
    """DuckDB BM25 mirror of _q_bm25_topk, generated from the same
    query dict.  Uses the engine's integer-exact rational formulation
    (ops/retrieval.py): numerator 22·tf·sum_dl and denominator
    10·tf·sum_dl + 3·sum_dl + 9·dl·N are exact BIGINTs, idf's argument
    is the exact rational (2N+2)/(2df+1), and the float expression is
    pinned to ``((1e6·ln)·Nu)/D`` — one libm ln, two multiplies, one
    divide, zero float additions, so scalar SQL eval and vectorized
    numpy agree bit-for-bit across DuckDB versions."""
    vals = ", ".join(f"({qid}, '{t}')"
                     for qid, ts in sorted(_BM25_QUERIES.items()) for t in ts)
    return f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ),
        -- engine convention: NULL/'' documents have ZERO tokens (Python
        -- ``t.split(' ') if t else []``), unlike string_split('') = ['']
        dl AS (SELECT doc_id,
                      CASE WHEN text IS NULL OR text = '' THEN 0
                           ELSE len(string_split(text, ' ')) END AS dl
               FROM documents),
        c AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        terms(query_id, tok) AS (VALUES {vals}),
        uterm AS (SELECT DISTINCT tok FROM terms),
        df AS (SELECT tok, count(DISTINCT doc_id) AS df
               FROM toks JOIN uterm USING (tok) GROUP BY tok),
        tf AS (SELECT doc_id, tok, count(*) AS tf
               FROM toks JOIN uterm USING (tok) GROUP BY doc_id, tok),
        scored AS (
            SELECT t.query_id, tf.doc_id,
                   SUM(CAST(floor(
                     ((1000000.0 * ln(CAST(2 * c.n_docs + 2 AS DOUBLE)
                                      / CAST(2 * df.df + 1 AS DOUBLE)))
                      * CAST(22 * tf.tf * c.sum_dl AS DOUBLE))
                     / CAST(10 * tf.tf * c.sum_dl + 3 * c.sum_dl
                            + 9 * dl.dl * c.n_docs AS DOUBLE)
                   ) AS BIGINT)) AS score_micro
            FROM tf
            JOIN terms t USING (tok)
            JOIN df USING (tok)
            JOIN dl USING (doc_id)
            CROSS JOIN c
            GROUP BY t.query_id, tf.doc_id
        ),
        ranked AS (
            SELECT query_id, doc_id, score_micro,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score_micro DESC, doc_id ASC)
                       AS rank
            FROM scored
        )
        SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_micro,
               CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= 10
    """


def _rrf_oracle() -> str:
    """DuckDB mirror of _q_rrf_hybrid_topk: the BM25 oracle nests as a
    CTE, a raw-term-count ranking joins the same VALUES term list, and
    both contribute floor(1e9/(60+rank)) exact int64 units to the fused
    sum — identical tie-breaks (score desc, doc_id asc) at every level."""
    vals = ", ".join(f"({qid}, '{t}')"
                     for qid, ts in sorted(_BM25_QUERIES.items()) for t in ts)
    return f"""
        WITH bm AS ({_bm25_oracle()}),
        toks2 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
        terms2(query_id, tok) AS (VALUES {vals}),
        tsc AS (SELECT t.query_id, x.doc_id, count(*) AS tcount
                FROM toks2 x JOIN terms2 t USING (tok)
                GROUP BY t.query_id, x.doc_id),
        trk AS (SELECT query_id, doc_id, tcount,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY tcount DESC, doc_id) AS rank
                FROM tsc),
        u AS (SELECT query_id, doc_id,
                     CAST(floor(1000000000.0/(60+rank)) AS BIGINT) AS c
              FROM bm
              UNION ALL
              SELECT query_id, doc_id,
                     CAST(floor(1000000000.0/(60+rank)) AS BIGINT)
              FROM trk WHERE rank <= 10),
        f AS (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_micro
              FROM u GROUP BY query_id, doc_id),
        fr AS (SELECT query_id, doc_id, rrf_micro,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY rrf_micro DESC, doc_id) AS rank
               FROM f)
        SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rrf_micro,
               CAST(rank AS BIGINT) AS rank
        FROM fr WHERE rank <= 10
    """


def _rerank_oracle() -> str:
    """DuckDB mirror of _q_rerank_topk: the full hybrid-RRF oracle nests
    as the candidate CTE; token-set F1 = (2·|q∩d|)/(|q|+|d|) over
    distinct tokens, identical tie-breaks."""
    vals = ", ".join(f"({qid}, '{t}')"
                     for qid, ts in sorted(_BM25_QUERIES.items()) for t in ts)
    return f"""
        WITH hybrid AS ({_rrf_oracle()}),
        cand AS (SELECT query_id, doc_id FROM hybrid),
        toks3 AS (SELECT d.doc_id, unnest(string_split(d.text, ' ')) AS tok
                  FROM documents d
                  JOIN (SELECT DISTINCT doc_id FROM cand) c
                    ON d.doc_id = c.doc_id),
        terms3(query_id, tok) AS (VALUES {vals}),
        qn AS (SELECT query_id, CAST(count(DISTINCT tok) AS BIGINT) AS q
               FROM terms3 GROUP BY query_id),
        dn AS (SELECT doc_id, CAST(count(DISTINCT tok) AS BIGINT) AS d
               FROM toks3 GROUP BY doc_id),
        ov AS (SELECT c.query_id, c.doc_id,
                      CAST(count(DISTINCT x.tok) AS BIGINT) AS o
               FROM cand c
               JOIN toks3 x ON x.doc_id = c.doc_id
               JOIN terms3 t ON t.query_id = c.query_id AND t.tok = x.tok
               GROUP BY c.query_id, c.doc_id),
        s AS (SELECT c.query_id, c.doc_id,
                     (2.0 * coalesce(ov.o, 0)) / (qn.q + dn.d) AS f1
              FROM cand c
              JOIN qn USING (query_id) JOIN dn USING (doc_id)
              LEFT JOIN ov ON ov.query_id = c.query_id
                          AND ov.doc_id = c.doc_id),
        r AS (SELECT query_id, doc_id, f1,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY f1 DESC, doc_id) AS rank
              FROM s)
        SELECT query_id, doc_id, f1, CAST(rank AS BIGINT) AS rank
        FROM r WHERE rank <= 5
    """


def _retrieval_eval_oracle() -> str:
    """DuckDB mirror of _q_retrieval_eval: recall@10 + MRR of the
    term-count ranking against the BM25 oracle as gold."""
    vals = ", ".join(f"({qid}, '{t}')"
                     for qid, ts in sorted(_BM25_QUERIES.items()) for t in ts)
    return f"""
        WITH bm AS ({_bm25_oracle()}),
        toks4 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
        terms4(query_id, tok) AS (VALUES {vals}),
        tsc AS (SELECT t.query_id, x.doc_id, count(*) AS tcount
                FROM toks4 x JOIN terms4 t USING (tok)
                GROUP BY t.query_id, x.doc_id),
        trk AS (SELECT query_id, doc_id,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY tcount DESC, doc_id) AS rank
                FROM tsc),
        sys AS (SELECT query_id, doc_id, rank FROM trk WHERE rank <= 10),
        gold_n AS (SELECT query_id, CAST(count(*) AS BIGINT) AS gn
                   FROM bm GROUP BY query_id),
        hits AS (SELECT s.query_id, s.rank FROM sys s
                 JOIN bm g ON g.query_id = s.query_id
                          AND g.doc_id = s.doc_id),
        ha AS (SELECT query_id, CAST(count(*) AS BIGINT) AS hc,
                      min(rank) AS fr
               FROM hits GROUP BY query_id),
        per AS (SELECT g.query_id,
                       CAST(coalesce(ha.hc, 0) AS DOUBLE)
                         / CAST(g.gn AS DOUBLE) AS rec,
                       CASE WHEN ha.fr IS NULL THEN 0.0
                            ELSE 1.0/ha.fr END AS rr
                FROM gold_n g LEFT JOIN ha USING (query_id)),
        n AS (SELECT CAST(count(*) AS BIGINT) AS nq FROM gold_n)
        SELECT n.nq AS n_queries,
               floor((sum(rec)/n.nq) * 1000000 + 0.5)/1000000
                 AS recall_at_k,
               floor((sum(rr)/n.nq) * 1000000 + 0.5)/1000000 AS mrr
        FROM per, n GROUP BY n.nq
    """


def _scrub_oracle() -> str:
    """DuckDB equivalent of _q_scrub_documents, derived from the live
    SCRUB_RULES / TOXIC_LEXICON so the oracle cannot drift from the
    engine's rule list (same augmentation expression, same ordered
    regexp_replace chain; Python (?i) becomes RE2's 'gi' flags)."""
    from open_thoughts_ray.fixtures.textgen import TOXIC_LEXICON
    from open_thoughts_ray.ops.scrub import SCRUB_RULES

    expr = "t"
    for _name, pat, repl in SCRUB_RULES:
        flags = "g"
        if pat.startswith("(?i)"):
            pat, flags = pat[4:], "gi"
        pat = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', '{flags}')"
    lex = ", ".join(f"'{w}'" for w in TOXIC_LEXICON)
    return f"""
        WITH aug AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or https://ex.com/p/'
                        || CAST(doc_id AS VARCHAR)
                        || ' ssn 123-45-6789 call (555) 123-4567 you '
                        || ([{lex}])[CAST(doc_id % {len(TOXIC_LEXICON)}
                                          AS INT) + 1] AS t
            FROM documents)
        SELECT doc_id, {expr} AS scrubbed FROM aug
    """


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_base()
    # quality-rule funnel: cumulative pass counts over the Gopher
    # thresholds — the oracle NESTS the per-doc gopher oracle so the two
    # queries can never drift apart
    d["rule_funnel_documents"] = f'''
        WITH g AS ({d["gopher_repetition_documents"]})
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN dup_line_frac <= 0.30
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass1,
               CAST(sum(CASE WHEN dup_line_frac <= 0.30
                              AND top_bigram_frac <= 0.20
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass2,
               CAST(sum(CASE WHEN dup_line_frac <= 0.30
                              AND top_bigram_frac <= 0.20
                              AND dup_trigram_frac <= 0.30
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass3
        FROM g
    '''
    # flagship golden-decisions oracle (VERDICT r4 #4): the 2000-row
    # entry table is deterministic (fixtures/images seed=42) and every
    # flagship output column is row-local or bit-reproducible, verified
    # identical at 8 and 32 CPUs — so the frozen fixture is an exact
    # replay.  Regenerate/audit with scripts/gen_golden_flagship.py
    # (--check recomputes and diffs).
    _golden = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "open_thoughts_ray", "fixtures",
                           "golden_flagship.parquet")
    d["flagship_quality_filter"] = (
        f"SELECT * FROM read_parquet('{_golden}')")
    # Generalized golden-fixture oracles (scripts/gen_golden.py): each
    # query below was run in fresh sessions at num_cpus=8 AND 32 on the
    # driver's sf0.01 tables and produced bit-identical canonicalized
    # output, so the frozen fixture is an exact replay (regression
    # oracle, not an independent derivation — semantic evidence is in
    # pytest: serial parity for k-center/alignment, LSH-recall + exact
    # Indel verify for fuzzy dedup, rank-1 self-retrieval for image
    # search, BFS structure/budget for tree_search, ≥95% rule
    # reproduction for distill, sketch error bound for approx_top —
    # whose max_underestimate is 0 at this scale, i.e. counts exact,
    # verified identical across 3 repeat runs at 32 CPUs).
    # ann_topk_ivf / semantic_dedup joined the list late r5 after their
    # k-means paths were made parallelism-deterministic: exact int64
    # fixed-point assignments/sums/cosines (ops/cluster.py Q_EXACT),
    # content-sorted quantizer samples, id-tiebroken per-batch top-k —
    # block-count-invariance regression tests in tests/test_cluster.py
    # and tests/test_similarity_embed.py.
    # Regenerate/audit: python scripts/gen_golden.py [--check].
    _gg = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "open_thoughts_ray", "fixtures", "golden_gate")
    for _name in ("fuzzy_dedup_documents", "kcenter_select_embeddings",
                  "image_caption_alignment", "image_search_corpus",
                  "approx_top_tokens_documents",
                  "distill_quality_documents", "tree_search_documents",
                  "ann_topk_ivf_embeddings", "semantic_dedup_embeddings",
                  "arpa_ppl_documents", "video_scene_cuts_documents"):
        _p = os.path.join(_gg, f"{_name}.parquet")
        if os.path.exists(_p):
            d[_name] = f"SELECT * FROM read_parquet('{_p}')"
    # Bloom-indexed exact delta ingest ≡ "fingerprint unseen AND first
    # occurrence (min doc_id) within the delta" — md5-64 fingerprints
    # are identical on both sides, so this hash-checks all three tiers
    d["delta_exact_indexed_documents"] = """
        WITH seen AS (
            SELECT DISTINCT substr(md5(text), 1, 16) AS h
            FROM documents WHERE source IN ('src0', 'src1')
        ),
        delta AS (
            SELECT doc_id, substr(md5(text), 1, 16) AS h
            FROM documents WHERE source NOT IN ('src0', 'src1')
        )
        SELECT d.doc_id
        FROM delta d
        WHERE d.h NOT IN (SELECT h FROM seen)
          AND d.doc_id = (SELECT min(d2.doc_id) FROM delta d2
                          WHERE d2.h = d.h)
    """
    # zone-map pruned read ≡ plain WHERE over the original parquet
    # (the Ray side proves ≥1 fragment was manifest-pruned, then
    # pushes the residual filter into the scan)
    d["zonemap_pruned_read_documents"] = """
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE doc_id >= (SELECT min(doc_id)
                         + (max(doc_id) - min(doc_id)) // 4
                         FROM documents)
          AND doc_id <  (SELECT min(doc_id)
                         + (max(doc_id) - min(doc_id)) // 2
                         FROM documents)
          AND lang = 'en'
    """
    # code-judge verdicts are fully determined by doc_id % 4 (the
    # solutions are synthesized from it); the Ray side REALLY executes
    # the code, the oracle replays the expected verdict algebra
    d["code_judge_documents"] = """
        SELECT doc_id,
               (doc_id % 4 = 0 OR doc_id % 4 = 2) AS passed,
               CAST(CASE WHEN doc_id % 4 IN (0, 2) THEN 1 ELSE 0 END
                    AS BIGINT) AS n_passed,
               CAST(1 AS BIGINT) AS n_tests,
               CASE doc_id % 4
                    WHEN 0 THEN 'passed'
                    WHEN 1 THEN 'wrong_answer'
                    WHEN 2 THEN 'passed'
                    ELSE 'runtime_error' END AS verdict
        FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 48)
    """
    return d


def _oracle_sql_base() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
                   CAST(SUM(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                   COUNT(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "filter_documents": """
            SELECT doc_id, source, n_chars FROM documents
            WHERE lang = 'en' AND n_chars BETWEEN 100 AND 400
        """,
        "dedup_lines_within_documents": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            l AS (SELECT doc_id, i, array_to_string(
                         list_slice(toks, (i-1)*6+1, (i-1)*6+6), ' ') AS line
                  FROM t, UNNEST(generate_series(
                         1, CAST(ceil(len(toks)/6.0) AS BIGINT))) AS u(i)),
            k AS (SELECT doc_id, i, line,
                         row_number() OVER (PARTITION BY doc_id, line
                                            ORDER BY i) AS rn
                  FROM l)
            SELECT doc_id, string_agg(line, ' ' ORDER BY i) AS dedup_text
            FROM k WHERE rn = 1 GROUP BY doc_id
        """,
        "curriculum_interleave_documents": """
            SELECT doc_id, source,
                   CAST(row_number() OVER (PARTITION BY source
                                           ORDER BY doc_id) AS DOUBLE)
                   / (CASE WHEN source IN ('src0', 'src1')
                           THEN 2.0 ELSE 1.0 END) AS mix_key
            FROM documents
        """,
        "lang_consistency_documents": """
            WITH m AS (SELECT source, lang,
                              row_number() OVER (PARTITION BY source
                                ORDER BY count(*) DESC, lang) AS rn
                       FROM documents GROUP BY source, lang)
            SELECT d.doc_id, d.source, d.lang
            FROM documents d
            JOIN m ON m.source = d.source AND m.lang = d.lang AND m.rn = 1
        """,
        "source_scorecard_documents": """
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) AS mean_chars,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
            FROM documents GROUP BY source
        """,
        "snapshot_diff_documents": """
            WITH old AS (SELECT doc_id, md5(text) AS fp FROM documents
                         WHERE doc_id % 10 < 9),
            new AS (SELECT doc_id,
                           md5(CASE WHEN doc_id % 7 = 0
                                    THEN text || ' ' || '[edited]'
                                    ELSE text END) AS fp
                    FROM documents WHERE doc_id % 10 > 0),
            j AS (SELECT o.fp AS fo, n.fp AS fn
                  FROM old o FULL OUTER JOIN new n USING (doc_id))
            SELECT CAST(sum(CASE WHEN fo IS NULL AND fn IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
                   CAST(sum(CASE WHEN fo IS NOT NULL AND fn IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                   CAST(sum(CASE WHEN fo IS NOT NULL AND fn IS NOT NULL
                                  AND fo != fn
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
                   CAST(sum(CASE WHEN fo = fn THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_unchanged
            FROM j
        """,
        "math_verify_documents": """
            SELECT doc_id,
                   CASE doc_id % 5
                     WHEN 0 THEN '\\frac{' || CAST(doc_id AS VARCHAR)
                                 || '}{2}'
                     WHEN 1 THEN CAST(doc_id AS VARCHAR)
                     WHEN 2 THEN CAST(doc_id AS VARCHAR) || '.25'
                     WHEN 3 THEN '50%'
                     ELSE '1,234' END AS extracted_answer,
                   CASE doc_id % 5
                     WHEN 0 THEN printf('%.1f', doc_id / 2.0)
                     WHEN 1 THEN CAST(doc_id + 1 AS VARCHAR)
                     WHEN 2 THEN CAST(doc_id AS VARCHAR) || '.25'
                     WHEN 3 THEN '0.5'
                     ELSE '1234' END AS extracted_gold,
                   (doc_id % 5) != 1 AS verifier_label
            FROM documents
        """,
        "normalize_text_documents": """
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(lower(text),
                        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))
                     AS norm_text
            FROM documents
        """,
        "component_sizes_documents": """
            WITH RECURSIVE t AS (SELECT doc_id,
                                        string_split(text, ' ') AS tk
                                 FROM documents),
            g AS (SELECT DISTINCT doc_id, fp FROM (
                    SELECT doc_id, md5(array_to_string(
                             list_slice(tk, 1, 3), ' ')) AS fp FROM t
                    UNION ALL
                    SELECT doc_id, md5(array_to_string(
                             list_slice(tk, greatest(len(tk)-2, 1),
                                        len(tk)), ' ')) AS fp FROM t)),
            e0 AS (SELECT doc_id AS a,
                          lead(doc_id) OVER (PARTITION BY fp
                                             ORDER BY doc_id) AS b
                   FROM g),
            e AS (SELECT a, b FROM e0 WHERE b IS NOT NULL
                  UNION ALL
                  SELECT b, a FROM e0 WHERE b IS NOT NULL),
            reach(src, dst) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a),
            comp AS (SELECT src, min(dst) AS component
                     FROM reach GROUP BY src),
            sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS size
                      FROM comp GROUP BY component)
            SELECT size, CAST(count(*) AS BIGINT) AS n_components
            FROM sizes GROUP BY size
        """,
        "pmi_bigrams_documents": """
            WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
            uni AS (SELECT unnest(tk) AS w FROM t),
            cu AS (SELECT w, CAST(count(*) AS BIGINT) AS c
                   FROM uni GROUP BY w),
            tt AS (SELECT CAST(sum(c) AS BIGINT) AS T FROM cu),
            bg AS (SELECT tk[i] AS w1, tk[i+1] AS w2
                   FROM t, UNNEST(generate_series(1, len(tk)-1)) AS u(i)),
            cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
                   FROM bg GROUP BY w1, w2),
            bb AS (SELECT CAST(sum(n) AS BIGINT) AS B FROM cb),
            s AS (SELECT w1, w2, n AS pair_count,
                         ln((CAST(n AS DOUBLE)/CAST(B AS DOUBLE))
                            / ((CAST(a.c AS DOUBLE)/CAST(T AS DOUBLE))
                               * (CAST(b.c AS DOUBLE)/CAST(T AS DOUBLE))))
                           AS raw
                  FROM cb JOIN cu a ON cb.w1 = a.w
                          JOIN cu b ON cb.w2 = b.w, tt, bb
                  WHERE n >= 5)
            SELECT w1, w2, pair_count,
                   floor(raw*1000000)/1000000 AS pmi
            FROM s ORDER BY raw DESC, w1, w2 LIMIT 20
        """,
        "ks_documents": """
            WITH fa AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS ca
                        FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
            fb AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cb
                   FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
            vals AS (SELECT DISTINCT v FROM
                       (SELECT v FROM fa UNION ALL SELECT v FROM fb)),
            m AS (SELECT vals.v, coalesce(fa.ca, 0) AS ca,
                         coalesce(fb.cb, 0) AS cb
                  FROM vals LEFT JOIN fa USING (v) LEFT JOIN fb USING (v)),
            c AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cca,
                         sum(cb) OVER (ORDER BY v) AS ccb FROM m),
            s AS (SELECT (SELECT CAST(sum(ca) AS BIGINT) FROM m) AS na,
                         (SELECT CAST(sum(cb) AS BIGINT) FROM m) AS nb)
            SELECT floor(max(abs(CAST(cca AS DOUBLE)/CAST(na AS DOUBLE)
                                 - CAST(ccb AS DOUBLE)/CAST(nb AS DOUBLE)))
                   * 1000000) / 1000000 AS ks
            FROM c, s
        """,
        "components_documents": """
            WITH RECURSIVE t AS (SELECT doc_id,
                                        string_split(text, ' ') AS tk
                                 FROM documents),
            g AS (SELECT DISTINCT doc_id, fp FROM (
                    SELECT doc_id, md5(array_to_string(
                             list_slice(tk, 1, 3), ' ')) AS fp FROM t
                    UNION ALL
                    SELECT doc_id, md5(array_to_string(
                             list_slice(tk, greatest(len(tk)-2, 1),
                                        len(tk)), ' ')) AS fp FROM t)),
            e0 AS (SELECT doc_id AS a,
                          lead(doc_id) OVER (PARTITION BY fp
                                             ORDER BY doc_id) AS b
                   FROM g),
            e AS (SELECT a, b FROM e0 WHERE b IS NOT NULL
                  UNION ALL
                  SELECT b, a FROM e0 WHERE b IS NOT NULL),
            reach(src, dst) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a)
            SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS component
            FROM reach GROUP BY src
        """,
        "delta_ingest_documents": """
            WITH f AS (SELECT doc_id,
                              md5(array_to_string(list_slice(
                                string_split(text, ' '), 1, 10), ' ')) AS fp
                       FROM documents)
            SELECT doc_id, fp FROM f
            WHERE doc_id % 4 = 3
              AND fp NOT IN (SELECT fp FROM f WHERE doc_id % 4 < 3)
        """,
        "funnel_events": """
            WITH t1 AS (SELECT user_id, min(ts) AS t FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            t2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t
                   WHERE e.event_type = 'click' GROUP BY e.user_id),
            t3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                   JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t
                   WHERE e.event_type = 'purchase' GROUP BY e.user_id)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM t1) AS n_view,
                   (SELECT CAST(count(*) AS BIGINT) FROM t2) AS n_click,
                   (SELECT CAST(count(*) AS BIGINT) FROM t3) AS n_purchase
        """,
        "profile_documents": """
            WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t
                         FROM documents),
            c AS (SELECT t, CAST(count(*) AS DOUBLE) AS n FROM tok GROUP BY t),
            s AS (SELECT sum(n) AS tot,
                         CAST(count(*) AS BIGINT) AS d FROM c)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
                   (SELECT CAST(count(*) AS BIGINT) FROM tok) AS n_tokens,
                   (SELECT CAST(sum(length(text)) AS BIGINT) FROM documents)
                     AS n_chars,
                   s.d AS distinct_tokens,
                   floor((SELECT -sum((n/tot) * ln(n/tot)) FROM c, s)
                         * 1000000) / 1000000 AS token_entropy
            FROM s
        """,
        "ctfidf_per_source_documents": """
            WITH tok AS (SELECT source, unnest(string_split(text, ' '))
                           AS term FROM documents),
            tf AS (SELECT source, term, CAST(count(*) AS DOUBLE) AS tf
                   FROM tok GROUP BY source, term),
            nc AS (SELECT CAST(count(DISTINCT source) AS DOUBLE) AS n
                   FROM documents),
            dfs AS (SELECT term,
                           CAST(count(DISTINCT source) AS DOUBLE) AS df
                    FROM tok GROUP BY term),
            s AS (SELECT tf.source, tf.term,
                         tf.tf * ln(nc.n / dfs.df) AS raw
                  FROM tf JOIN dfs USING (term), nc),
            r AS (SELECT source, term, raw,
                         row_number() OVER (PARTITION BY source
                           ORDER BY raw DESC, term) AS rn
                  FROM s)
            SELECT source, term, floor(raw*1000000)/1000000 AS score
            FROM r WHERE rn <= 5
        """,
        "psi_events": """
            WITH ha AS (SELECT CAST(least(greatest(
                          floor((value - 0.0) / ((200.0 - 0.0) / 20.0)),
                          0), 19) AS BIGINT) AS b,
                        CAST(count(*) AS BIGINT) AS x
                 FROM events WHERE event_id % 2 = 0 GROUP BY 1),
            hb AS (SELECT CAST(least(greatest(
                          floor((value - 0.0) / ((200.0 - 0.0) / 20.0)),
                          0), 19) AS BIGINT) AS b,
                        CAST(count(*) AS BIGINT) AS y
                 FROM events WHERE event_id % 2 = 1 GROUP BY 1),
            s AS (SELECT (SELECT CAST(sum(x) AS BIGINT) FROM ha) AS na,
                         (SELECT CAST(sum(y) AS BIGINT) FROM hb) AS nb)
            SELECT floor(sum(
                     (CAST(x AS DOUBLE)/CAST(na AS DOUBLE)
                      - CAST(y AS DOUBLE)/CAST(nb AS DOUBLE))
                     * ln((CAST(x AS DOUBLE)/CAST(na AS DOUBLE))
                          / (CAST(y AS DOUBLE)/CAST(nb AS DOUBLE))))
                   * 1000000) / 1000000 AS psi
            FROM ha JOIN hb USING (b), s
        """,
        "zscore_per_type_events": """
            WITH c AS (SELECT event_id, event_type,
                              CAST(floor(value*100 + 0.5) AS BIGINT) AS c
                       FROM events),
            s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(c) AS BIGINT) AS s,
                         CAST(sum(c*c) AS BIGINT) AS ss
                  FROM c GROUP BY event_type),
            m AS (SELECT event_type,
                         CAST(s AS DOUBLE)/CAST(n AS DOUBLE) AS mu,
                         CAST(ss AS DOUBLE)/CAST(n AS DOUBLE)
                           - (CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
                             * (CAST(s AS DOUBLE)/CAST(n AS DOUBLE)) AS var
                  FROM s)
            SELECT c.event_id,
                   CASE WHEN m.var > 0
                        THEN (CAST(c.c AS DOUBLE) - m.mu) / sqrt(m.var)
                        ELSE 0.0 END AS z_value
            FROM c JOIN m USING (event_type)
        """,
        "dau_events": """
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS dau
            FROM events GROUP BY 1
        """,
        "weighted_sample_documents": """
            SELECT doc_id, n_chars FROM documents
            WHERE CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                              1, 8) AS UBIGINT) AS DOUBLE)
                  / 4294967296.0
                  < CAST(n_chars AS DOUBLE) / 1000.0
        """,
        "percent_rank_documents": """
            SELECT doc_id, percent_rank() OVER (ORDER BY n_chars)
                     AS pr_n_chars
            FROM documents
        """,
        "mi_lang_source_documents": """
            WITH c AS (SELECT lang, source,
                              CAST(count(*) AS BIGINT) AS nxy
                       FROM documents GROUP BY lang, source),
            n AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM c),
            a AS (SELECT lang, CAST(sum(nxy) AS BIGINT) AS na
                  FROM c GROUP BY lang),
            b AS (SELECT source, CAST(sum(nxy) AS BIGINT) AS nb
                  FROM c GROUP BY source)
            SELECT floor(sum(
                     (CAST(nxy AS DOUBLE) / CAST(n.n AS DOUBLE))
                     * ln((CAST(nxy AS DOUBLE) * CAST(n.n AS DOUBLE))
                          / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))))
                   * 1000000) / 1000000 AS mi
            FROM c JOIN a USING (lang) JOIN b USING (source), n
        """,
        "robust_scale_events": """
            WITH s AS (SELECT quantile_cont(value, 0.25) AS q1,
                              quantile_cont(value, 0.5) AS med,
                              quantile_cont(value, 0.75) AS q3
                       FROM events)
            SELECT event_id,
                   CASE WHEN s.q3 - s.q1 > 0
                        THEN (value - s.med) / (s.q3 - s.q1)
                        ELSE 0.0 END AS robust_value
            FROM events, s
        """,
        "histogram_events": """
            SELECT CAST(least(greatest(
                     floor((value - 0.0) / ((200.0 - 0.0) / 20.0)), 0), 19)
                   AS BIGINT) AS bucket,
                   count(*) AS n
            FROM events GROUP BY 1
        """,
        "zscore_events": """
            WITH c AS (SELECT event_id,
                              CAST(floor(value*100 + 0.5) AS BIGINT) AS c
                       FROM events),
            s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(c) AS BIGINT) AS s,
                         CAST(sum(c*c) AS BIGINT) AS ss
                  FROM c),
            m AS (SELECT CAST(s AS DOUBLE)/CAST(n AS DOUBLE) AS mu,
                         CAST(ss AS DOUBLE)/CAST(n AS DOUBLE)
                           - (CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
                             * (CAST(s AS DOUBLE)/CAST(n AS DOUBLE)) AS var
                  FROM s)
            SELECT event_id,
                   CASE WHEN m.var > 0
                        THEN (CAST(c.c AS DOUBLE) - m.mu) / sqrt(m.var)
                        ELSE 0.0 END AS z_value
            FROM c, m
        """,
        "minmax_events": """
            WITH s AS (SELECT min(value) AS lo, max(value) AS hi
                       FROM events)
            SELECT event_id,
                   CASE WHEN s.hi - s.lo > 0
                        THEN (value - s.lo) / (s.hi - s.lo)
                        ELSE 0.0 END AS norm_value
            FROM events, s
        """,
        "tfidf_top_terms_documents": """
            WITH n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
            tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                    FROM documents),
            tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
                   FROM tok GROUP BY doc_id, term),
            df AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
                   FROM tok GROUP BY term),
            s AS (SELECT tf.doc_id, tf.term, tf.tf * ln(n.n / df.df) AS raw
                  FROM tf JOIN df USING (term), n),
            r AS (SELECT doc_id, term, raw,
                         row_number() OVER (PARTITION BY doc_id
                           ORDER BY raw DESC, term) AS rn
                  FROM s)
            SELECT doc_id, term, floor(raw*1000000)/1000000 AS score
            FROM r WHERE rn <= 3
        """,
        "bow_dedup_keep_best_documents": """
            WITH f AS (SELECT doc_id, n_chars,
                              md5(array_to_string(
                                list_sort(string_split(text, ' ')), ' '))
                                AS bow_fp
                       FROM documents),
            r AS (SELECT doc_id, n_chars, bow_fp,
                         row_number() OVER (PARTITION BY bow_fp
                           ORDER BY n_chars DESC, doc_id) AS rn
                  FROM f)
            SELECT doc_id, n_chars, bow_fp FROM r WHERE rn = 1
        """,
        "jsd_drift_documents": """
            WITH ta AS (SELECT unnest(string_split(text, ' ')) AS t
                        FROM documents WHERE doc_id % 2 = 0),
            tb AS (SELECT unnest(string_split(text, ' ')) AS t
                   FROM documents WHERE doc_id % 2 = 1),
            ca AS (SELECT t, CAST(count(*) AS DOUBLE) AS a FROM ta GROUP BY t),
            cb AS (SELECT t, CAST(count(*) AS DOUBLE) AS b FROM tb GROUP BY t),
            j AS (SELECT coalesce(ca.a, 0) AS a, coalesce(cb.b, 0) AS b
                  FROM ca FULL OUTER JOIN cb ON ca.t = cb.t),
            s AS (SELECT sum(a) AS A, sum(b) AS B,
                         sum(CASE WHEN a > 0 THEN a*ln(a) ELSE 0 END) AS SA,
                         sum(CASE WHEN b > 0 THEN b*ln(b) ELSE 0 END) AS SB
                  FROM j),
            sc AS (SELECT sum((s.B*j.a + s.A*j.b) * ln(s.B*j.a + s.A*j.b))
                     AS SC FROM j, s)
            SELECT floor((ln(2*s.A*s.B) - sc.SC/(2*s.A*s.B)
                    - 0.5*((ln(s.A) - s.SA/s.A) + (ln(s.B) - s.SB/s.B)))
                   * 1000000) / 1000000 AS jsd
            FROM s, sc
        """,
        "boilerplate_removal_documents": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            l AS (
              SELECT doc_id, i,
                     array_to_string(
                       list_slice(toks, (i-1)*6+1, (i-1)*6+6), ' ') AS line
              FROM t, UNNEST(generate_series(
                       1, CAST(ceil(len(toks)/6.0) AS BIGINT))) AS u(i)
            ),
            f AS (SELECT line FROM (SELECT line,
                                           count(DISTINCT doc_id) AS df
                                    FROM l GROUP BY line) WHERE df >= 2),
            k AS (SELECT doc_id, i, line FROM l
                  WHERE line NOT IN (SELECT line FROM f))
            SELECT d.doc_id,
                   coalesce(string_agg(k.line, ' ' ORDER BY k.i), '')
                     AS clean_text
            FROM documents d LEFT JOIN k ON d.doc_id = k.doc_id
            GROUP BY d.doc_id
        """,
        "grouped_count_having": """
            SELECT source, COUNT(*) AS n_docs FROM documents
            GROUP BY source HAVING COUNT(*) >= 5
        """,
        "top_k_events": """
            SELECT event_id, value FROM events
            ORDER BY value DESC, event_id LIMIT 50
        """,
        "sample_mod10": """
            SELECT doc_id, lang FROM documents WHERE doc_id % 10 = 3
        """,
        "exact_dedup_documents": """
            SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
            FROM documents GROUP BY text
        """,
        "broadcast_join_orders_customers": """
            SELECT c.c_mktsegment, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_total_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "hash_join_lineitem_orders": """
            SELECT o.o_orderpriority,
                   CAST(SUM(CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_items
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
        """,
        "quantile_filter_events": """
            SELECT event_id, value FROM events
            WHERE value >= (SELECT quantile_cont(value, 0.9) FROM events)
        """,
        "stratified_first2_documents": """
            SELECT doc_id, lang FROM documents
            QUALIFY row_number() OVER (PARTITION BY lang ORDER BY doc_id) <= 2
        """,
        "window_events_hourly": """
            SELECT event_type,
                   CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS window_start,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
            FROM events GROUP BY event_type, window_start
        """,
        "union_tagged_documents": """
            SELECT subset, COUNT(*) AS n FROM (
                SELECT 'en' AS subset, doc_id FROM documents WHERE lang = 'en'
                UNION ALL
                SELECT 'long' AS subset, doc_id FROM documents WHERE n_chars > 400
            ) GROUP BY subset
        """,
        "token_count_documents": """
            SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "quality_stats_documents": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique,
                   floor((1.0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                          / len(string_split(text, ' '))) * 1000000) / 1000000 AS rep_ratio
            FROM documents
        """,
        # Gopher repetition (word-granular): dup-line fraction, tokens
        # covered by the top bigram, trigram occurrences in duplicated
        # trigrams — each floor-quantized to 1e-6 exactly as the kernel.
        "gopher_repetition_documents": """
            WITH toks AS (
              SELECT doc_id,
                     CASE WHEN text IS NULL OR text = '' THEN []
                          ELSE string_split(text, ' ') END AS t,
                     CASE WHEN text IS NULL OR text = '' THEN []
                          ELSE string_split(text, chr(10)) END AS ln
              FROM documents
            ),
            big AS (
              SELECT doc_id, len(t) AS nt,
                     unnest(list_transform(generate_series(1, len(t)-1),
                                           i -> t[i] || chr(1) || t[i+1])) AS g
              FROM toks WHERE len(t) >= 2
            ),
            bigc AS (
              SELECT doc_id, MAX(c) AS mx, MAX(nt) AS nt
              FROM (SELECT doc_id, g, MAX(nt) AS nt, count(*) AS c
                    FROM big GROUP BY doc_id, g)
              GROUP BY doc_id
            ),
            tri AS (
              SELECT doc_id, len(t) AS nt,
                     unnest(list_transform(generate_series(1, len(t)-2),
                            i -> t[i] || chr(1) || t[i+1] || chr(1) || t[i+2])) AS g
              FROM toks WHERE len(t) >= 3
            ),
            tric AS (
              SELECT doc_id,
                     SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
                     MAX(nt) AS nt
              FROM (SELECT doc_id, g, MAX(nt) AS nt, count(*) AS c
                    FROM tri GROUP BY doc_id, g)
              GROUP BY doc_id
            ),
            lines AS (
              SELECT doc_id,
                     CASE WHEN len(ln) = 0 THEN 0.0
                          ELSE CAST(len(ln) - len(list_distinct(ln)) AS DOUBLE)
                               / len(ln) END AS raw
              FROM toks
            ),
            sig AS (
              SELECT d.doc_id,
                     floor(l.raw * 1000000) / 1000000 AS dup_line_frac,
                     floor(COALESCE(2.0 * b.mx / b.nt, 0.0) * 1000000)
                         / 1000000 AS top_bigram_frac,
                     floor(COALESCE(CAST(tr.dup AS DOUBLE) / (tr.nt - 2), 0.0)
                           * 1000000) / 1000000 AS dup_trigram_frac
              FROM documents d
              LEFT JOIN bigc b USING (doc_id)
              LEFT JOIN tric tr USING (doc_id)
              JOIN lines l USING (doc_id)
            )
            SELECT doc_id, dup_line_frac, top_bigram_frac, dup_trigram_frac,
                   (dup_line_frac <= 0.30 AND top_bigram_frac <= 0.20
                    AND dup_trigram_frac <= 0.30) AS keep
            FROM sig
        """,
        "doc_quality_filter": """
            SELECT doc_id,
                   (n_chars BETWEEN 50 AND 500) AND
                   (floor((1.0 - CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                           / len(string_split(text, ' '))) * 1000000) / 1000000 <= 0.6) AS keep
            FROM documents
        """,
        "md5_fingerprint_documents": """
            SELECT doc_id, md5(text) AS fp FROM documents
        """,
        "embedding_cosine_dedup": """
            SELECT a.vec_id FROM embeddings a
            WHERE NOT EXISTS (
                SELECT 1 FROM embeddings b
                WHERE b.vec_id < a.vec_id
                  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4)
        """,
        "ann_topk_embeddings": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
            s AS (
                SELECT q.qid AS query_id, e.vec_id,
                       list_cosine_similarity(q.qe, e.embedding) AS cos
                FROM q, embeddings e WHERE e.vec_id <> q.qid
            )
            SELECT query_id, vec_id, rank FROM (
                SELECT query_id, vec_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, vec_id) AS rank
                FROM s
            ) WHERE rank <= 10
        """,
        "majority_event_type_per_user": """
            SELECT user_id, event_type AS majority_event_type,
                   CAST(n AS BIGINT) AS votes, CAST(tot AS BIGINT) AS n_group
            FROM (
                SELECT user_id, event_type, count(*) AS n,
                       sum(count(*)) OVER (PARTITION BY user_id) AS tot,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY count(*) DESC, event_type) AS rn
                FROM events GROUP BY user_id, event_type
            ) WHERE rn = 1
        """,
        # root-domain extraction + frequent-domain membership (HAVING
        # floor 5), urls synthesized with the identical || expression
        "domain_annotate_documents": """
            WITH u AS (
              SELECT doc_id,
                     'https://' || (CASE doc_id % 4
                        WHEN 0 THEN 'www.alpha.example.com'
                        WHEN 1 THEN 'beta.example.org'
                        WHEN 2 THEN 'cdn.gamma.net'
                        ELSE 'site' || doc_id || '.io' END)
                     || '/p/' || doc_id AS url
              FROM documents
            ),
            hx AS (SELECT doc_id,
                          regexp_extract(lower(url),
                              '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS h
                   FROM u),
            h2 AS (SELECT doc_id,
                          CASE WHEN starts_with(h, 'www.')
                               THEN substr(h, 5) ELSE h END AS h
                   FROM hx),
            d AS (SELECT doc_id,
                         CASE WHEN h = '' THEN ''
                              ELSE array_to_string(list_slice(
                                     string_split(h, '.'),
                                     greatest(1, len(string_split(h, '.')) - 1),
                                     len(string_split(h, '.'))), '.')
                         END AS root_domain
                  FROM h2),
            f AS (SELECT root_domain FROM d
                  GROUP BY root_domain HAVING count(*) >= 5)
            SELECT doc_id, root_domain,
                   root_domain IN (SELECT root_domain FROM f)
                       AS is_frequent_domain
            FROM d
        """,
        # Self-BLEU (max_n=2): modified n-gram precision clipped against
        # the best OTHER document, geometric mean, micro-unit floor,
        # mean over ALL docs (empty docs score 0 via the denominator).
        "self_bleu_documents": """
            WITH tok AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents
              WHERE text IS NOT NULL AND text <> ''
            ),
            gr AS (
              SELECT doc_id, unnest(t) AS g, 1 AS n FROM tok
              UNION ALL
              SELECT doc_id,
                     unnest(list_transform(generate_series(1, len(t)-1),
                            i -> t[i] || chr(1) || t[i+1])) AS g, 2 AS n
              FROM tok WHERE len(t) >= 2
            ),
            gc AS (SELECT doc_id, g, n, count(*) AS c
                   FROM gr GROUP BY doc_id, g, n),
            gmax AS (SELECT g, n, max(c) AS t1 FROM gc GROUP BY g, n),
            gstat AS (
              SELECT gc.g, gc.n, any_value(gm.t1) AS t1,
                     count(*) FILTER (WHERE c = gm.t1) AS nmax,
                     COALESCE(max(c) FILTER (WHERE c < gm.t1), 0) AS t2
              FROM gc JOIN gmax gm ON gc.g = gm.g AND gc.n = gm.n
              GROUP BY gc.g, gc.n
            ),
            clip AS (
              SELECT gc.doc_id, gc.n,
                     SUM(LEAST(c, CASE WHEN c < s.t1 OR s.nmax >= 2
                                       THEN s.t1 ELSE s.t2 END)) AS clip,
                     SUM(c) AS tot
              FROM gc JOIN gstat s ON gc.g = s.g AND gc.n = s.n
              GROUP BY gc.doc_id, gc.n
            ),
            p AS (
              SELECT doc_id,
                     max(CASE WHEN n = 1
                              THEN CAST(clip AS DOUBLE) / tot END) AS p1,
                     max(CASE WHEN n = 2
                              THEN CAST(clip AS DOUBLE) / tot END) AS p2
              FROM clip GROUP BY doc_id
            ),
            sc AS (
              SELECT CASE WHEN p1 IS NULL OR p2 IS NULL
                               OR p1 <= 0 OR p2 <= 0 THEN 0
                          ELSE CAST(floor(sqrt(p1 * p2) * 1000000)
                                    AS BIGINT) END AS micro
              FROM p
            )
            SELECT CAST(COALESCE(SUM(micro), 0) AS DOUBLE)
                   / (1000000.0 * (SELECT count(*) FROM documents))
                       AS self_bleu
            FROM sc
        """,
        # Gini over token frequencies: the rank-weighted sum is computed
        # in exact integer arithmetic on both sides (tie order is value-
        # invariant: tied counts share a contiguous rank block), one
        # final double division each.
        "token_gini_documents": """
            WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t
                         FROM documents),
            cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
            rk AS (SELECT c, row_number() OVER (ORDER BY c, t) AS i
                   FROM cnt),
            s AS (SELECT count(*) AS n, SUM(c) AS sx FROM cnt)
            SELECT CAST(SUM((2 * i - n - 1)::HUGEINT * c) AS DOUBLE)
                   / CAST(n::HUGEINT * sx AS DOUBLE) AS token_gini
            FROM rk CROSS JOIN s GROUP BY n, sx
        """,
        "token_entropy_documents": """
            WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
            c AS (SELECT t, CAST(count(*) AS DOUBLE) AS n FROM tok GROUP BY t),
            s AS (SELECT sum(n) AS tot FROM c)
            SELECT floor((-sum((n/tot) * ln(n/tot))) * 1000000) / 1000000 AS entropy
            FROM c, s
        """,
        "q3_revenue_by_segment_priority": """
            SELECT c.c_mktsegment, o.o_orderpriority,
                   CAST(SUM(CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment, o.o_orderpriority
        """,
        "asof_join_events": """
            SELECT e.event_id, p.p_event_id
            FROM (SELECT event_id, ts, user_id FROM events
                  WHERE event_type = 'error') e
            ASOF JOIN (SELECT event_id AS p_event_id, ts, user_id FROM events
                       WHERE event_type = 'purchase') p
            ON e.user_id = p.user_id AND e.ts >= p.ts
        """,
        "sessionize_events": """
            WITH t AS (
                SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
                       CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                                 - lag(CAST(floor(epoch(ts)) AS BIGINT))
                                   OVER (PARTITION BY user_id ORDER BY ts) > 1800
                            OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                            THEN 1 ELSE 0 END AS new_s
                FROM events
            ), lab AS (
                SELECT user_id, s,
                       sum(new_s) OVER (PARTITION BY user_id ORDER BY s
                                        ROWS UNBOUNDED PRECEDING) AS sid
                FROM t
            )
            SELECT user_id, CAST(min(s) AS BIGINT) AS session_start,
                   COUNT(*) AS n_events,
                   CAST(max(s) - min(s) AS BIGINT) AS duration_s
            FROM lab GROUP BY user_id, sid
        """,
        # the mock LLM backend is a pure md5 function of the canonical
        # prompt ("user\n" + filled template), so annotation queries ARE
        # SQL-expressible — DuckDB md5 reproduces them bit-for-bit
        "llm_annotate_documents": """
            SELECT doc_id,
                   md5('user' || chr(10) || 'Summarize: ' || text) AS annotation
            FROM documents
        """,
        "llm_score_filter_documents": """
            WITH m AS (
                SELECT doc_id,
                       md5('user' || chr(10) || 'Rate: ' || text) AS h
                FROM documents
            )
            SELECT doc_id,
                   CAST(1 + (ascii(substr(h,1,1))*256 + ascii(substr(h,2,1))) % 100
                        AS BIGINT) AS score
            FROM m
            WHERE 1 + (ascii(substr(h,1,1))*256 + ascii(substr(h,2,1))) % 100 >= 50
        """,
        "llm_list_fanout_documents": """
            SELECT d.doc_id,
                   md5('user' || chr(10) || 'Ideas: ' || d.text
                       || '#' || CAST(t.i AS VARCHAR)) AS idea
            FROM documents d CROSS JOIN range(3) t(i)
            WHERE d.doc_id % 25 = 0
        """,
        "llm_generate_ideas_documents": """
            SELECT doc_id,
                   array_to_string(list_transform(range(0, 3), i ->
                       md5('user' || chr(10) || 'Ideas: ' || text
                           || '#' || CAST(i AS VARCHAR))), ',') AS ideas
            FROM documents
            WHERE doc_id % 25 = 1
        """,
        "llm_test_cases_documents": """
            WITH c AS (
                SELECT doc_id,
                       'system' || chr(10)
                       || 'You generate test cases for programming '
                       || 'problems: reply with equally sized lists of '
                       || 'stdin inputs and expected outputs, one string '
                       || 'each; use a comma between multiple values and '
                       || 'an empty string when the program reads nothing.'
                       || chr(10) || 'user' || chr(10)
                       || 'Write test cases for this problem:'
                       || chr(10) || chr(10) || text AS canon
                FROM documents WHERE doc_id % 25 = 2
            )
            SELECT doc_id, t.i AS case_idx,
                   md5(canon || '#in#' || CAST(t.i AS VARCHAR)) AS test_input,
                   md5(canon || '#out#' || CAST(t.i AS VARCHAR)) AS test_output
            FROM c CROSS JOIN range(2) t(i)
        """,
        "llm_alpaca_documents": """
            WITH c AS (
                SELECT doc_id, 'user' || chr(10) || text AS canon
                FROM documents WHERE doc_id % 25 = 3
            )
            SELECT doc_id,
                   'Summarize topic '
                   || md5(canon || '#inst#' || CAST(t.i AS VARCHAR))
                   || ' briefly.' AS instruction,
                   '' AS instr_input,
                   md5(canon || '#out#' || CAST(t.i AS VARCHAR)) AS output
            FROM c CROSS JOIN range(1, 3) t(i)
        """,
        "llm_unnatural_documents": """
            WITH c AS (
                SELECT doc_id,
                       'user' || chr(10) || 'Create a task from: ' || text
                           AS canon
                FROM documents WHERE doc_id % 25 = 4
            )
            SELECT doc_id,
                   md5(canon || '#field#instruction') AS instruction,
                   md5(canon || '#field#input') AS instr_input,
                   md5(canon || '#field#constraints') AS constraints
            FROM c
        """,
        "llm_open_gpt_documents": """
            WITH c AS (
                SELECT doc_id,
                       'user' || chr(10) || 'Make tasks from: ' || text
                           AS canon
                FROM documents WHERE doc_id % 25 = 6
            )
            SELECT doc_id,
                   md5(canon || '#task' || CAST(t.i AS VARCHAR)
                       || '#task') AS task,
                   md5(canon || '#task' || CAST(t.i AS VARCHAR)
                       || '#instruction') AS instruction,
                   md5(canon || '#task' || CAST(t.i AS VARCHAR)
                       || '#input') AS input,
                   md5(canon || '#task' || CAST(t.i AS VARCHAR)
                       || '#output') AS output
            FROM c CROSS JOIN range(2) t(i)
        """,
        "llm_difficulty_documents": """
            WITH c AS (
                SELECT doc_id,
                       md5('user' || chr(10)
                           || 'Grade the difficulty from 1-10 using this '
                           || 'standard: std' || chr(10)
                           || 'Problem: ' || text) AS h
                FROM documents WHERE doc_id % 25 = 7
            )
            SELECT doc_id,
                   CAST(1 + (ascii(substr(h,1,1))*256
                             + ascii(substr(h,2,1))) % 10 AS BIGINT)
                       AS difficulty
            FROM c
        """,
        "llm_reasoner_documents": """
            WITH c AS (
                SELECT doc_id, 'user' || chr(10) || text AS canon
                FROM documents WHERE doc_id % 25 = 8
            )
            SELECT doc_id,
                   md5(canon || '#field#reasoning') AS reasoning,
                   md5(canon || '#field#content') AS solution
            FROM c
        """,
        "llm_seed_task_documents": """
            WITH c AS (
                SELECT doc_id, text, lang,
                       'user' || chr(10) || 'Vary: ' || text AS canon
                FROM documents WHERE doc_id % 25 = 5
            )
            SELECT doc_id,
                   md5(canon || '#field#instruction') AS instruction,
                   md5(canon || '#field#input') AS input,
                   md5(canon || '#field#output') AS output
            FROM c
            UNION ALL
            SELECT doc_id, text AS instruction, '' AS input,
                   lang AS output
            FROM c
        """,
        "json_source_documents": """
            SELECT doc_id, lang FROM documents ORDER BY doc_id LIMIT 200
        """,
        # the resilient sharded read must be LOSSLESS after every shard
        # recovers from an injected first-attempt failure
        "resilient_shard_source_documents": """
            SELECT doc_id, lang FROM documents
        """,
        "bpe_token_count_documents": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
                       AS n_bpe_tokens
            FROM documents
        """,
        # exact n-gram-Jaccard dedup: the SQL-checkable member of the
        # LSH dedup family (same sequential NOT-EXISTS shape as
        # embedding_cosine_dedup)
        "ngram_jaccard_dedup_documents": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                          FROM documents),
            grams AS (SELECT doc_id,
              CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                   ELSE list_distinct(list_transform(
                        generate_series(1, len(t)-2),
                        i -> t[i]||' '||t[i+1]||' '||t[i+2])) END AS gs
              FROM toks)
            SELECT g.doc_id FROM grams g
            WHERE NOT EXISTS (
              SELECT 1 FROM grams e WHERE e.doc_id < g.doc_id
                AND CAST(len(list_intersect(g.gs, e.gs)) AS DOUBLE)
                    / (len(g.gs) + len(e.gs) - len(list_intersect(g.gs, e.gs)))
                    >= 0.8)
        """,
        # decontamination: normalized-text exact match OR benchmark-row
        # 8-gram coverage ≥ 0.5 (the inverted-index screen IS this
        # max-over-bench coverage, so it is SQL-expressible)
        "decontaminate_documents": r"""
            WITH nrm AS (SELECT doc_id,
                     lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm
                   FROM documents),
            tok AS (SELECT doc_id, norm, string_split(norm, ' ') AS t FROM nrm),
            g AS (SELECT doc_id, norm,
              CASE WHEN len(t) < 8 THEN [norm]
                   ELSE list_distinct(list_transform(
                        generate_series(1, len(t)-7),
                        i -> t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '
                             ||t[i+4]||' '||t[i+5]||' '||t[i+6]||' '||t[i+7]))
                   END AS gs
              FROM tok),
            bench AS (SELECT * FROM g ORDER BY doc_id LIMIT 5)
            SELECT d.doc_id FROM g d
            WHERE NOT EXISTS (
              SELECT 1 FROM bench b
              WHERE d.norm = b.norm
                 OR CAST(len(list_intersect(d.gs, b.gs)) AS DOUBLE)
                    / greatest(1, len(b.gs)) >= 0.5)
        """,
        "llm_judge_documents": """
            WITH m AS (
                SELECT doc_id,
                       md5('system' || chr(10)
                           || 'Evaluate whether the attempt correctly answers the inputs given the targets. End your response with a single word: yes or no.'
                           || chr(10) || 'user' || chr(10)
                           || 'inputs: ' || text || chr(10)
                           || 'targets: ' || lang || chr(10)
                           || 'attempt: ' || source) AS h
                FROM documents
            )
            SELECT doc_id,
                   (ascii(substr(h, 1, 1)) % 2 = 0) AS model_judgement,
                   'Mock judgement ' || substr(h, 1, 8) || '.' || chr(10)
                       || CASE WHEN ascii(substr(h, 1, 1)) % 2 = 0
                               THEN 'yes' ELSE 'no' END AS model_judgement_full
            FROM m
        """,
        "llm_critic_documents": """
            SELECT doc_id,
                   md5('system' || chr(10) || 'You are a critical evaluator'
                       || chr(10) || 'user' || chr(10)
                       || 'Evaluate the strengths and weaknesses of each response based on the instruction: '
                       || text || '.' || chr(10)
                       || chr(10) || '[1] ' || source
                       || chr(10) || '[2] ' || lang) AS critique
            FROM documents
        """,
        "llm_fuse_documents": """
            SELECT doc_id,
                   md5('system' || chr(10)
                       || 'You are a helpful assistant who fuses multiple answers'
                       || chr(10) || 'user' || chr(10)
                       || 'Fuse the best ideas of the following 2 responses to: '
                       || text || chr(10)
                       || chr(10) || '[1] ' || lang
                       || chr(10) || '[2] ' || source) AS fused
            FROM documents
        """,
        "top_tokens_documents": """
            SELECT t AS token, COUNT(*) AS n FROM (
                SELECT unnest(string_split(text, ' ')) AS t FROM documents
            ) GROUP BY t HAVING COUNT(*) >= 100
        """,
        "distinct_bigram_ratio_documents": """
            WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
            g AS (SELECT unnest(list_transform(
                      generate_series(1, greatest(len(t) - 1, 0)),
                      i -> t[i] || ' ' || t[i+1])) AS gram
                  FROM toks)
            SELECT floor(CAST(COUNT(DISTINCT gram) AS DOUBLE) / COUNT(*)
                         * 1000000) / 1000000 AS ratio
            FROM g
        """,
        "priority_sample_documents": """
            SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS pri
            FROM documents ORDER BY pri LIMIT 20
        """,
        "stratified_priority_sample_documents": """
            SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR) || '#otr'),
                                    doc_id) AS rn
                FROM documents
            ) WHERE rn <= 5
        """,
        # exact-semantics oracle; valid because in-bucket verification is
        # exact and recall is 1 on this table (see the query docstring)
        "cosine_dedup_lsh_embeddings": """
            SELECT a.vec_id FROM embeddings a
            WHERE NOT EXISTS (
                SELECT 1 FROM embeddings b
                WHERE b.vec_id < a.vec_id
                  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.9)
        """,
        "scrub_documents": _scrub_oracle(),
        "latest_event_per_user": """
            SELECT user_id, event_id, event_type FROM (
                SELECT user_id, event_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC)
                           AS rn
                FROM events) sub
            WHERE rn = 1
        """,
        "median_quantity_per_flag": """
            SELECT l_returnflag,
                   CAST(floor(2 * median(CAST(floor(l_quantity * 100 + 0.5)
                                              AS BIGINT)) + 0.5)
                        AS BIGINT) AS median_x2_cents
            FROM lineitem GROUP BY l_returnflag
        """,
        "max_gap_events": """
            SELECT user_id, CAST(max(gap) AS BIGINT) AS max_gap_us,
                   CAST(count(*) AS BIGINT) AS n_gaps
            FROM (
                SELECT user_id,
                       epoch_us(ts) - lag(epoch_us(ts))
                           OVER (PARTITION BY user_id ORDER BY ts) AS gap
                FROM events) sub
            WHERE gap IS NOT NULL GROUP BY user_id
        """,
        "corr_qty_price": """
            SELECT floor(corr(l_quantity, l_extendedprice) * 1000000)
                   / 1000000 AS corr_qty_price
            FROM lineitem
        """,
        "range_join_events": """
            SELECT a.event_id AS err_id, b.event_id AS buy_id
            FROM events a JOIN events b
              ON a.event_type = 'error' AND b.event_type = 'purchase'
             AND b.ts BETWEEN a.ts - INTERVAL 5 MINUTE
                          AND a.ts + INTERVAL 5 MINUTE
        """,
        "rolling_sum_events": """
            SELECT user_id, event_id,
                   sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                       AS roll3_cents
            FROM events
        """,
        "distinct_types_per_user": """
            SELECT user_id,
                   CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
            FROM events GROUP BY user_id
        """,
        "langs_per_source": """
            SELECT source, string_agg(DISTINCT lang, ',' ORDER BY lang)
                       AS langs
            FROM documents GROUP BY source
        """,
        "top2_events_per_user": """
            SELECT user_id, event_id, event_type FROM (
                SELECT user_id, event_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC)
                           AS rn
                FROM events) sub
            WHERE rn <= 2
        """,
        "mixture_sample_documents": """
            SELECT doc_id, source FROM documents
            WHERE md5(CAST(doc_id AS VARCHAR)) <
                  CASE WHEN source IN ('src0','src1','src2')
                            THEN 'e6666666'
                       WHEN source IN ('src3','src4') THEN '80000000'
                       ELSE '33333333' END
        """,
        "ntile_events_by_type": """
            SELECT event_id, event_type,
                   NTILE(4) OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS tile
            FROM events
        """,
        "pack_documents": """
            SELECT doc_id,
                   CAST(COALESCE(sum(n_chars) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS BIGINT)
                       // 4096 AS pack_id
            FROM documents
        """,
        "pivot_events_by_type": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click')    AS n_click,
                   count(*) FILTER (event_type = 'view')     AS n_view,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup')   AS n_signup,
                   count(*) FILTER (event_type = 'error')    AS n_error
            FROM events GROUP BY user_id
        """,
        "p90_value_per_type": """
            SELECT event_type,
                   CAST(floor(quantile_cont(value, 0.9) * 1000)
                        AS BIGINT) AS p90_milli
            FROM events GROUP BY event_type
        """,
        # exact edit-distance dedup: PassJoin candidates are recall-1,
        # verification is exact, so DuckDB's levenshtein() NOT EXISTS
        # is the oracle (length filter is implied by the distance bound)
        "levenshtein_dedup_documents": """
            SELECT g.doc_id FROM documents g
            WHERE NOT EXISTS (
              SELECT 1 FROM documents e WHERE e.doc_id < g.doc_id
                AND abs(length(e.text) - length(g.text)) <= 5
                AND levenshtein(e.text, g.text) <= 5)
        """,
        # substring-containment dedup: min-gram candidates are recall-1,
        # verification exact → contains() NOT EXISTS is the oracle
        "containment_dedup_documents": """
            SELECT g.doc_id FROM documents g
            WHERE NOT EXISTS (
              SELECT 1 FROM documents e WHERE e.doc_id != g.doc_id
                AND contains(e.text, g.text)
                AND (length(e.text) > length(g.text)
                     OR (length(e.text) = length(g.text)
                         AND e.doc_id < g.doc_id)))
        """,
        # HLL with the md5 hasher is deterministic: rebuild the identical
        # registers in SQL (idx = top 12 bits of the md5-prefix hash,
        # rho = 53 - bitlength(low 52 bits)) and apply the same
        # bias-corrected + linear-counting estimate.
        "approx_distinct_users": """
            WITH h AS (
                SELECT CAST(concat('0x',
                        substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
                       AS UBIGINT) AS hv
                FROM events
            ),
            reg AS (
                SELECT hv >> 52 AS idx,
                       MAX(CASE WHEN (hv & ((1::UBIGINT << 52) - 1)) = 0
                            THEN 53
                            ELSE 53 - length(bin(hv & ((1::UBIGINT << 52) - 1)))
                           END) AS rho
                FROM h GROUP BY idx
            ),
            s AS (
                SELECT count(*) AS nreg,
                       sum(power(2.0, -rho)) AS sum_present
                FROM reg
            ),
            est AS (
                SELECT (0.7213 / (1 + 1.079 / 4096.0)) * 4096.0 * 4096.0
                         / ((4096 - nreg) * 1.0 + sum_present) AS raw,
                       (4096 - nreg) AS zeros
                FROM s
            )
            SELECT CAST(round(CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
                        THEN 4096.0 * ln(4096.0 / zeros)
                        ELSE raw END) AS BIGINT) AS approx_distinct_users
            FROM est
        """,
        "bm25_topk_documents": _bm25_oracle(),
        "rrf_hybrid_topk_documents": _rrf_oracle(),
        "rerank_topk_documents": _rerank_oracle(),
        "retrieval_eval_documents": _retrieval_eval_oracle(),
        "minhash_dedup_documents": _minhash_oracle(),
        "delta_neardup_documents": f"""
            WITH surv AS ({_minhash_oracle(docs_sql=(
                "SELECT CASE WHEN source IN ('src0','src1') THEN doc_id "
                "ELSE doc_id + (SELECT max(doc_id)+1 FROM documents) END "
                "AS doc_id, text FROM documents"))})
            SELECT surv.doc_id - (SELECT max(doc_id)+1 FROM documents)
                   AS doc_id
            FROM surv
            WHERE surv.doc_id >= (SELECT max(doc_id)+1 FROM documents)
        """,
        "hash_split_documents": """
            SELECT doc_id,
                   CAST(CAST(concat('0x',
                          substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS UBIGINT) % 100 AS BIGINT) AS bucket,
                   CASE WHEN CAST(CAST(concat('0x',
                            substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                          AS UBIGINT) % 100 AS BIGINT) < 80 THEN 'train'
                        WHEN CAST(CAST(concat('0x',
                            substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                          AS UBIGINT) % 100 AS BIGINT) < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "chunk_documents": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS tk
                FROM documents WHERE text IS NOT NULL AND text <> ''
            ),
            fan AS (
                SELECT doc_id, tk,
                       unnest(generate_series(0,
                           GREATEST(CAST(ceil((len(tk) - 32) / 24.0)
                                    AS BIGINT), 0))) AS g
                FROM toks
            )
            SELECT doc_id, CAST(g AS BIGINT) AS chunk_id,
                   array_to_string(list_slice(tk, g*24+1, g*24+32), ' ')
                       AS chunk_text,
                   CAST(len(list_slice(tk, g*24+1, g*24+32)) AS BIGINT)
                       AS n_chunk_tokens
            FROM fan
        """,
        # simhash_dedup_documents: md5 token hash + first-seen-earlier
        # semantics → the banded-LSH collapse (recall 1 at bands=4 /
        # ham≤3 by pigeonhole) is replayed exactly: rebuild each doc's
        # 64-bit simhash from per-token md5 bit sums, then
        # NOT-EXISTS-earlier on bit_count(xor) ≤ 3.
        "simhash_dedup_documents": """
            WITH tok AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS tk
              FROM documents
            ),
            h AS (
              SELECT doc_id,
                     CAST(concat('0x', substr(md5(tk), 1, 16)) AS UBIGINT)
                         AS hv
              FROM tok WHERE tk <> ''
            ),
            bitsum AS (
              SELECT doc_id, p,
                     SUM(CASE WHEN (hv >> p) & 1 = 1 THEN 1 ELSE -1 END) AS s
              FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS p) bits
              GROUP BY doc_id, p
            ),
            packed AS (
              SELECT doc_id,
                     SUM(CASE WHEN s > 0 THEN (1::HUGEINT << p)
                              ELSE 0::HUGEINT END) AS u
              FROM bitsum GROUP BY doc_id
            ),
            sh AS (
              SELECT d.doc_id,
                     CAST(COALESCE(CASE WHEN u >= (1::HUGEINT << 63)
                                        THEN u - (1::HUGEINT << 64)
                                        ELSE u END, 0) AS BIGINT) AS hv
              FROM documents d LEFT JOIN packed USING (doc_id)
            )
            SELECT g.doc_id FROM sh g
            WHERE NOT EXISTS (
              SELECT 1 FROM sh e WHERE e.doc_id < g.doc_id
                AND bit_count(xor(e.hv, g.hv)) <= 3)
        """,
        "metamath_extract_answer_documents": """
            WITH c AS (
                SELECT doc_id,
                       md5('system' || chr(10)
                           || 'Extract the short final numerical answer '
                           || 'from the detailed answer.' || chr(10)
                           || 'user' || chr(10)
                           || 'Detailed answer: ' || text
                           || '#field#numerical_answer') AS num
                FROM documents WHERE doc_id % 25 = 9
            )
            SELECT doc_id, num FROM c
            WHERE regexp_matches(num, '[0-9]')
        """,
        "url_classify_documents": """
            WITH c AS (
                SELECT doc_id,
                       md5('system' || chr(10)
                           || 'Classify the domain as educational or '
                           || 'non-educational. The last word you send '
                           || 'must be "yes" (educational) or "no" '
                           || '(non-educational).' || chr(10)
                           || 'user' || chr(10) || source) AS h
                FROM documents WHERE doc_id % 25 = 10
            )
            SELECT doc_id,
                   ascii(substr(h,1,1)) % 2 = 0 AS url_classification
            FROM c
        """,
        "webinstruct_qa_documents": """
            WITH c AS (
                SELECT doc_id,
                       'system' || chr(10)
                       || 'Extract natural question-answer pairs from '
                       || 'the document, ignoring ads and boilerplate; '
                       || 'return an empty list when none exist.'
                       || chr(10) || 'user' || chr(10) || text AS canon
                FROM documents WHERE doc_id % 25 = 11
            )
            SELECT doc_id,
                   md5(canon || '#q#' || CAST(t.i AS VARCHAR)) AS q,
                   md5(canon || '#a#' || CAST(t.i AS VARCHAR)) AS a
            FROM c CROSS JOIN range(2) t(i)
            WHERE ascii(substr(md5(canon),1,1)) % 4 != 1
        """,
        # Non-SQL-expressible ops are hash-checked via golden-fixture
        # replay (approx_top_tokens / fuzzy_dedup / flagship / distill /
        # tree_search / alignment / image_search / kcenter, and — after
        # the k-means family moved to exact int64 fixed-point late r5 —
        # ann_topk_ivf / semantic_dedup too; see the golden_gate block
        # below).  Every gate query now has an oracle.
        # ngram_jaccard_dedup_documents / simhash_dedup_documents /
        # minhash_dedup_documents / approx_distinct_users are the
        # hash-checked members vouching for the shared machinery.
        # Lee-et-al. substring scrub replayed on the gram STRINGS (the
        # engine shuffles 64-bit gram hashes; a hash collision at test
        # scale would break this parity, so the gate doubles as a
        # collision check).  DuckDB list slices are 1-based inclusive.
        "substring_scrub_documents": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ),
            grams AS (
                SELECT doc_id, i.i AS pos,
                       array_to_string(t[i.i : i.i + 4], ' ') AS g
                FROM toks,
                     LATERAL (SELECT unnest(generate_series(
                         1, len(t) - 4)) AS i) i
                WHERE len(t) >= 5
            ),
            dup AS (
                SELECT g FROM grams
                GROUP BY g HAVING count(DISTINCT doc_id) >= 2
            ),
            hits AS (
                SELECT grams.doc_id, grams.pos FROM grams JOIN dup USING (g)
            ),
            cov AS (
                SELECT DISTINCT h.doc_id, j.j
                FROM hits h,
                     LATERAL (SELECT unnest(generate_series(
                         h.pos, h.pos + 4)) AS j) j
            ),
            tokens AS (
                SELECT doc_id, i.i AS j, t[i.i] AS tok
                FROM toks,
                     LATERAL (SELECT unnest(generate_series(
                         1, len(t))) AS i) i
            )
            SELECT tk.doc_id,
                   coalesce(string_agg(tk.tok, ' ' ORDER BY tk.j)
                            FILTER (WHERE cov.j IS NULL), '') AS clean_text,
                   count(cov.j) AS n_removed
            FROM tokens tk
            LEFT JOIN cov ON cov.doc_id = tk.doc_id AND cov.j = tk.j
            GROUP BY tk.doc_id
        """,
        # DSIR (ops/dsir.py): add-1-smoothed products are exact BIGINTs
        # cast to DOUBLE before the division on both sides, one libm ln
        # per occurrence, int64 sum — bit-for-bit replayable
        "token_budget_select_documents": """
            SELECT doc_id, source, n_tokens FROM (
                SELECT doc_id, source,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                       SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
                           PARTITION BY source
                           ORDER BY n_chars DESC, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
                FROM documents)
            WHERE cum <= 2000
        """,
        "delta_neardup_indexed_documents": f"""
            WITH surv AS ({_minhash_oracle(docs_sql=(
                "SELECT CASE WHEN source IN ('src0','src1') THEN doc_id "
                "ELSE doc_id + (SELECT max(doc_id)+1 FROM documents) END "
                "AS doc_id, text FROM documents"))})
            SELECT surv.doc_id - (SELECT max(doc_id)+1 FROM documents)
                   AS doc_id
            FROM surv
            WHERE surv.doc_id >= (SELECT max(doc_id)+1 FROM documents)
        """,
        "dsir_select_documents": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ),
            feats AS (
                SELECT doc_id, t[i.i] AS f
                FROM toks, LATERAL (SELECT unnest(generate_series(
                    1, len(t))) AS i) i
                UNION ALL
                SELECT doc_id, t[i.i] || ' ' || t[i.i + 1] AS f
                FROM toks, LATERAL (SELECT unnest(generate_series(
                    1, len(t) - 1)) AS i) i
            ),
            fb AS (
                SELECT doc_id,
                       CAST(CAST(concat('0x', substr(md5(f), 1, 8))
                                 AS UBIGINT) % 4096 AS BIGINT) AS b
                FROM feats
            ),
            tgt AS (
                SELECT b, count(*) AS ct FROM fb
                JOIN documents USING (doc_id)
                WHERE lang = 'en' GROUP BY b
            ),
            rawc AS (SELECT b, count(*) AS cr FROM fb GROUP BY b),
            tot AS (
                SELECT (SELECT count(*) FROM fb
                        JOIN documents USING (doc_id)
                        WHERE lang = 'en') AS nt,
                       (SELECT count(*) FROM fb) AS nr
            ),
            w AS (
                SELECT rawc.b,
                       CAST(floor(1000000.0 * ln(
                           CAST((coalesce(tgt.ct, 0) + 1)
                                * (tot.nr + 4096) AS DOUBLE)
                         / CAST((rawc.cr + 1)
                                * (tot.nt + 4096) AS DOUBLE)))
                            AS BIGINT) AS w
                FROM rawc LEFT JOIN tgt USING (b), tot
            )
            SELECT doc_id, dsir_score FROM (
                SELECT fb.doc_id, CAST(sum(w.w) AS BIGINT) AS dsir_score
                FROM fb JOIN w USING (b) GROUP BY fb.doc_id
            ) ORDER BY dsir_score DESC, doc_id LIMIT 50
        """,
        "substring_flag_documents": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ),
            grams AS (
                SELECT doc_id, array_to_string(t[i.i : i.i + 4], ' ') AS g
                FROM toks,
                     LATERAL (SELECT unnest(generate_series(
                         1, len(t) - 4)) AS i) i
                WHERE len(t) >= 5
            ),
            dup AS (
                SELECT g FROM grams
                GROUP BY g HAVING count(DISTINCT doc_id) >= 2
            )
            SELECT DISTINCT grams.doc_id FROM grams JOIN dup USING (g)
        """,
    }
