"""Relational operator library — the reference's ``commons.py`` + filter
utils re-expressed Ray-Data-first (SURVEY.md §2.2 / §2.6 / §2.7).

Every function takes and returns a ``ray.data.Dataset`` (lazy; no
materialization of big data).  Vectorized per-batch bodies; broadcast
lookups for small sides; two-pass global thresholds instead of the
reference's per-shard percentile bug (fasttext_operator.py:148-152).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


# ------------------------------------------------------------ projections
def keep_only_columns(ds, cols: list[str]):
    """commons.py:310-314."""
    return ds.select_columns(cols)


def remove_columns(ds, cols: list[str]):
    """commons.py:306-307."""
    return ds.drop_columns(cols)


def rename_columns(ds, mapping: dict[str, str]):
    """commons.py:317-336 (force_rename_columns)."""
    return ds.rename_columns(mapping)


def add_constant_columns(ds, constants: dict):
    """commons.py:529-544 — literal columns on every row."""

    def add(batch: pa.Table) -> pa.Table:
        for k, v in constants.items():
            batch = batch.append_column(k, pa.array([v] * batch.num_rows))
        return batch

    return ds.map_batches(add, batch_format="pyarrow")


# ---------------------------------------------------------------- filters
def filter_in(ds, column: str, values: list):
    """commons.py:174-209 filter_dataset(include list) — vectorized isin."""
    vset = pa.array(values)

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column(column), value_set=vset))

    return ds.map_batches(f, batch_format="pyarrow")


def filter_not_in(ds, column: str, values: list):
    vset = pa.array(values)

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch.column(column), value_set=vset))
        return batch.filter(pc.fill_null(mask, True))

    return ds.map_batches(f, batch_format="pyarrow")


def remove_nones(ds, column: str):
    """commons.py:19-20."""
    return ds.map_batches(
        lambda t: t.filter(pc.is_valid(t.column(column))), batch_format="pyarrow"
    )


def filter_expr(ds, fn):
    """Vectorized predicate: fn(pa.Table) -> boolean mask array."""
    return ds.map_batches(lambda t: t.filter(fn(t)), batch_format="pyarrow")


# ------------------------------------------------------------------ rows
def add_hash_id(ds, cols: list[str], out: str = "row_id"):
    """Content-addressed id (reference: md5 problem_id,
    open_thoughts/code/standardize.py:65-66) — stable across partitioning,
    unlike a monotonic counter."""
    import hashlib

    def f(batch: pa.Table) -> pa.Table:
        parts = [batch.column(c).to_pylist() for c in cols]
        ids = [
            hashlib.md5("|".join(str(v) for v in row).encode()).hexdigest()
            for row in zip(*parts)
        ]
        return batch.append_column(out, pa.array(ids, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def repeat_rows(ds, n: int):
    """commons.py:547-572 repeat_dataset — row multiplication ×n."""

    def f(batch: pa.Table) -> pa.Table:
        return pa.concat_tables([batch] * n)

    return ds.map_batches(f, batch_format="pyarrow")


# -------------------------------------------------------------- sampling
def sample_by_hash(ds, column: str, keep_every: int, residue: int = 0):
    """Deterministic, partition-independent sample: keep rows where
    ``column % keep_every == residue`` (SQL-checkable, unlike seeded
    engine-internal shuffles)."""

    def f(batch: pa.Table) -> pa.Table:
        col = batch.column(column).to_numpy(zero_copy_only=False)
        mask = (col % keep_every) == residue
        return batch.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def mixture_sample(ds, key_col: str, id_col: str, rates: dict,
                   default_rate: float = 0.0):
    """Deterministic data-mixture sampling: keep each row with
    probability ``rates[key]`` (``default_rate`` for unlisted keys),
    decided by whether ``md5(id)`` falls below a per-key hex cutoff —
    order/partition-independent and SQL-reproducible, so re-runs and
    resumes see the same sample.  Rate granularity is 16⁻⁸ ≈ 6e-10.
    The md5 per id is a Python call (no vectorized md5 kernel in
    Arrow); the loop touches only (id, key), not payloads."""

    def cut(r: float) -> str:
        if r >= 1.0:
            return "g"  # sorts after every hex digest → keep all
        if r <= 0.0:
            return ""   # nothing sorts before the empty string → drop
        return format(int(r * 16 ** 8), "08x")

    cuts = {k: cut(v) for k, v in rates.items()}
    dflt = cut(default_rate)

    def f(t: pa.Table) -> pa.Table:
        import hashlib

        ids = t.column(id_col).to_pylist()
        keys = t.column(key_col).to_pylist()
        keep = [
            hashlib.md5(str(i).encode()).hexdigest() < cuts.get(k, dflt)
            for i, k in zip(ids, keys)
        ]
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def uniform_sample_fixed(ds, n: int, seed: int = 42):
    """commons.py:597-603 — seeded shuffle then take n."""
    return ds.random_shuffle(seed=seed).limit(n)


def bottom_k_by(ds, order_cols: list[str], k: int):
    """Global k smallest rows by the ``order_cols`` tuple WITHOUT a full
    range-partitioned sort: every batch pre-reduces to its own k
    smallest (the global bottom-k is a subset of the per-batch
    bottom-k's), then the ≤ k × #batches candidate set coalesces into
    one block for the final sort+head — the bottom-k aggregate VERDICT
    r3 flagged ``sort().limit()`` for."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(order_cols, kind="mergesort").head(k)

    return ds.map_batches(partial, batch_format="pandas") \
        .repartition(1).map_batches(partial, batch_format="pandas",
                                    batch_size=None)


def stratified_first_k(ds, group_col, k: int, order_col: str):
    """_B2_Dedup/utils.py:5-50 stratified sample, made deterministic:
    per group take the k smallest by ``order_col``.  Per-batch
    pre-reduce (each batch keeps its own k smallest per key, C-level
    pandas) then ONE ``hash(key) % P`` shuffle and one partition-level
    grouped head — no per-key dispatch (ops/segment.py plan)."""
    from .segment import partitioned_groups

    cols = [group_col] if isinstance(group_col, str) else list(group_col)

    def head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(cols + [order_col], kind="mergesort").groupby(
            cols, sort=False).head(k)

    partial = ds.map_batches(head, batch_format="pandas")
    return partitioned_groups(partial, cols[0], head)


def stratified_priority_sample(ds, group_col: str, k: int, id_col: str,
                               seed: str = "otr"):
    """UNBIASED k-per-group cap: per group keep the k rows with the
    smallest ``md5(id || '#' || seed)`` — the "at most k random docs per
    domain" curation rule, deterministic (pure function of the id) and
    bit-replayable in SQL (``row_number() OVER (PARTITION BY g ORDER BY
    md5(...)) <= k``).  stratified_first_k caps by an ORDER column
    (earliest-k, biased toward low ids); this caps by a seeded hash, so
    the survivors are an unbiased sample of each group.

    Same bounded-dispatch plan: per-batch pre-reduce to the batch's own
    k smallest per key, then ONE ``hash(key) % P`` shuffle and one
    partition-level grouped head (ops/segment.py)."""
    import hashlib

    from .segment import partitioned_groups

    pri_col = "_pri"

    def add_pri(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[pri_col] = [
            hashlib.md5(f"{v}#{seed}".encode()).hexdigest()
            for v in df[id_col].astype(str)
        ]
        return df

    def head(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values([group_col, pri_col, id_col],
                             kind="mergesort").groupby(
            group_col, sort=False).head(k)

    partial = ds.map_batches(lambda df: head(add_pri(df)),
                             batch_format="pandas")
    out = partitioned_groups(partial, group_col, head)
    return out.drop_columns([pri_col])


def top_n_per_group(ds, group_col: str, order_cols: list[str], n: int = 1,
                    descending: bool = True):
    """Top-n rows per group by the ``order_cols`` tuple — SQL
    ``row_number() OVER (PARTITION BY g ORDER BY ...) <= n``.  Each
    batch pre-reduces to its own top-n per key (vectorized pandas
    sort + grouped head), so the ONE ``hash(key) % P`` shuffle carries
    at most n × #batches × #keys rows, never the input; the final
    grouped head runs once per PARTITION, not per key."""
    from .segment import partitioned_groups

    asc = not descending

    def batch_best(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(order_cols, ascending=asc,
                              kind="mergesort").groupby(
            group_col, sort=False).head(n)

    partial = ds.map_batches(batch_best, batch_format="pandas")
    return partitioned_groups(partial, group_col, batch_best)


def argmax_per_group(ds, group_col: str, order_cols: list[str],
                     descending: bool = True):
    """One row per group: the row with the greatest (least, if
    ``descending=False``) ``order_cols`` tuple — SQL
    ``row_number() OVER (PARTITION BY g ORDER BY ...) = 1``."""
    return top_n_per_group(ds, group_col, order_cols, n=1,
                           descending=descending)


def grouped_median(ds, group_col: str, value_col: str,
                   out_col: str | None = None):
    """Exact per-group median (DuckDB ``median()`` semantics: mean of
    the two middle values for even counts).  Median is not a mergeable
    aggregate, so the group's values must co-locate — ONE
    ``hash(key) % P`` shuffle carrying only (group, value); each
    partition folds every key with a single C-level pandas
    ``groupby().median()`` (no per-key dispatch)."""
    out_col = out_col or f"median_{value_col}"
    return grouped_quantile(ds, group_col, value_col, 0.5, out_col=out_col)


def pearson_corr(ds, x_col: str, y_col: str) -> float:
    """Distributed Pearson correlation from the five mergeable sums
    (n, Σx, Σy, Σx², Σy², Σxy) — each block contributes one partial row,
    no shuffle, nothing data-sized leaves the cluster."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "n": pa.array([float(len(x))]),
            "sx": pa.array([float(x.sum())]),
            "sy": pa.array([float(y.sum())]),
            "sxx": pa.array([float((x * x).sum())]),
            "syy": pa.array([float((y * y).sum())]),
            "sxy": pa.array([float((x * y).sum())]),
        })

    p = ds.select_columns([x_col, y_col]).map_batches(
        partial, batch_format="pyarrow").materialize()
    n = p.sum("n")
    sx, sy = p.sum("sx"), p.sum("sy")
    sxx, syy, sxy = p.sum("sxx"), p.sum("syy"), p.sum("sxy")
    num = n * sxy - sx * sy
    den = ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    return num / den if den else float("nan")


def zscore_column(ds, value_col: str, out_col: str | None = None,
                  scale: int = 100):
    """Global z-score standardization of a numeric column — the score
    normalizer run before threshold filters so cutoffs transfer across
    corpora.  Two streaming passes, no shuffle: pass 1 folds the three
    mergeable sums (n, Σc, Σc²) over EXACT integer micro-units
    c = floor(v·scale + 0.5) — integer partials make mean/variance
    independent of summation order, so every row's z-score is
    bit-identical to an ANSI-SQL replay with the same parenthesization
    (the q1 cents trick applied to moments); pass 2 rewrites rows.
    Constant-variance input → z = 0 everywhere."""
    out_col = out_col or f"z_{value_col}"

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        c = np.floor(v * scale + 0.5).astype(np.int64)
        return pa.table({
            "n": pa.array([len(c)], pa.int64()),
            "s": pa.array([int(c.sum())], pa.int64()),
            "ss": pa.array([int((c * c).sum())], pa.int64()),
        })

    sums = ds.select_columns([value_col]).map_batches(
        partial, batch_format="pyarrow").sum(["n", "s", "ss"])
    n = int(sums["sum(n)"] or 0)
    if n == 0:
        return ds.map_batches(
            lambda t: t.append_column(out_col, pa.array([], pa.float64())),
            batch_format="pyarrow")
    s, ss = int(sums["sum(s)"]), int(sums["sum(ss)"])
    # evaluation order mirrors the SQL oracle exactly: mu = S/n;
    # var = SS/n - mu*mu; sigma = sqrt(var)
    mu = float(s) / float(n)
    var = float(ss) / float(n) - mu * mu
    sigma = float(np.sqrt(var)) if var > 0 else 0.0

    def rewrite(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        c = np.floor(v * scale + 0.5)
        z = (c - mu) / sigma if sigma > 0 else np.zeros(len(c))
        return t.append_column(out_col, pa.array(z, pa.float64()))

    return ds.map_batches(rewrite, batch_format="pyarrow")


def minmax_normalize_column(ds, value_col: str, out_col: str | None = None):
    """Global min-max normalization to [0, 1].  Min/max are exact column
    VALUES (order-free picks, no float-sum drift), so the per-row
    rescale (v − min)/(max − min) hash-matches SQL with no quantization.
    Constant column → 0.0 everywhere."""
    out_col = out_col or f"norm_{value_col}"
    stats = ds.select_columns([value_col]).map_batches(
        lambda t: pa.table({
            "lo": pa.array([pc.min(t.column(value_col)).as_py()],
                           pa.float64()),
            "hi": pa.array([pc.max(t.column(value_col)).as_py()],
                           pa.float64()),
        }),
        batch_format="pyarrow",
    ).materialize()
    lo, hi = stats.min("lo"), stats.max("hi")
    span = hi - lo

    def rewrite(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        z = (v - lo) / span if span > 0 else np.zeros(len(v))
        return t.append_column(out_col, pa.array(z, pa.float64()))

    return ds.map_batches(rewrite, batch_format="pyarrow")


def percent_rank_annotate(ds, value_col: str, out_col: str | None = None,
                          max_driver_values: int = 5_000_000):
    """Annotate each row with its global percent rank over ``value_col``
    — SQL ``percent_rank() OVER (ORDER BY v)`` = (#values strictly
    below)/(n−1), ties share a rank.  NO global sort: one
    ``groupby(value).count`` shuffle builds the frequency table, the
    driver turns it into a value → rank map (O(#distinct values) — the
    op asserts ≤ ``max_driver_values``; percent-ranking a
    continuous-unique column needs the range-partitioned sort instead),
    and a broadcast lookup rewrites rows.  count_below/(n−1) is one
    exact-integer division, so results hash-match SQL with no
    quantization.  n == 1 → 0.0 (DuckDB convention)."""
    import ray

    out_col = out_col or f"pr_{value_col}"
    freq = ds.groupby(value_col).count().to_pandas()
    if len(freq) > max_driver_values:
        raise ValueError(
            f"{len(freq)} distinct values exceed max_driver_values="
            f"{max_driver_values}; use a sort-based rank for "
            f"continuous-unique columns")
    freq = freq.sort_values(value_col, kind="mergesort")
    counts = freq["count()"].to_numpy()
    n = int(counts.sum())
    below = np.concatenate([[0], np.cumsum(counts)[:-1]])
    denom = float(n - 1) if n > 1 else 1.0
    pr = {v: float(b) / denom for v, b in zip(freq[value_col], below)}
    ref = ray.put(pr)

    # plain tasks + per-worker broadcast cache (ops/bcast.py): the
    # (1, 8) actor pool never grew past 1 actor and paid its spawn
    def annotate_task(t: pa.Table, *, ref) -> pa.Table:
        from .bcast import cached_get

        prm = cached_get(ref)
        vals = t.column(value_col).to_pylist()
        return t.append_column(
            out_col, pa.array([prm[v] for v in vals], pa.float64()))

    return ds.map_batches(annotate_task, batch_format="pyarrow",
                          fn_kwargs={"ref": ref})


def mutual_information(ds, a_col: str, b_col: str) -> float:
    """Mutual information (nats) between two categorical columns — the
    dataset-audit dependence metric (does `lang` leak `source`?).  One
    ``groupby(a, b).count`` shuffle; the driver sees only the |A|×|B|
    contingency cells and the two marginals derived from them.  Per-cell
    doubles mirror the SQL replay's parenthesization exactly; callers
    quantize the final sum (summation order is the only difference)."""
    cells = ds.groupby([a_col, b_col]).count().to_pandas()
    if cells.empty:
        return 0.0
    nxy = cells["count()"].astype(int)
    n = int(nxy.sum())
    na = cells.groupby(a_col)["count()"].transform("sum").astype(int)
    nb = cells.groupby(b_col)["count()"].transform("sum").astype(int)
    total = 0.0
    for cxy, ca, cb in zip(nxy, na, nb):
        total += (float(cxy) / float(n)) * math.log(
            (float(cxy) * float(n)) / (float(ca) * float(cb)))
    return total


def population_stability_index(ds_a, ds_b, value_col: str, lo: float,
                               hi: float, nbins: int) -> float:
    """Population Stability Index between two datasets' distributions of
    ``value_col`` over a fixed-width binning — the standard
    score/feature drift monitor (PSI = Σ (p−q)·ln(p/q); <0.1 stable,
    >0.25 shifted).  Two histogram_column passes (per-batch pre-combined
    bucket counts, one tiny grouped Sum each); only 2·nbins integers
    reach the driver.  Buckets empty on either side are skipped (the
    no-epsilon convention), mirrored exactly by the SQL replay; callers
    quantize the final sum."""
    ha = histogram_column(ds_a, value_col, lo, hi, nbins).to_pandas()
    hb = histogram_column(ds_b, value_col, lo, hi, nbins).to_pandas()
    ca = dict(zip(ha["bucket"].astype(int), ha["n"].astype(int)))
    cb = dict(zip(hb["bucket"].astype(int), hb["n"].astype(int)))
    na, nb = sum(ca.values()), sum(cb.values())
    if na == 0 or nb == 0:
        return 0.0
    total = 0.0
    for b in range(nbins):
        x, y = ca.get(b, 0), cb.get(b, 0)
        if x > 0 and y > 0:
            p = float(x) / float(na)
            q = float(y) / float(nb)
            total += (p - q) * math.log(p / q)
    return total


def ks_statistic(ds_a, ds_b, value_col: str) -> float:
    """Two-sample Kolmogorov–Smirnov statistic sup|ECDF_a − ECDF_b| over
    an integer-valued column — the distribution-shift test that
    complements PSI (no binning choice).  Each side reduces to a
    (value, count) frequency table via one grouped Sum (driver sees
    O(#distinct values)); the sup runs over the merged sorted value set
    with exact-integer cumulative counts, so each candidate |diff| is a
    deterministic double and only comparisons (not sums) order the
    result."""
    def freq(ds):
        f = ds.groupby(value_col).count().to_pandas()
        return dict(zip(f[value_col], f["count()"].astype(int)))

    fa, fb = freq(ds_a), freq(ds_b)
    na, nb = sum(fa.values()), sum(fb.values())
    if na == 0 or nb == 0:
        return 0.0
    best = 0.0
    ca = cb = 0
    for v in sorted(set(fa) | set(fb)):
        ca += fa.get(v, 0)
        cb += fb.get(v, 0)
        d = abs(float(ca) / float(na) - float(cb) / float(nb))
        if d > best:
            best = d
    return best


def zscore_per_group(ds, group_col: str, value_col: str,
                     out_col: str | None = None, scale: int = 100):
    """Per-GROUP z-score standardization (normalize scores within each
    language/source before a global threshold).  Same exact-integer
    cents-moments trick as zscore_column, per group: one
    ``groupby(group).sum`` over (n, Σc, Σc²) partials pre-combined in
    every batch, a broadcast {group: (mu, sigma)} map (O(#groups)), and
    a rewrite pass — order-free, hash-identical to the SQL window
    replay.  Zero-variance groups → 0.0."""
    import ray

    from ray.data.aggregate import Sum

    out_col = out_col or f"z_{value_col}"

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        c = np.floor(v * scale + 0.5).astype(np.int64)
        g = t.column(group_col).to_pylist()
        agg: dict = {}
        for gi, ci in zip(g, c):
            n, s, ss = agg.get(gi, (0, 0, 0))
            agg[gi] = (n + 1, s + int(ci), ss + int(ci) * int(ci))
        ks = list(agg.keys())
        return pa.table({
            group_col: pa.array(ks),
            "n": pa.array([agg[k][0] for k in ks], pa.int64()),
            "s": pa.array([agg[k][1] for k in ks], pa.int64()),
            "ss": pa.array([agg[k][2] for k in ks], pa.int64()),
        })

    stats = (ds.select_columns([group_col, value_col])
             .map_batches(partial, batch_format="pyarrow")
             .groupby(group_col, num_partitions=8)
             .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                        Sum("ss", alias_name="ss"))
             .to_pandas())  # O(#groups)
    params = {}
    for g, n, s, ss in zip(stats[group_col], stats["n"], stats["s"],
                           stats["ss"]):
        mu = float(s) / float(n)
        var = float(ss) / float(n) - mu * mu
        params[g] = (mu, float(np.sqrt(var)) if var > 0 else 0.0)
    ref = ray.put(params)

    # plain tasks + per-worker broadcast cache (ops/bcast.py): the
    # (1, 8) actor pool never grew past 1 actor and paid its spawn
    def rewrite_task(t: pa.Table, *, ref) -> pa.Table:
        from .bcast import cached_get

        params = cached_get(ref)
        v = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        c = np.floor(v * scale + 0.5)
        g = t.column(group_col).to_pylist()
        out = np.empty(len(c))
        for i, gi in enumerate(g):
            mu, sigma = params[gi]
            out[i] = (c[i] - mu) / sigma if sigma > 0 else 0.0
        return t.append_column(out_col, pa.array(out, pa.float64()))

    return ds.map_batches(rewrite_task, batch_format="pyarrow",
                          fn_kwargs={"ref": ref})


def robust_scale_column(ds, value_col: str, out_col: str | None = None,
                        exact_threshold: int = 2_000_000,
                        num_points: int = 1024):
    """Median/IQR robust standardization — the outlier-insensitive
    normalizer (z-score's median cousin): (v − median)/(q75 − q25).

    Quantiles come from the same two-path plan as
    global_quantile_threshold: exact linear-interpolation (bit-identical
    to DuckDB ``quantile_cont``) when the row count fits
    ``exact_threshold`` — only the VALUE COLUMN is collected — and the
    mergeable order-statistic summary above it.  The per-row rescale is
    deterministic double arithmetic, so the exact path hash-matches SQL
    with no quantization.  Zero IQR → 0.0 everywhere."""
    out_col = out_col or f"robust_{value_col}"
    total = ds.count()
    if total == 0:
        q1 = med = q3 = 0.0
    elif total <= exact_threshold:
        vals = np.concatenate([
            b.column(value_col).to_numpy(zero_copy_only=False)
            for b in ds.select_columns([value_col]).iter_batches(
                batch_size=1 << 16, batch_format="pyarrow")
        ])
        q1 = float(np.quantile(vals, 0.25, method="linear"))
        med = float(np.quantile(vals, 0.5, method="linear"))
        q3 = float(np.quantile(vals, 0.75, method="linear"))
    else:
        from .sketch import distributed_quantile

        q1 = distributed_quantile(ds, value_col, 0.25, num_points=num_points)
        med = distributed_quantile(ds, value_col, 0.5, num_points=num_points)
        q3 = distributed_quantile(ds, value_col, 0.75, num_points=num_points)
    iqr = q3 - q1

    def rewrite(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        z = (v - med) / iqr if iqr > 0 else np.zeros(len(v))
        return t.append_column(out_col, pa.array(z, pa.float64()))

    return ds.map_batches(rewrite, batch_format="pyarrow")


def histogram_column(ds, value_col: str, lo: float, hi: float, nbins: int):
    """Fixed-width histogram: Dataset[(bucket:int64, n:int64)] with
    bucket = clip(floor((v − lo)/width), 0, nbins−1), width =
    (hi − lo)/nbins.  Per-batch vectorized bucket counts pre-combine
    into (bucket, partial n) rows, one tiny ``groupby(bucket).sum`` —
    the shuffle carries ≤ blocks×nbins rows regardless of input size.
    Every float op is the identical double expression in SQL, so the
    counts hash-match with no quantization."""
    from ray.data.aggregate import Sum

    width = (float(hi) - float(lo)) / float(nbins)

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(np.floor((v - lo) / width), 0, nbins - 1).astype(np.int64)
        idx, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(idx, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    return (ds.select_columns([value_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").aggregate(Sum("n", alias_name="n")))


# ------------------------------------------------------- top-k / quantile
def top_k(ds, column: str, k: int, descending: bool = True):
    """_B2_Filtering/utils.py:4-29 filter_top_n — global sort + limit.
    Ray's sort is a distributed range-partitioned shuffle; k rows reach
    the driver."""
    return ds.sort(column, descending=descending).limit(k)


def global_quantile_threshold(ds, column: str, q: float, keep: str = "ge",
                              exact_threshold: int = 2_000_000,
                              num_points: int = 1024):
    """Two-pass global quantile filter — the corrected version of the
    reference's per-shard percentile (fasttext_operator.py:148-152).

    Pass 1 computes the threshold: row counts ≤ ``exact_threshold``
    collect only the score column and take the EXACT linear-interpolation
    quantile (bit-identical to DuckDB ``quantile_cont``); larger inputs
    use the distributed mergeable order-statistic summary
    (ops.sketch.distributed_quantile — map_batches partials → tree merge,
    driver memory O(fanin·num_points), rank error ≈ 1/num_points).
    Pass 2 is a vectorized filter.
    """
    total = ds.count()
    if total == 0:
        return ds, float("nan")
    if total <= exact_threshold:
        vals = np.concatenate(
            [
                b.column(column).to_numpy(zero_copy_only=False)
                for b in ds.select_columns([column]).iter_batches(
                    batch_size=1 << 16, batch_format="pyarrow"
                )
            ]
        )
        thr = float(np.quantile(vals, q, method="linear"))
    else:
        from .sketch import distributed_quantile

        thr = distributed_quantile(ds, column, q, num_points=num_points)

    def f(batch: pa.Table) -> pa.Table:
        col = batch.column(column)
        mask = pc.greater_equal(col, thr) if keep == "ge" else pc.less_equal(col, thr)
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow"), thr


def repartition_by_length(ds, text_col: str, blocks_per_cpu: int = 4):
    """Tame text-length skew ahead of token-cost-proportional stages (the
    caption-length skew named in the north rule): globally sort by text
    length, then split into many MORE blocks than cores.  Each downstream
    batch is length-homogeneous (uniform token budget within a task) and
    the dynamic scheduler balances the cheap-short vs expensive-long
    blocks across workers — the standard length-bucketing fix for
    heavy-tailed inputs.  One range-partitioned sort shuffle; use only
    when the length distribution is genuinely heavy-tailed."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8

    def add_len(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_text_len", pc.utf8_length(batch.column(text_col)).cast(pa.int64())
        )

    return (
        ds.map_batches(add_len, batch_format="pyarrow")
        .sort("_text_len")
        .repartition(cpus * blocks_per_cpu)
        .drop_columns(["_text_len"])
    )


# --------------------------------------------------------------- set ops
def union_all(datasets: list):
    """concatenate operator (concatenate_operator.py:31-97)."""
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out


def union_tagged(tagged: list[tuple], tag_col: str = "source_tag"):
    """mix/concatenate with provenance column (mix_operator.py:33-104)."""
    parts = []
    for tag, d in tagged:
        parts.append(add_constant_columns(d, {tag_col: tag}))
    return union_all(parts)


def mix(datasets: list, seed: int = 42):
    """mix operator — union + global seeded shuffle."""
    return union_all(datasets).random_shuffle(seed=seed)


# ----------------------------------------------------------------- joins
def broadcast_join(ds, right: pd.DataFrame, on: str, how: str = "left",
                   columns: list[str] | None = None):
    """Small right side: broadcast via ray.put once, zero-copy Arrow
    ``Table.join`` per batch (the reference's domain-set lookup,
    WebInstruct/utils.py:170-192, and MergeOperator semantics for small
    sides, merge_operator.py:88-168).  No shuffle, no pandas round-trip.
    ``how`` follows pandas names and is restricted to left/inner: the
    join runs independently per batch, so right/full-outer semantics
    (emit unmatched RIGHT rows exactly once) are impossible here — each
    batch would re-emit them (ADVICE r2).  Use hash_join for those."""
    import ray

    if how not in ("left", "inner"):
        raise ValueError(
            f"broadcast_join supports how='left'/'inner' only, got {how!r}; "
            "right/outer need a global join — use hash_join")
    if columns is not None:
        right = right[columns]
    right_tbl = pa.Table.from_pandas(right, preserve_index=False)
    right_ref = ray.put(right_tbl)
    join_type = {"left": "left outer", "inner": "inner"}[how]

    def join(batch: pa.Table, right_local=[]) -> pa.Table:
        # per-process lazy fetch of the broadcast table (plain tasks:
        # no actor pool to launch; worker processes are reused)
        if not right_local:
            right_local.append(ray.get(right_ref))
        # Arrow joins don't define output row order — downstream
        # consumers must not rely on it (aggregates and the sorted
        # hash-compare don't)
        return batch.join(right_local[0], keys=on, join_type=join_type)

    return ds.map_batches(join, batch_format="pyarrow")


def hash_join(left, right, on: str, num_partitions: int = 16,
              join_type: str = "inner"):
    """Both sides large: Ray Data's hash-partitioned join (shuffles both
    sides on the key; pick num_partitions ≈ total cores) behind the
    empty-first-block guard (ops/joinsafe.py)."""
    from .joinsafe import safe_join

    return safe_join(left, right, join_type=join_type,
                     num_partitions=num_partitions, on=(on,))


def semi_anti_join_broadcast(ds, keys, column: str, anti: bool = False):
    """Semi/anti join against a broadcast key set — the decontamination
    pattern (open_thoughts/decontaminate.py:12-59): drop (anti) or keep
    (semi) rows whose ``column`` value is in ``keys``."""
    import ray

    keys_ref = ray.put(pa.array(list(set(keys))))

    # plain tasks + per-worker broadcast cache (ops/bcast.py)
    def f_task(batch: pa.Table, *, keys_ref) -> pa.Table:
        from .bcast import cached_get

        keys = cached_get(keys_ref)
        col = batch.column(column)
        if col.type != keys.type:
            col = col.cast(keys.type)
        mask = pc.is_in(col, value_set=keys)  # vectorized kernel
        if anti:
            mask = pc.invert(mask)
        return batch.filter(pc.fill_null(mask, anti))

    return ds.map_batches(f_task, batch_format="pyarrow",
                          fn_kwargs={"keys_ref": keys_ref}, num_cpus=0.5)


def pivot_count(ds, row_key: str, col_key: str, values: list[str]):
    """Wide count pivot: one row per ``row_key``, one ``n_<v>`` column
    per v in ``values`` — SQL ``count(*) FILTER (WHERE col = v) GROUP BY
    row_key``.  Indicator columns are built per batch so the shuffle is
    an ordinary pre-aggregated groupby (partial sums combine per block);
    the values list is fixed up front (the SQL PIVOT IN-list) so the
    output schema is static."""
    from ray.data.aggregate import Sum

    def ind(t: pa.Table) -> pa.Table:
        col = t.column(col_key)
        out = {row_key: t.column(row_key)}
        for v in values:
            out[f"n_{v}"] = pc.cast(pc.equal(col, v), pa.int64())
        return pa.table(out)

    aggs = [Sum(f"n_{v}", alias_name=f"n_{v}") for v in values]
    return ds.map_batches(ind, batch_format="pyarrow").groupby(
        row_key).aggregate(*aggs)


def grouped_quantile(ds, group_col: str, value_col: str, q: float,
                     out_col: str | None = None):
    """Exact per-group quantile with linear interpolation (DuckDB
    ``quantile_cont`` / numpy ``method='linear'`` semantics).  Like
    grouped_median this is non-mergeable: ONE ``hash(key) % P`` shuffle
    carrying (group, value) only; one C-level pandas
    ``groupby().quantile()`` per partition covers every key (no per-key
    dispatch — ops/segment.py plan)."""
    from .segment import partitioned_groups

    out_col = out_col or f"q{int(q * 100)}_{value_col}"

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(group_col, sort=False)[value_col]
               .quantile(q, interpolation="linear").reset_index())
        out.columns = [group_col, out_col]
        out[out_col] = out[out_col].astype("float64")
        return out

    return partitioned_groups(ds, group_col, per_partition,
                              cols=[group_col, value_col])


def grouped_nunique(ds, group_col: str, value_col: str,
                    out_col: str | None = None):
    """Exact ``count(DISTINCT v) GROUP BY g`` — distinct (g, v) pairs
    first (pre-aggregated groupby, shuffle carries unique pairs), then a
    small per-group count.  Two shuffles is the price of exactness; the
    HLL sketch path (ops/sketch.py) is the one-pass approximate
    alternative for open-domain values."""
    from ray.data.aggregate import Count

    out_col = out_col or f"n_distinct_{value_col}"
    pairs = ds.select_columns([group_col, value_col]).groupby(
        [group_col, value_col]).aggregate(Count(alias_name="_c"))
    return pairs.drop_columns(["_c"]).groupby(group_col).aggregate(
        Count(alias_name=out_col))


def grouped_ntile(ds, group_col: str, order_cols: list[str], n: int,
                  out_col: str = "tile"):
    """SQL ``NTILE(n) OVER (PARTITION BY g ORDER BY ...)``: rows of each
    group split into ``n`` ordered tiles, the first ``m % n`` tiles one
    row larger (DuckDB/ANSI semantics).  ``order_cols`` must define a
    total order within each group for a deterministic result.  ONE
    ``hash(key) % P`` shuffle; each partition sorts once by
    (group, order) and assigns every key's tiles with one closed-form
    numpy expression over segment-relative positions — no per-key
    dispatch (ops/segment.py plan)."""
    from .segment import partitioned_groups, segment_bounds

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col] + order_cols, kind="mergesort")
        keys = g[group_col].to_numpy()
        ln = len(keys)
        g = g.copy()
        if ln == 0:
            g[out_col] = np.zeros(0, dtype="int64")
            return g
        bounds = segment_bounds(keys)
        counts = np.diff(bounds)
        pos = np.arange(ln) - np.repeat(bounds[:-1], counts)  # rank in group
        m = np.repeat(counts, counts)                          # group size
        q, r = m // n, m % n
        thresh = r * (q + 1)            # rows covered by the larger tiles
        qsafe = np.maximum(q, 1)        # q=0 ⇒ all rows are below thresh
        g[out_col] = np.where(pos < thresh, pos // (q + 1),
                              r + (pos - thresh) // qsafe) + 1
        return g

    return partitioned_groups(ds, group_col, per_partition)


def grouped_string_agg(ds, group_col: str, value_col: str, sep: str,
                       out_col: str | None = None,
                       distinct_sorted: bool = True):
    """Order-sensitive concatenation per group (SQL ``string_agg(DISTINCT
    v, sep ORDER BY v)``): deterministic because values are de-duplicated
    and sorted before joining.  ONE ``hash(key) % P`` shuffle of
    (group, value); each partition sorts once, drops duplicate pairs
    vectorized, and joins each key's segment (string concat is inherently
    per-group work, but there is no per-key pandas/Ray dispatch —
    ops/segment.py plan)."""
    from .segment import partitioned_groups, segment_bounds

    out_col = out_col or f"agg_{value_col}"

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g[value_col] = g[value_col].astype(str)
        g = g.sort_values([group_col, value_col], kind="mergesort")
        if distinct_sorted:
            g = g.drop_duplicates([group_col, value_col])
        keys = g[group_col].to_numpy()
        vals = g[value_col].to_numpy(dtype=object)
        if len(keys) == 0:
            return pd.DataFrame({group_col: [], out_col: []}).astype(
                {group_col: keys.dtype, out_col: "object"})
        bounds = segment_bounds(keys)
        return pd.DataFrame({
            group_col: keys[bounds[:-1]],
            out_col: [sep.join(vals[s:e])
                      for s, e in zip(bounds[:-1], bounds[1:])],
        })

    return partitioned_groups(ds, group_col, per_partition,
                              cols=[group_col, value_col])


# ------------------------------------------------------------- aggregates
def grouped_count_having(ds, group_cols, min_count: int = 0,
                         count_name: str = "n"):
    """The domain-count pattern (WebInstruct/utils.py:122-167):
    groupby → count → HAVING count ≥ min.  Ray pre-aggregates partial
    counts per block before the shuffle (built into groupby.count)."""
    from ray.data.aggregate import Count

    out = ds.groupby(group_cols).aggregate(Count(alias_name=count_name))
    if min_count > 1:
        out = out.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column(count_name), min_count)),
            batch_format="pyarrow",
        )
    return out


def tumbling_window_agg(ds, ts_col: str, key_col: str, window_s: int, aggs):
    """Streaming-shaped tumbling window as a grouped aggregate: bucket =
    floor(epoch(ts)/window)·window (int64 seconds), then groupby
    (key, bucket).  Ray Data has no event-time watermarks; the input is
    treated as a complete partitioned log (ray_guide.md streaming note).
    """

    def bucketize(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64())  # µs since epoch
        bucket = pc.multiply(pc.divide(ts, 1_000_000 * window_s), window_s)
        return batch.append_column("window_start", bucket.cast(pa.int64()))

    return ds.map_batches(bucketize, batch_format="pyarrow").groupby(
        [key_col, "window_start"]
    ).aggregate(*aggs)
