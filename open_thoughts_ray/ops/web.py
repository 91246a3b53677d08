"""URL / domain operators — the reference's WebInstruct domain tooling
rebuilt Ray-Data-first:

* ``extract_root_domain``  — WebInstruct/utils.py:104-119 (netloc →
  strip ``www.`` → last two labels).
* ``annotate_frequent_domains`` — the count_domains_per_shard →
  sum_and_filter_low_frequency_domains → broadcast-membership pipeline
  (WebInstruct/utils.py:122-192, wired in webinstruct_stage_1_3.yaml):
  partial per-batch domain counts, one keyed groupby sum with a HAVING
  floor, frequent set broadcast back as a vectorized ``pc.is_in``
  annotate.  Driver state is O(#frequent domains), never row-sized.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_URL_HOST_RE = re.compile(r"^[a-z][a-z0-9+.\-]*://([^/?#]+)")


def extract_root_domain(url: str) -> str:
    """Root domain of a URL: scheme-prefixed host, lowercased, ``www.``
    stripped, last two dot-labels.  Empty string when no host parses —
    the rule is deliberately regex-only so an ANSI-SQL engine replays it
    (regexp_extract + string_split)."""
    m = _URL_HOST_RE.match(url.lower())
    if not m:
        return ""
    host = m.group(1)
    if host.startswith("www."):
        host = host[4:]
    labels = host.split(".")
    return ".".join(labels[-2:])


def extract_domain_batch(batch: pa.Table, url_col: str = "url",
                         out: str = "root_domain") -> pa.Table:
    urls = batch.column(url_col).to_pylist()
    doms = [extract_root_domain(u or "") for u in urls]
    return batch.append_column(out, pa.array(doms, pa.string()))


def _partial_domain_counts(batch: pa.Table, url_col: str) -> pa.Table:
    counts: dict[str, int] = {}
    for u in batch.column(url_col).to_pylist():
        d = extract_root_domain(u or "")
        counts[d] = counts.get(d, 0) + 1
    return pa.table({"root_domain": pa.array(list(counts), pa.string()),
                     "c": pa.array(list(counts.values()), pa.int64())})


def frequent_domains(ds, url_col: str = "url", min_count: int = 2) -> set:
    """Domains appearing ≥ min_count times: partial counts → grouped sum
    → HAVING filter → driver set (bounded by #frequent domains)."""
    from ray.data.aggregate import Sum

    grouped = (ds.select_columns([url_col])
               .map_batches(_partial_domain_counts, batch_format="pyarrow",
                            fn_kwargs={"url_col": url_col})
               .groupby("root_domain").aggregate(Sum("c", alias_name="n")))
    kept = grouped.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n"), min_count))
                   .select(["root_domain"]),
        batch_format="pyarrow")
    return set(kept.to_pandas()["root_domain"])


def annotate_frequent_domains(ds, url_col: str = "url", min_count: int = 2,
                              domain_out: str = "root_domain",
                              flag_out: str = "is_frequent_domain"):
    """Append the root domain and a frequent-domain membership flag.
    The frequent set rides in task closures (broadcast), membership is
    one vectorized ``pc.is_in`` per batch."""
    freq = frequent_domains(ds, url_col, min_count)
    value_set = pa.array(sorted(freq), pa.string())

    def annotate(t: pa.Table) -> pa.Table:
        t = extract_domain_batch(t, url_col, domain_out)
        flags = pc.is_in(t.column(domain_out), value_set=value_set)
        return t.append_column(flag_out, flags)

    return ds.map_batches(annotate, batch_format="pyarrow")
