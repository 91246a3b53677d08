"""Tree search over a prompt Dataset — the reference's `tree_search`
operator (engine/operators/tree_search_operator.py:22-226: abstract
BFS with beam_width / beam_depth / node_budget and per-node LLM
expansion) re-expressed Ray-Data-first.

The reference runs ONE Python BFS loop per prompt (a `search_prompt`
ray task per row; every expansion a further blocking `ray.get`).  The
Dataset shape is LEVEL-SYNCHRONOUS: every prompt's frontier expands in
ONE batched `completions` pass per depth level, so a 10⁶-prompt corpus
makes `beam_depth` annotation passes total instead of 10⁶ sequential
node loops — same visited set per prompt, batched inference, streaming
memory.

Semantics honored per prompt (matching the reference loop):
* root = one LLM "initial step" per prompt (get_initial_state);
* each non-terminal node expands into ≤ ``beam_width`` successors
  (get_successors truncation, :200-202);
* nodes at ``beam_depth`` are not expanded (:193-196);
* terminal nodes stop expanding (is_terminal, :188-191);
* ``node_budget`` caps the VISITED set per prompt in BFS order
  (level, then insertion order — :175-181), and un-visited nodes
  never expand;
* output rows carry (prompt id, steps trace, is_terminal, depth) —
  the reference's result schema (:212-221).

``is_terminal`` is a pluggable deterministic predicate on the step
text (default: last hex digit of the step == '0' ≈ 1/16 of mock
steps; a real deployment passes e.g. "contains the final-answer
marker").  With the md5-mock backend the whole tree is a pure
function of the prompts, so runs are bit-reproducible (asserted in
tests); the per-stage building blocks (ListMap fan-out, ChatMap) are
hash-checked by the llm_list_fanout / llm_annotate gate queries.
"""

from __future__ import annotations

import pyarrow as pa


def _default_is_terminal(step: str) -> bool:
    return bool(step) and step[-1] == "0"


def tree_search(ds, prompt_col: str = "instruction",
                id_col: str = "doc_id", beam_width: int = 3,
                beam_depth: int = 2, node_budget: int | None = None,
                is_terminal=None, backend: str = "mock",
                backend_kwargs: dict | None = None,
                concurrency: int | tuple = 2, batch_size: int = 256):
    """Dataset[(id, prompt)] → Dataset[(id, steps:list<str>,
    is_terminal:bool, depth:int)] — every VISITED node, one row each."""
    from .completions import completions

    term = is_terminal or _default_is_terminal

    root = completions(
        ds.select_columns([id_col, prompt_col]), "chat",
        {"user_message": "Initial reasoning step for: {{" + prompt_col
         + "}}", "output_column": "_step"},
        backend=backend, backend_kwargs=backend_kwargs,
        concurrency=concurrency, batch_size=batch_size)

    def to_node(t: pa.Table) -> pa.Table:
        steps = pa.array([[s] for s in t.column("_step").to_pylist()],
                         pa.list_(pa.string()))
        return pa.table({
            id_col: t.column(id_col),
            prompt_col: t.column(prompt_col),
            "steps": steps,
            "is_terminal": pa.array(
                [term(s) for s in t.column("_step").to_pylist()],
                pa.bool_()),
            "depth": pa.array([0] * t.num_rows, pa.int64()),
        })

    frontier = root.map_batches(to_node, batch_format="pyarrow") \
        .materialize()
    visited = [frontier]
    budget_left = None
    if node_budget is not None:
        # roots always count; per-prompt remaining budget is tracked
        # level-by-level (BFS order = level order, matching the
        # reference's FIFO container)
        budget_left = {r[id_col]: node_budget - 1
                       for r in frontier.select_columns([id_col])
                       .take_all()}

    for _level in range(beam_depth):
        live = frontier.filter(lambda r: not r["is_terminal"])
        if live.count() == 0:
            break

        def trace_col(t: pa.Table) -> pa.Table:
            texts = [" | ".join(s) for s in t.column("steps").to_pylist()]
            return t.append_column("_trace", pa.array(texts, pa.string()))

        expanded = completions(
            live.map_batches(trace_col, batch_format="pyarrow"), "list",
            {"user_message": "Continue the reasoning.\nProblem: {{"
             + prompt_col + "}}\nSteps so far: {{_trace}}",
             "output_column": "_next", "num_items": beam_width},
            backend=backend, backend_kwargs=backend_kwargs,
            concurrency=concurrency, batch_size=batch_size)

        def child_rows(t: pa.Table) -> pa.Table:
            ids, prompts, steps, terms, depths = [], [], [], [], []
            for i in range(t.num_rows):
                s = list(t.column("steps")[i].as_py()) + \
                    [t.column("_next")[i].as_py()]
                ids.append(t.column(id_col)[i].as_py())
                prompts.append(t.column(prompt_col)[i].as_py())
                steps.append(s)
                terms.append(term(s[-1]))
                depths.append(t.column("depth")[i].as_py() + 1)
            return pa.table({
                id_col: pa.array(ids, t.schema.field(id_col).type),
                prompt_col: pa.array(prompts, pa.string()),
                "steps": pa.array(steps, pa.list_(pa.string())),
                "is_terminal": pa.array(terms, pa.bool_()),
                "depth": pa.array(depths, pa.int64()),
            })

        children = expanded.map_batches(child_rows,
                                        batch_format="pyarrow")
        if budget_left is not None:
            # enforce the per-prompt visited cap with a DETERMINISTIC
            # within-level order (children ranked by full trace text —
            # the reference's FIFO order depends on dataset iteration
            # order, so any fixed tie-break is an equally valid BFS).
            # The budget map is O(#prompts) driver state — the same
            # bookkeeping the reference keeps per prompt loop; beam
            # trees are budget-bounded per prompt by construction.
            import ray as _ray

            from ..ops.segment import partitioned_groups

            def add_key(t: pa.Table) -> pa.Table:
                keys = [" | ".join(s)
                        for s in t.column("steps").to_pylist()]
                return t.append_column("_key",
                                       pa.array(keys, pa.string()))

            def rank_partition(t: pa.Table) -> pa.Table:
                # arrow-native (the pandas path mangles the list<string>
                # steps column); rank = position within (id, _key) order
                import numpy as np

                ids = np.asarray(t.column(id_col).to_pylist(),
                                 dtype=object)
                keys = np.asarray(t.column("_key").to_pylist(),
                                  dtype=object)
                order = np.lexsort((keys, ids))
                rank = np.empty(len(ids), dtype=np.int64)
                pos = 0
                prev = None
                for j in order:
                    if ids[j] != prev:
                        pos = 0
                        prev = ids[j]
                    rank[j] = pos
                    pos += 1
                return t.append_column("_rank",
                                       pa.array(rank, pa.int64()))

            ranked = partitioned_groups(
                children.map_batches(add_key, batch_format="pyarrow"),
                id_col, rank_partition,
                batch_format="pyarrow").materialize()
            left_ref = _ray.put(dict(budget_left))

            def under_budget(t: pa.Table) -> pa.Table:
                from ..ops.bcast import cached_get

                left = cached_get(left_ref)
                m = [r < left.get(i, 0) for i, r in
                     zip(t.column(id_col).to_pylist(),
                         t.column("_rank").to_pylist())]
                return t.filter(pa.array(m, pa.bool_()))

            children = ranked.map_batches(
                under_budget, batch_format="pyarrow")                 .drop_columns(["_key", "_rank"]).materialize()
            # driver update: kept counts per prompt (level-bounded thin
            # projection; empty level → nothing to subtract)
            kdf = children.select_columns([id_col]).to_pandas()
            if id_col in kdf.columns:
                for k, v in kdf[id_col].value_counts().items():
                    budget_left[k] = budget_left.get(k, 0) - int(v)
        else:
            children = children.materialize()
        if children.count() == 0:
            break
        visited.append(children)
        frontier = children

    out = visited[0]
    for v in visited[1:]:
        out = out.union(v)
    return out.select_columns([id_col, "steps", "is_terminal", "depth"])
