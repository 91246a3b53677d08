"""Nested conversation-format converters (list<struct> columns).

The reference's format-conversion family (dcft/data_strategies/commons.py):
ShareGPT ``[{from, value}]`` ↔ OpenAI ``[{role, content}]`` (:31-39,
:118-128), Alpaca instruction/input/output → ShareGPT (:145-166),
ShareGPT ↔ flat instruction/response columns (:212-303).

All converters are ``map_batches`` functions over ``batch_format=
"pyarrow"`` — nested list-of-struct columns round-trip losslessly through
Arrow (they degrade to object dtype in pandas, ray_guide pitfall), and the
transforms are pure per-row structure rewrites done on Python lists
(nested data; no vectorized kernel exists) with explicit Arrow types on
the way out so empty batches keep a stable schema.
"""

from __future__ import annotations

import pyarrow as pa

SHAREGPT_TYPE = pa.list_(
    pa.struct([("from", pa.string()), ("value", pa.string())])
)
OPENAI_TYPE = pa.list_(
    pa.struct([("role", pa.string()), ("content", pa.string())])
)

_ROLE_TO_FROM = {"user": "human", "assistant": "gpt", "system": "system"}
_FROM_TO_ROLE = {"human": "user", "gpt": "assistant", "system": "system"}


def openai_to_sharegpt(batch: pa.Table, column: str = "conversations") -> pa.Table:
    """commons.py:31-39 — [{role, content}] → [{from, value}]."""
    convs = batch.column(column).to_pylist()
    out = [
        [
            {"from": _ROLE_TO_FROM.get(m["role"], m["role"]), "value": m["content"]}
            for m in (conv or [])
        ]
        for conv in convs
    ]
    i = batch.schema.get_field_index(column)
    return batch.set_column(i, column, pa.array(out, SHAREGPT_TYPE))


def sharegpt_to_openai(batch: pa.Table, column: str = "conversations") -> pa.Table:
    """commons.py:118-128 — [{from, value}] → [{role, content}]."""
    convs = batch.column(column).to_pylist()
    out = [
        [
            {"role": _FROM_TO_ROLE.get(m["from"], m["from"]), "content": m["value"]}
            for m in (conv or [])
        ]
        for conv in convs
    ]
    i = batch.schema.get_field_index(column)
    return batch.set_column(i, column, pa.array(out, OPENAI_TYPE))


def alpaca_to_sharegpt(batch: pa.Table, instruction_col: str = "instruction",
                       input_col: str = "input", output_col: str = "output",
                       out: str = "conversations") -> pa.Table:
    """commons.py:145-166 — instruction(+input)/output → 2-turn ShareGPT."""
    names = batch.schema.names
    instr = batch.column(instruction_col).to_pylist()
    inputs = batch.column(input_col).to_pylist() if input_col in names else [""] * len(instr)
    outputs = batch.column(output_col).to_pylist()
    convs = []
    for ins, inp, o in zip(instr, inputs, outputs):
        human = f"{ins}\n{inp}" if inp else ins
        convs.append([{"from": "human", "value": human},
                      {"from": "gpt", "value": o}])
    return batch.append_column(out, pa.array(convs, SHAREGPT_TYPE))


def sharegpt_to_instruction_response(batch: pa.Table,
                                     column: str = "conversations",
                                     instruction_col: str = "instruction",
                                     response_col: str = "response") -> pa.Table:
    """commons.py:212-246 — first human turn → instruction, first gpt turn
    → response."""
    convs = batch.column(column).to_pylist()
    instr, resp = [], []
    for conv in convs:
        h = next((m["value"] for m in (conv or []) if m["from"] == "human"), "")
        g = next((m["value"] for m in (conv or []) if m["from"] == "gpt"), "")
        instr.append(h)
        resp.append(g)
    batch = batch.append_column(instruction_col, pa.array(instr, pa.string()))
    return batch.append_column(response_col, pa.array(resp, pa.string()))


def instruction_response_to_sharegpt(batch: pa.Table,
                                     instruction_col: str = "instruction",
                                     response_col: str = "response",
                                     system_prompt: str | None = None,
                                     out: str = "conversations") -> pa.Table:
    """commons.py:249-303 (with optional system prompt variant)."""
    instr = batch.column(instruction_col).to_pylist()
    resp = batch.column(response_col).to_pylist()
    convs = []
    for ins, r in zip(instr, resp):
        conv = []
        if system_prompt is not None:
            conv.append({"from": "system", "value": system_prompt})
        conv.append({"from": "human", "value": ins})
        conv.append({"from": "gpt", "value": r})
        convs.append(conv)
    return batch.append_column(out, pa.array(convs, SHAREGPT_TYPE))


def reasoning_trace_to_final(batch: pa.Table, reasoning_col: str = "reasoning",
                             solution_col: str = "solution",
                             out: str = "final") -> pa.Table:
    """commons.py:481-491 — '<think>…</think>…' template concat."""
    rs = batch.column(reasoning_col).to_pylist()
    ss = batch.column(solution_col).to_pylist()
    vals = [f"<think>\n{r}\n</think>\n\n{s}" for r, s in zip(rs, ss)]
    return batch.append_column(out, pa.array(vals, pa.string()))


def final_to_reasoning_trace(batch: pa.Table, column: str = "final",
                             reasoning_col: str = "reasoning",
                             solution_col: str = "solution") -> pa.Table:
    """commons.py:494-515 — regex extraction of the two delimited spans."""
    import re

    rx = re.compile(r"<think>\n?(.*?)\n?</think>\n*(.*)\Z", re.DOTALL)
    texts = batch.column(column).to_pylist()
    rs, ss = [], []
    for t in texts:
        m = rx.search(t or "")
        rs.append(m.group(1) if m else "")
        ss.append(m.group(2) if m else (t or ""))
    batch = batch.append_column(reasoning_col, pa.array(rs, pa.string()))
    return batch.append_column(solution_col, pa.array(ss, pa.string()))
