"""Completions operator + CompletionsMap registry (SURVEY.md §2.5):
templating, structured parse maps, fan-out, retries, parse-failure
handling, shared rate limiting, and end-to-end Dataset annotation."""

import hashlib
import time

import pandas as pd
import pyarrow as pa
import pytest

from open_thoughts_ray.llm import (
    CompletionsActor,
    MockLLMBackend,
    build_map,
    canonical_prompt,
    completions,
    fill_template,
    register_map,
    shared_rate_limiter,
)
from open_thoughts_ray.llm.maps import ChatMap


def md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_fill_template():
    assert fill_template("Hello {{name}}, age {{age}}", {"name": "A", "age": 3}) \
        == "Hello A, age 3"


def test_chat_map_prompt_and_parse():
    m = build_map("chat", {"user_message": "Summarize: {{text}}",
                           "output_column": "annotation"})
    msgs = m.prompt({"text": "hello world"})
    assert msgs == [{"role": "user", "content": "Summarize: hello world"}]
    out = m.parse({"text": "hello world"}, "RESP")
    assert out["annotation"] == "RESP" and out["text"] == "hello world"
    with pytest.raises(ValueError):
        build_map("chat", {"output_column": "x"})  # no user message source
    with pytest.raises(ValueError):
        build_map("chat", {"user_message": "a", "user_message_column": "b",
                           "output_column": "x"})


def test_mock_backend_deterministic_chat():
    be = MockLLMBackend()
    msgs = [{"role": "user", "content": "Summarize: hello world"}]
    expect = md5("user\nSummarize: hello world")
    assert be.complete(msgs, None) == expect
    assert be.complete(msgs, None) == expect  # stable


def test_scorer_map_end_to_end():
    m = build_map("scorer", {"user_message": "Rate: {{text}}",
                             "output_column": "score"})
    be = MockLLMBackend()
    resp = be.complete(m.prompt({"text": "abc"}), m.response_format)
    out = m.parse({"text": "abc"}, resp)
    h = md5("user\nRate: abc")
    assert out["score"] == 1 + (ord(h[0]) * 256 + ord(h[1])) % 100
    assert out["classifier_reasoning"].startswith("mock-reasoning-")


def test_binary_classifier_map():
    m = build_map("binary_classifier", {"user_message": "Is good? {{text}}",
                                        "output_column": "verdict"})
    be = MockLLMBackend()
    out = m.parse({"text": "z"}, be.complete(m.prompt({"text": "z"}),
                                             m.response_format))
    h = md5("user\nIs good? z")
    assert out["verdict"] == (ord(h[0]) % 2 == 0)


def test_judge_map_last_word_protocol():
    m = build_map("judge", {"input_instruction_column": "q",
                            "input_golden_answer_column": "gold",
                            "input_attempt_answer_column": "att"})
    row = {"q": "2+2", "gold": "4", "att": "4"}
    be = MockLLMBackend()
    out = m.parse(row, be.complete(m.prompt(row), m.response_format))
    assert out["model_judgement"] in (True, False)
    assert out["model_judgement_full"].strip().split()[-1] in ("yes", "no")
    # filter_out_negative drops 'no' rows entirely
    m2 = build_map("judge", {"input_instruction_column": "q",
                             "input_golden_answer_column": "gold",
                             "input_attempt_answer_column": "att",
                             "filter_out_negative_judgements": True})
    parsed = m2.parse(row, "reasoning...\nno")
    assert parsed == []


def test_list_map_fanout():
    m = build_map("list", {"user_message": "Ideas for {{topic}}",
                           "output_column": "idea", "num_items": 3})
    be = MockLLMBackend()
    rows = m.parse({"topic": "x"}, be.complete(m.prompt({"topic": "x"}),
                                               m.response_format))
    assert len(rows) == 3
    canon = canonical_prompt(m.prompt({"topic": "x"}))
    assert rows[1]["idea"] == md5(canon + "#1")


def test_retry_path_recovers():
    actor = CompletionsActor(
        "chat", {"user_message": "{{t}}", "output_column": "o"},
        backend_kwargs={"fail_every": 2}, max_retries=2, retry_base_sleep=0.0,
    )
    batch = pa.table({"t": ["a", "b", "c", "d"]})
    out = actor(batch)
    assert out.num_rows == 4  # every transient failure retried to success


def test_retry_exhaustion_raises():
    class AlwaysFail:
        def __init__(self):
            pass

        def complete(self, messages, response_format):
            raise TimeoutError("down")

    register_map("chat_tmp", ChatMap)
    from open_thoughts_ray.llm.backend import register_backend

    register_backend("always_fail", AlwaysFail)
    actor = CompletionsActor("chat_tmp", {"user_message": "{{t}}",
                                          "output_column": "o"},
                             backend="always_fail", max_retries=1,
                             retry_base_sleep=0.0)
    with pytest.raises(RuntimeError, match="after 1 retries"):
        actor(pa.table({"t": ["a"]}))


def test_parse_error_modes():
    class BadParse(ChatMap):
        def parse(self, row, response):
            if row["t"] == "bad":
                raise ValueError("boom")
            return super().parse(row, response)

    register_map("bad_parse", BadParse)
    cfg = {"user_message": "{{t}}", "output_column": "o"}
    batch = pa.table({"t": ["ok", "bad", "ok2"]})
    dropped = CompletionsActor("bad_parse", cfg, on_parse_error="drop")(batch)
    assert dropped.num_rows == 2
    kept = CompletionsActor("bad_parse", cfg, on_parse_error="keep")(batch)
    assert kept.num_rows == 3
    errs = [r.get("_parse_error") for r in kept.to_pylist()]
    assert sum(e is not None for e in errs) == 1
    with pytest.raises(ValueError):
        CompletionsActor("bad_parse", cfg, on_parse_error="raise")(batch)


def test_rate_limiter_throttles_and_is_shared(ray_session):
    import ray

    limiter = shared_rate_limiter(requests_per_min=1e9)
    # drain the burst then verify a wait is returned
    limiter2 = shared_rate_limiter(requests_per_min=60)  # 1 req/sec
    ray.get(limiter2.acquire.remote(60, 0))  # consume full burst
    wait = ray.get(limiter2.acquire.remote(2, 0))
    assert wait > 0
    stats = ray.get(limiter2.stats.remote())
    assert stats["granted_requests"] == 62
    assert ray.get(limiter.acquire.remote(5, 100)) == 0.0


def test_completions_dataset_end_to_end(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": list("wxyz")})
    out = completions(
        rd.from_pandas(df), "chat",
        {"user_message": "Summarize: {{text}}", "output_column": "annotation"},
        concurrency=2, batch_size=2,
    ).to_pandas().sort_values("doc_id")
    assert list(out.columns) == ["doc_id", "text", "annotation"]
    assert out.annotation.tolist() == [
        md5(f"user\nSummarize: {t}") for t in "wxyz"
    ]


def test_completions_listmap_fanout_dataset(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": [1, 2], "topic": ["a", "b"]})
    out = completions(
        rd.from_pandas(df), "list",
        {"user_message": "Ideas: {{topic}}", "output_column": "idea",
         "num_items": 3},
        concurrency=1, batch_size=8,
    ).to_pandas()
    assert len(out) == 6
    assert out.groupby("doc_id").size().tolist() == [3, 3]


def test_yaml_completions_op_with_resources(ray_session, tmp_path):
    """YAML surface: completions op + per-op resource keys + shared rate
    limiter + plugin registry (SURVEY.md §2.11 / §2.5)."""
    import pyarrow.parquet as pq

    from open_thoughts_ray.yaml_pipeline import register_yaml_op, run_pipeline

    pq.write_table(
        pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array([f"t{i}" for i in range(6)])}),
        str(tmp_path / "docs.parquet"),
    )
    register_yaml_op("double_rows", lambda ins, cfg: ins[0].union(ins[0]))
    doc = {"operators": [
        {"id": "src", "config": {"type": "parquet_source",
                                 "path": str(tmp_path / "docs.parquet")}},
        {"id": "annotate", "config": {
            "type": "completions", "map": "chat",
            "map_config": {"user_message": "Q: {{text}}",
                           "output_column": "ans"},
            "concurrency": 2, "batch_size": 4, "num_cpus": 0.25,
            "requests_per_min": 1e9}},
        {"id": "doubled", "config": {"type": "double_rows"}},
    ]}
    out = run_pipeline(doc).to_pandas()
    assert len(out) == 12
    assert out.ans.iloc[0] == md5(f"user\nQ: {out.text.iloc[0]}")


def test_example_yaml_strategy_end_to_end(ray_session, tmp_path):
    """examples/webdoc_curation.yaml: the full reference-grammar flow
    (json_source → filter → classify → filter → annotate → dedup →
    project) over a synthetic JSONL corpus."""
    import json as _json

    import yaml

    from open_thoughts_ray.yaml_pipeline import run_pipeline

    rows = []
    for i in range(30):
        rows.append({"doc_id": i, "text": f"lesson {i} about topic {i % 7}",
                     "lang": "en" if i % 3 else "de"})
    rows.append({"doc_id": 99, "text": "lesson 1 about topic 1",
                 "lang": "en"})  # exact dup of doc 1 (higher id loses)
    src = tmp_path / "corpus.jsonl"
    with open(src, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    doc = yaml.safe_load(
        open("examples/webdoc_curation.yaml").read().replace(
            "{input_path}", str(src)))
    out = run_pipeline(doc).to_pandas()
    assert set(out.columns) == {"doc_id", "text", "summary", "educational",
                                "source"}
    assert (out.source == "webcrawl").all()
    assert out.educational.all()
    assert 99 not in set(out.doc_id)  # dup collapsed to the min doc_id
    # every summary is the deterministic mock annotation
    for _, r in out.iterrows():
        assert r.summary == md5(f"user\nSummarize: {r.text}")


def test_ranker_critic_fuser_chain(ray_session):
    """Best-of-N shape (reference ranker → critic/fuser flow): rank
    candidates, then fuse the top ones — all through the deterministic
    mock backend."""
    import ray.data as rd

    df = pd.DataFrame({
        "q": ["what is 2+2", "capital of france"],
        "cands": [["four", "5", "maybe 4"], ["paris", "london", "lyon"]],
    })
    ranked = completions(
        rd.from_pandas(df), "ranker",
        {"query_column": "q", "responses_column": "cands",
         "output_column": "ranking"},
        concurrency=1,
    )
    fused = completions(
        ranked, "fuser",
        {"query_column": "q", "responses_column": "cands",
         "ranking_column": "ranking", "top_ranking": 2,
         "output_column": "fused"},
        concurrency=1,
    ).to_pandas().sort_values("q").reset_index(drop=True)
    assert len(fused) == 2
    for _, r in fused.iterrows():
        assert sorted(r.ranking) == [1, 2, 3]  # valid permutation
        assert len(r.fused) == 32  # md5 hex mock response
    critic = completions(
        rd.from_pandas(df), "critic",
        {"query_column": "q", "responses_column": "cands",
         "output_column": "critique"},
        concurrency=1,
    ).to_pandas()
    assert critic.critique.str.len().eq(32).all()


def test_empty_batch_carries_output_schema(ray_session):
    """A batch where EVERY row is dropped must still emit the OUTPUT
    schema (ADVICE r2: input-schema empty blocks broke downstream
    select_columns on the output column)."""
    import hashlib

    import ray.data as rd

    from open_thoughts_ray.llm import completions
    from open_thoughts_ray.llm.backend import canonical_prompt
    from open_thoughts_ray.llm.maps import JudgeMap

    cfg = {"input_instruction_column": "q",
           "input_golden_answer_column": "gold",
           "input_attempt_answer_column": "att",
           "filter_out_negative_judgements": True}
    jm = JudgeMap(cfg)
    # collect rows whose mock judgement is NEGATIVE (ord(h[0]) odd)
    neg_rows = []
    i = 0
    while len(neg_rows) < 4:
        row = {"doc_id": i, "q": f"q{i}", "gold": "x", "att": f"a{i}"}
        h = hashlib.md5(
            canonical_prompt(jm.prompt(row)).encode()).hexdigest()
        if ord(h[0]) % 2 == 1:
            neg_rows.append(row)
        i += 1
    import pandas as pd

    ds = rd.from_pandas(pd.DataFrame(neg_rows))
    out = completions(ds, "judge", cfg, concurrency=1, batch_size=64)
    # select_columns on the judge's output columns must not raise even
    # though every block is empty (ray's to_pandas drops columns on
    # 0-row frames, so assert on the Dataset schema)
    sel = out.select_columns(["doc_id", "model_judgement",
                              "model_judgement_full"])
    assert sel.count() == 0
    # the output fields must be present in the emitted blocks' schema
    # (ray reports the pre-projection schema on fully-empty datasets, so
    # assert subset rather than equality)
    assert {"doc_id", "model_judgement",
            "model_judgement_full"} <= set(out.schema().names)


def test_yaml_num_gpus_passthrough():
    from open_thoughts_ray.yaml_pipeline import _remote_args

    ra = _remote_args({"num_cpus": 2, "num_gpus": 0.5, "memory": 4,
                       "batch_size": 128})
    assert ra["num_gpus"] == 0.5
    assert ra["num_cpus"] == 2.0
    assert ra["memory"] == 4e9
    assert "num_gpus" not in _remote_args({"num_cpus": 1})


def test_rate_limiter_name_derived_from_rates(ray_session, tmp_path):
    """Two completions ops with different budgets must not share one
    limiter actor (ADVICE r2)."""
    from open_thoughts_ray.yaml_pipeline import run_pipeline

    import pyarrow.parquet as pq
    import pyarrow as pa

    path = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({"doc_id": [1, 2], "text": ["a", "b"]}), path)

    def pipe(rpm):
        return {"operators": [
            {"id": "src", "config": {"type": "parquet_source", "path": path}},
            {"id": "ann", "config": {
                "type": "completions", "map": "chat",
                "map_config": {"user_message": "X {{text}}",
                               "output_column": "ann"},
                "requests_per_min": rpm, "concurrency": 1}},
        ]}

    import ray

    run_pipeline(pipe(60000)).materialize()
    run_pipeline(pipe(120000)).materialize()
    # distinct named actors exist for the two budgets
    names = [a["name"] for a in ray.util.list_named_actors(all_namespaces=True)] \
        if hasattr(ray.util, "list_named_actors") else []
    both = [n for n in names if str(n).startswith("otr_completions_limiter_")]
    assert len({n for n in both}) >= 2


def test_response_cache_rerun_zero_backend_calls(tmp_path):
    """Second pass over the same rows with cache_dir set makes ZERO
    backend calls and produces the identical annotation column
    (VERDICT r2 #3; reference data_syncer.py:12-231).  The actor runs
    in-process so the counting backend is visible."""
    from open_thoughts_ray.llm.backend import MockLLMBackend, register_backend

    calls = []

    class CountingBackend(MockLLMBackend):
        def complete(self, messages, response_format):
            calls.append(1)
            return super().complete(messages, response_format)

    register_backend("counting", lambda **kw: CountingBackend(**kw))
    cache_dir = str(tmp_path / "llm_cache")
    batch = pa.table({"doc_id": list(range(30)),
                      "text": [f"doc number {i}" for i in range(30)]})

    def run():
        actor = CompletionsActor(
            "chat", {"user_message": "Summarize: {{text}}",
                     "output_column": "annotation"},
            backend="counting", cache_dir=cache_dir)
        return actor(batch)

    first = run()
    assert len(calls) == 30
    second = run()  # fresh actor, same cache dir
    assert len(calls) == 30  # ZERO new backend calls
    assert first.column("annotation").to_pylist() == \
        second.column("annotation").to_pylist()


def test_response_cache_dataset_rerun_skips_limiter(ray_session, tmp_path):
    """End-to-end Dataset path: the rate-limiter budget is only drawn
    for cache MISSES, so a fully-cached rerun grants zero requests."""
    import ray
    import ray.data as rd

    limiter = shared_rate_limiter(requests_per_min=1e9,
                                  name="otr_cache_test_limiter")
    cache_dir = str(tmp_path / "llm_cache_e2e")
    df = pd.DataFrame({"doc_id": range(20),
                       "text": [f"t{i}" for i in range(20)]})

    def run():
        return completions(
            rd.from_pandas(df), "chat",
            {"user_message": "S: {{text}}", "output_column": "ann"},
            limiter=limiter, concurrency=1, batch_size=8,
            cache_dir=cache_dir,
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    first = run()
    granted_after_first = ray.get(limiter.stats.remote())["granted_requests"]
    assert granted_after_first == 20
    second = run()
    granted_after_second = ray.get(limiter.stats.remote())["granted_requests"]
    assert granted_after_second == granted_after_first  # zero new requests
    assert first["ann"].tolist() == second["ann"].tolist()


def test_response_cache_key_isolates_backend_and_format(tmp_path):
    from open_thoughts_ray.llm.cache import ResponseCache, backend_identity

    c1 = ResponseCache(str(tmp_path), backend_identity("mock", None))
    c2 = ResponseCache(str(tmp_path), backend_identity("mock", {"fail_every": 2}))
    k1 = c1.key("user\nhello", None)
    assert k1 != c2.key("user\nhello", None)          # backend identity
    assert k1 != c1.key("user\nhello", "score")       # response format
    assert k1 != c1.key("user\nhellp", None)          # prompt
    c1.put(k1, {"a": 1})
    assert c1.get(k1) == {"a": 1}


def test_generator_map_single_row_list():
    m = build_map("generator", {"user_message": "Ideas: {{text}}",
                                "output_column": "ideas", "num_items": 3})
    row = {"doc_id": 1, "text": "t"}
    resp = MockLLMBackend().complete(m.prompt(row), m.response_format)
    out = m.parse(row, resp)
    assert isinstance(out, dict)  # ONE row (not a fan-out)
    c = canonical_prompt(m.prompt(row))
    assert out["ideas"] == [md5(c + "#" + str(i)) for i in range(3)]


def test_test_case_map_parallel_lists():
    m = build_map("test_case", {"input_prompt_column": "problem",
                                "num_cases": 2})
    row = {"problem": "sum two ints"}
    resp = MockLLMBackend().complete(m.prompt(row), m.response_format)
    out = m.parse(row, resp)
    c = canonical_prompt(m.prompt(row))
    assert out["test_inputs"] == [md5(c + "#in#0"), md5(c + "#in#1")]
    assert out["test_outputs"] == [md5(c + "#out#0"), md5(c + "#out#1")]
    with pytest.raises(ValueError):
        m.parse(row, {"test_inputs": ["a"], "test_outputs": []})


def test_alpaca_map_parses_mock_blocks():
    m = build_map("alpaca", {"alpaca_prompt_column": "p",
                             "num_seed_instructions": 3,
                             "num_generated": 2})
    row = {"p": "seed prompt"}
    resp = MockLLMBackend().complete(m.prompt(row), m.response_format)
    rows = m.parse(row, resp)
    assert len(rows) == 2
    c = canonical_prompt(m.prompt(row))
    assert rows[0]["instruction"] == \
        f"Summarize topic {md5(c + '#inst#1')} briefly."
    assert rows[0]["instr_input"] == ""          # <noinput> normalized
    assert rows[0]["output"] == md5(c + "#out#1")
    assert rows[1]["output"] == md5(c + "#out#2")


def test_alpaca_map_heuristics():
    """The quality filters (alpaca_map.py:65-101 semantics) on
    handcrafted completions: short, blacklisted, program-lead,
    punctuation-lead and malformed blocks are all dropped."""
    m = build_map("alpaca", {"alpaca_prompt_column": "p",
                             "num_seed_instructions": 0,
                             "num_generated": 1})
    row = {"p": "x"}

    def block(inst, idx=1, inp="<noinput>", outp="o"):
        return (f"\n{inst}\n{idx}. Input:\n{inp}\n{idx}. Output:\n{outp}\n")

    good = m.parse(row, block("Explain the rules of chess clearly."))
    assert len(good) == 1
    assert m.parse(row, block("Too short."))[0:1] == []          # ≤3 words
    assert m.parse(row, block("Draw a picture of a cat now.")) == []
    assert m.parse(row, block("Write a program that sorts numbers.")) == []
    assert m.parse(row, block("?Explain the rules of chess twice.")) == []
    assert m.parse(row, "garbled no blocks here") == []
    # real input is preserved (only the <noinput> sentinel is blanked)
    kept = m.parse(row, block("Translate the following text to French.",
                              inp="hello world"))
    assert kept[0]["instr_input"] == "hello world"


def test_alpaca_generator_testcase_dataset_e2e(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": [1, 2],
                       "problem": ["add two numbers", "reverse a string"]})
    out = completions(rd.from_pandas(df), "test_case",
                      {"input_prompt_column": "problem", "num_cases": 2},
                      concurrency=1, batch_size=8).to_pandas()
    assert len(out) == 2
    assert all(len(v) == 2 for v in out.test_inputs)
    fan = completions(rd.from_pandas(df), "alpaca",
                      {"alpaca_prompt_column": "problem",
                       "num_seed_instructions": 1, "num_generated": 3},
                      concurrency=1, batch_size=8).to_pandas()
    assert len(fan) == 6  # 2 rows × 3 generated instructions


def test_unnatural_instructions_map():
    m = build_map("unnatural_instructions",
                  {"user_message": "Create: {{text}}"})
    row = {"doc_id": 1, "text": "t"}
    resp = MockLLMBackend().complete(m.prompt(row), m.response_format)
    out = m.parse(row, resp)
    c = canonical_prompt(m.prompt(row))
    assert out["instruction"] == md5(c + "#field#instruction")
    assert out["constraints"] == md5(c + "#field#constraints")


def test_alpaca_seed_task_map_keeps_original():
    m = build_map("alpaca_seed_task", {"user_message": "Vary: {{instruction}}"})
    row = {"doc_id": 1, "instruction": "seed", "input": "", "output": "o"}
    resp = MockLLMBackend().complete(m.prompt(row), m.response_format)
    rows = m.parse(row, resp)
    assert len(rows) == 2
    c = canonical_prompt(m.prompt(row))
    assert rows[0]["instruction"] == md5(c + "#field#instruction")
    assert rows[1] == row  # original kept verbatim


def test_open_gpt_map_task_fanout():
    m = build_map("open_gpt", {"user_message": "Make: {{text}}",
                               "num_tasks": 2})
    row = {"doc_id": 1, "text": "t"}
    resp = MockLLMBackend().complete(m.prompt(row), m.response_format)
    rows = m.parse(row, resp)
    assert len(rows) == 2
    c = canonical_prompt(m.prompt(row))
    assert rows[0]["task"] == md5(c + "#task0#task")
    assert rows[1]["instruction"] == md5(c + "#task1#instruction")


def test_difficulty_map_range_and_mock():
    m = build_map("difficulty", {"problem_column": "p", "criteria": "std"})
    row = {"p": "hard problem"}
    resp = MockLLMBackend().complete(m.prompt(row), m.response_format)
    out = m.parse(row, resp)
    assert 1 <= out["difficulty"] <= 10
    with pytest.raises(ValueError):
        m.parse(row, {"difficulty": 11, "reasoning": "r"})


def test_reasoner_map_two_columns():
    m = build_map("reasoner", {"input_problem_column": "p"})
    row = {"p": "why"}
    resp = MockLLMBackend().complete(m.prompt(row), m.response_format)
    out = m.parse(row, resp)
    c = canonical_prompt(m.prompt(row))
    assert out["reasoning"] == md5(c + "#field#reasoning")
    assert out["solution"] == md5(c + "#field#content")
