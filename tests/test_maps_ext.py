"""Domain CompletionsMap families (llm/maps_ext.py) against the mock
backend — prompt/parse unit coverage plus one Ray Data end-to-end per
structural shape.  Reference surface: the COMPLETIONS_MAPS dict in
open_thoughts_3/engine/maps/map_registry.py:57-112."""

import pytest

from open_thoughts_ray.llm import MAP_REGISTRY, build_map
from open_thoughts_ray.llm.backend import MockLLMBackend

#: every name the reference registry exposes (map_registry.py:57-112,
#: deduplicated — the reference dict literal repeats several keys)
REFERENCE_MAP_NAMES = [
    "chat", "alpaca_seed", "list", "auto_evol_llm",
    "auto_evol_prompt_evolver", "auto_evol_trajectory_analysis",
    "sky_t1_math_difficulty", "deepseek_judge", "deepseek_reasoner",
    "test_cases", "code_golf_extractor", "generator", "ranker",
    "code_same", "math_same", "science_same", "scorer",
    "binary_classifier", "fuser", "kluster_deepseek_reasoner",
    "claude_reasoner", "grok_reasoner", "together_qwen",
    "sky_t1_ICPC_difficulty", "sky_t1_science_difficulty",
    "url_classify", "gemini_ocr", "judge", "alpaca", "critic",
    "unnatural_instructions", "open_gpt", "metamath_inverse_question",
    "metamath_extract_math_answer", "metamath_problem_clone",
    "metamath_self_verification", "metamath_solve_inverse",
    "metamath_rephrase_question", "metamath_solve_rephrased",
    "counterfactual_contextual_instructions", "contextual_instructions",
    "list_qa", "experience", "webinstruct_classify_educational_domain",
    "webinstruct_extract_qa", "webinstruct_revise_qa",
]


def test_every_reference_map_name_registered():
    missing = [n for n in REFERENCE_MAP_NAMES if n not in MAP_REGISTRY]
    assert not missing, f"unregistered reference map names: {missing}"


def _run(kind, cfg, row):
    m = build_map(kind, cfg)
    resp = MockLLMBackend().complete(m.prompt(row), m.response_format)
    return m.parse(row, resp)


def test_deepseek_judge_columns():
    out = _run("deepseek_judge",
               {"ground_truth_column": "gt", "answer_column": "ans"},
               {"gt": "4", "ans": "4"})
    assert isinstance(out["correct"], bool)
    assert out["judge_reasoning"].startswith("mock-reasoning-")


def test_reasoner_provider_aliases_output_columns():
    for kind, col in (("deepseek_reasoner", "deepseek_solution"),
                      ("kluster_deepseek_reasoner", "deepseek_solution"),
                      ("claude_reasoner", "claude_solution"),
                      ("grok_reasoner", "grok_solution"),
                      ("together_qwen", "qwen_solution")):
        out = _run(kind, {"input_problem_column": "p"}, {"p": "2+2?"})
        assert col in out and "reasoning" in out, kind


def test_reasoner_alias_respects_explicit_output_column():
    out = _run("deepseek_reasoner",
               {"input_problem_column": "p",
                "output_deepseek_solution_column": "sol"},
               {"p": "2+2?"})
    assert "sol" in out and "deepseek_solution" not in out


def test_sky_t1_difficulty_domains_differ():
    row = {"p": "Prove the binomial theorem."}
    outs = {}
    for kind in ("sky_t1_math_difficulty", "sky_t1_ICPC_difficulty",
                 "sky_t1_science_difficulty"):
        out = _run(kind, {"problem_column": "p"}, row)
        assert 1 <= out["difficulty"] <= 10
        outs[kind] = out["difficulty"]
    # distinct rubrics → distinct prompts → (md5) independent grades
    m1 = build_map("sky_t1_math_difficulty", {"problem_column": "p"})
    m2 = build_map("sky_t1_ICPC_difficulty", {"problem_column": "p"})
    assert m1.prompt(row) != m2.prompt(row)


def test_code_golf_extractor():
    out = _run("code_golf_extractor", {"input_solution_column": "s"},
               {"s": "lambda a,b:a+b"})
    assert len(out["code"]) == 32  # md5 field


@pytest.mark.parametrize("kind,key", [("code_same", "code_column"),
                                      ("math_same", "math_column"),
                                      ("science_same", "science_column")])
def test_same_consensus_maps(kind, key):
    out = _run(kind, {key: "sols", "question_column": "q",
                      "output_column": "same", "num_responses": 4},
               {"q": "q1", "sols": ["a", "b", "c", "d"]})
    assert all(v in {"0", "1", "2", "3"} for v in out["same"])
    assert out["_judge_reasoning"].startswith("mock-reasoning-")
    # ending_characters truncates each candidate in the prompt
    m = build_map(kind, {key: "sols", "question_column": "q",
                         "output_column": "same", "num_responses": 1,
                         "ending_characters": 3})
    msg = m.prompt({"q": "q1", "sols": ["abcdefgh"]})[0]["content"]
    assert "fgh" in msg and "abcdefgh" not in msg


def test_metamath_inverse_question_filters_non_numeric():
    rows = _run("metamath_inverse_question",
                {"question_column": "q",
                 "output_inverse_question_column": "iq",
                 "output_inverse_answer_column": "ia",
                 "num_quantities": 4},
                {"q": "John has 3 apples and 5 pears."})
    # mock emits 4 quantities, odd indices deliberately fail the filter
    assert len(rows) == 2
    for r in rows:
        assert "X" in r["iq"].split(" ")
        assert any(c.isdigit() for c in r["ia"])


def test_metamath_extract_answer_keeps_numeric():
    rows = _run("metamath_extract_math_answer",
                {"detailed_answer_column": "da",
                 "output_numerical_answer_column": "num"},
                {"da": "2 + 5 = 7 apples total."})
    assert len(rows) == 1 and any(c.isdigit() for c in rows[0]["num"])


def test_metamath_problem_clone_validates_and_ids():
    rows = _run("metamath_problem_clone", {"num_problems": 4},
                {"question": "Q", "detailed_answer": "D", "answer": "3"})
    assert len(rows) == 2  # odd mock problems fail validate_problem
    for r in rows:
        assert "=" in r["detailed_answer"]
        assert any(c.isdigit() for c in r["answer"])
        assert len(r["question_id"]) == 32


def test_metamath_self_verification_rewrites_question():
    out = _run("metamath_self_verification",
               {"question_column": "q", "answer_column": "a"},
               {"q": "Tom ran 5 km. How far did he run?", "a": "5"})
    assert out["q"].startswith("Tom ran 5 km. ")
    assert out["q"].endswith("What is the value of the unknown variable X?")
    assert "How far did he run?" not in out["q"]
    assert out["method"] == "self_verification"


def test_metamath_solve_inverse_match_filter():
    cfg = {"inverse_question_column": "iq", "inverse_answer_column": "ia",
           "output_predicted_answer_column": "pred"}
    # mock echoes the FIRST number in the prompt as final_answer
    keep = _run("metamath_solve_inverse", cfg,
                {"iq": "What is X plus 7 ?", "ia": "7"})
    drop = _run("metamath_solve_inverse", cfg,
                {"iq": "What is X plus 7 ?", "ia": "9"})
    assert len(keep) == 1 and len(keep[0]["pred"]) == 32
    assert drop == []


def test_metamath_solve_rephrased_and_rephrase():
    out = _run("metamath_rephrase_question",
               {"question_column": "q",
                "output_rephrased_question_column": "rq"},
               {"q": "What is 2+2?"})
    assert len(out["rq"]) == 32
    keep = _run("metamath_solve_rephrased",
                {"rephrased_question_column": "rq", "answer_column": "a",
                 "output_predicted_answer_column": "pred"},
                {"rq": "Compute 4 minus 0.", "a": "$4$"})
    assert len(keep) == 1  # '$'-stripped match


def test_auto_evol_trajectory_roundtrip():
    row = {"evol_prompt": "Make it harder.",
           "finally_rewritten_instructions": ["base instruction"]}
    out = _run("auto_evol_llm", {}, row)
    assert len(out["finally_rewritten_instructions"]) == 2
    out2 = _run("auto_evol_trajectory_analysis", {}, out)
    assert isinstance(out2["feedback"], str) and out2["feedback"]
    out3 = _run("auto_evol_prompt_evolver", {}, out2)
    assert out3["evol_prompt"] != "Make it harder."


def test_webinstruct_extract_qa_gate_and_fanout():
    cfg = {"input_text_column": "t", "output_question_column": "q",
           "output_answer_column": "a", "num_pairs": 2}
    # scan texts until both mock branches (qa_exists true/false) seen
    seen = set()
    for i in range(40):
        rows = _run("webinstruct_extract_qa", cfg, {"t": f"text {i}"})
        seen.add(len(rows))
    assert 0 in seen and 2 in seen


def test_webinstruct_revise_and_classify():
    out = _run("webinstruct_revise_qa",
               {"input_question_column": "q", "input_answer_column": "a",
                "input_source_document_column": "doc",
                "output_question_column": "rq",
                "output_answer_column": "ra"},
               {"q": "Q?", "a": "A.", "doc": "DOC"})
    assert len(out["rq"]) == 32 and len(out["ra"]) == 32
    out = _run("webinstruct_classify_educational_domain",
               {"input_domain_column": "d",
                "output_classification_column": "edu"},
               {"d": "mathhelp.example.edu"})
    assert isinstance(out["edu"], bool)


def test_url_classify_last_word_protocol_and_filter():
    base = {"input_url_column": "u"}
    out = _run("url_classify", base, {"u": "news.example.com"})
    assert out["url_classification"] == \
        out["url_classification_full"].split()[-1].startswith("yes")
    # filter mode drops negatives
    for i in range(40):
        res = _run("url_classify",
                   {**base, "filter_out_negative_classifications": True},
                   {"u": f"site{i}.example.com"})
        if isinstance(res, list):
            assert res == []
        else:
            assert res["url_classification"] is True


def test_contextual_instructions_packing():
    rows = _run("contextual_instructions",
                {"user_message": "blocks about {{t}}",
                 "output_column": "packed", "num_prompts": 2},
                {"t": "dogs"})
    assert len(rows) == 2
    for r in rows:
        p = r["packed"]
        assert p.startswith("BEGININPUT\nBEGINCONTEXT\n")
        assert "ENDCONTEXT" in p and "ENDINPUT" in p
        assert p.rstrip().endswith("ENDINSTRUCTION")
        assert "date: " in p and "author: " in p
    # counterfactual variant shares the packing
    rows2 = _run("counterfactual_contextual_instructions",
                 {"user_message": "counterfactuals about {{t}}",
                  "output_column": "packed", "num_prompts": 1},
                 {"t": "dogs"})
    assert rows2[0]["packed"].startswith("BEGININPUT")


def test_list_qa_and_experience():
    rows = _run("list_qa", {"user_message": "qa on {{t}}",
                            "output_instruction_column": "instr",
                            "output_response_column": "resp",
                            "num_pairs": 3}, {"t": "x"})
    assert len(rows) == 3 and all(len(r["instr"]) == 32 for r in rows)
    out = _run("experience", {"user_message": "roleplay {{t}}",
                              "output_instruction_column": "instr",
                              "output_response_column": "resp"},
               {"t": "x"})
    assert "\n\n" in out["instr"] and len(out["resp"]) == 32


def test_gemini_ocr_hashes_image_bytes():
    out1 = _run("gemini_ocr", {"input_image_column": "img"},
                {"img": b"\x00\x01"})
    out2 = _run("gemini_ocr", {"input_image_column": "img"},
                {"img": b"\x00\x02"})
    assert out1["ocr_text"] != out2["ocr_text"]
    assert len(out1["ocr_text"]) == 32


def test_maps_ext_dataset_end_to_end(ray_session):
    """One Ray Data run per structural shape: fan-out (extract_qa),
    filter (solve_inverse), column-append (deepseek_judge)."""
    import ray.data as rd

    from open_thoughts_ray.llm import completions

    ds = rd.from_items([{"id": i, "t": f"text {i}",
                         "iq": "What is X plus 7 ?",
                         "ia": "7" if i % 2 == 0 else "9",
                         "gt": "4", "ans": "4"} for i in range(16)])
    qa = completions(ds, "webinstruct_extract_qa",
                     {"input_text_column": "t",
                      "output_question_column": "q",
                      "output_answer_column": "a", "num_pairs": 2},
                     concurrency=2, batch_size=8)
    n = qa.count()
    assert n % 2 == 0 and 0 <= n <= 32

    solved = completions(ds, "metamath_solve_inverse",
                         {"inverse_question_column": "iq",
                          "inverse_answer_column": "ia",
                          "output_predicted_answer_column": "pred"},
                         concurrency=2, batch_size=8)
    assert solved.count() == 8  # only the ia == "7" half matches

    judged = completions(ds, "deepseek_judge",
                         {"ground_truth_column": "gt",
                          "answer_column": "ans"},
                         concurrency=2, batch_size=8)
    t = judged.to_pandas()
    assert len(t) == 16 and t["correct"].nunique() == 1


def test_example_metamath_backward_yaml(ray_session, tmp_path):
    """examples/metamath_backward.yaml: the MetaMath backward-
    augmentation strategy (extract answer → inverse questions →
    self-verify → solve-and-match, plus a rephrase branch) end-to-end
    through the YAML DAG on the mock backend."""
    import json as _json

    import yaml

    from open_thoughts_ray.yaml_pipeline import run_pipeline

    rows = [{"question": f"Tom ran {3 + i} km on day {i}. "
                         "How far did he run?",
             "detailed_answer": f"He ran {3 + i} km, so the answer "
                                f"is {3 + i}."}
            for i in range(8)]
    src = tmp_path / "seed.jsonl"
    with open(src, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    doc = yaml.safe_load(
        open("examples/metamath_backward.yaml").read().replace(
            "{input_path}", str(src)))
    out = run_pipeline(doc).to_pandas()
    # rephrase branch: 1 row/seed; inverse branch: num_quantities=3 mock
    # → 2 surviving inverse rows/seed (odd mock quantities fail the
    # numeric+X filter) — 8 + 16 = 24 mixed instruction pairs
    assert len(out) == 24
    assert set(out.columns) >= {"instruction", "completion",
                                "conversations"}
    conv = out.conversations.iloc[0]
    assert [m["from"] for m in conv] == ["human", "gpt"]
    # the solve-and-match tail runs standalone too (may filter to zero)
    solved = run_pipeline(doc, output_id="solve_inverse").to_pandas()
    assert len(solved) <= 16
    if len(solved):
        assert "predicted_answer" in solved.columns
