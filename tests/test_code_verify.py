"""Code-execution verification judge (reference open_thoughts/code/judge.py)."""

import json

import pandas as pd
import pytest

from open_thoughts_ray.ops.code_verify import verify_code, verify_one


GOOD = "n = int(input())\nprint(n * 2)"
WRONG = "n = int(input())\nprint(n + 1)"
CRASH = "raise SystemExit(3)"
HANG = "while True:\n    pass"
TESTS = {"inputs": ["2\n", "5\n"], "outputs": ["4\n", "10\n"]}


def test_verify_one_pass():
    r = verify_one(GOOD, TESTS)
    assert (r["n_tests"], r["n_passed"], r["passed"], r["error"]) == \
        (2, 2, True, "")
    assert r["verdicts"] == ["passed", "passed"]


def test_verify_one_wrong_answer():
    r = verify_one(WRONG, TESTS)
    assert r["passed"] is False and r["n_passed"] == 0
    assert "wrong answer" in r["error"]


def test_verify_one_crash():
    r = verify_one(CRASH, TESTS)
    assert r["passed"] is False
    assert "exit 3" in r["error"]


def test_verify_one_timeout():
    r = verify_one(HANG, {"inputs": ["1\n"], "outputs": ["1\n"]}, timeout_s=1.0)
    assert r["passed"] is False
    assert "timeout" in r["error"]


def test_verify_one_whitespace_tolerant():
    r = verify_one("print('a  ')\nprint('b')", {"inputs": [""],
                                                "outputs": ["a\nb\n"]})
    assert r["passed"] is True


def test_verify_code_dataset(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "problem_id": [1, 2, 3],
        "solution": [GOOD, WRONG, "bad syntax ((("],
        "test_cases": [json.dumps(TESTS)] * 3,
    })
    out = verify_code(rd.from_pandas(df), concurrency=2).to_pandas() \
        .sort_values("problem_id")
    assert out.passed.tolist() == [True, False, False]
    assert out.n_passed.tolist() == [2, 0, 0]
    filt = verify_code(rd.from_pandas(df), mode="filter",
                       concurrency=2).to_pandas()
    assert filt.problem_id.tolist() == [1]


def test_verify_code_bad_json(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"solution": [GOOD], "test_cases": ["{not json"]})
    out = verify_code(rd.from_pandas(df)).to_pandas()
    assert out.passed.tolist() == [False]
    assert out.verify_error.tolist() == ["bad test json"]


CALL_GOOD = "def add(a, b):\n    return a + b"
CALL_SOLUTION_CLASS = (
    "class Solution:\n"
    "    def twice(self, x):\n"
    "        return x * 2")
CALL_TUPLE = "def pair(a, b):\n    return (a, b)"
CALL_TESTS = {"fn_name": "add", "inputs": [[1, 2], [5, 7]],
              "outputs": [3, 12]}


def test_call_based_pass():
    r = verify_one(CALL_GOOD, CALL_TESTS)
    assert r["passed"] and r["verdicts"] == ["passed", "passed"]


def test_call_based_wrong_answer():
    r = verify_one("def add(a, b):\n    return a - b", CALL_TESTS)
    assert not r["passed"] and r["verdicts"] == ["wrong_answer"] * 2


def test_call_based_solution_class_resolution():
    r = verify_one(CALL_SOLUTION_CLASS,
                   {"fn_name": "twice", "inputs": [[4]], "outputs": [8]})
    assert r["passed"]


def test_call_based_tuple_to_list_coercion():
    r = verify_one(CALL_TUPLE, {"fn_name": "pair", "inputs": [[1, 2]],
                                "outputs": [[1, 2]]})
    assert r["passed"]


def test_call_based_singleton_unwrap():
    # ground truth wrapped in a singleton list (judge.py:357)
    r = verify_one(CALL_GOOD, {"fn_name": "add", "inputs": [[1, 2]],
                               "outputs": [[3]]})
    assert r["passed"]


def test_call_based_missing_function_is_compile_error():
    r = verify_one("x = 1", CALL_TESTS)
    assert not r["passed"]
    assert r["verdicts"][0] == "compile_error"


def test_call_based_runtime_error_verdict():
    r = verify_one("def add(a, b):\n    raise ValueError('boom')",
                   CALL_TESTS)
    assert r["verdicts"] == ["runtime_error"] * 2
    assert "ValueError" in r["error"]


def test_std_float_allclose_ladder():
    r = verify_one("print(0.1 + 0.2)", {"inputs": [""],
                                        "outputs": ["0.30000000000000004"]})
    assert r["passed"]
    r2 = verify_one("print('0.3000000000000000666')",
                    {"inputs": [""], "outputs": ["0.3"]})
    assert not r2["passed"] or True  # allclose default rtol accepts; pin:
    import numpy as np
    assert bool(np.allclose([0.3000000000000000666], [0.3])) == r2["passed"]


def test_std_compile_error_verdict():
    r = verify_one("def broken(:", TESTS)
    assert not r["passed"]
    assert set(r["verdicts"]) == {"compile_error"}


def test_std_mixed_verdicts_single_process():
    # one solution, three tests: pass, wrong, pass — all in ONE
    # subprocess (compile caching); per-test isolation of namespaces
    code = "import sys\nn = int(input())\nprint(n * n)"
    r = verify_one(code, {"inputs": ["2\n", "3\n", "4\n"],
                          "outputs": ["4\n", "10\n", "16\n"]})
    assert r["verdicts"] == ["passed", "wrong_answer", "passed"]
    assert r["n_passed"] == 2 and not r["passed"]


def test_std_per_test_timeout_does_not_kill_suite():
    code = ("n = int(input())\n"
            "if n == 0:\n"
            "    while True: pass\n"
            "print(n)")
    r = verify_one(code, {"inputs": ["0\n", "7\n"],
                          "outputs": ["x\n", "7\n"]}, timeout_s=1.0)
    assert r["verdicts"][0] == "timeout"
    assert r["verdicts"][1] == "passed"


def test_int_key_dict_restoration():
    # judge.py:175-196 — JSON stringifies dict keys; singleton-dict
    # tests get their int keys restored before the call.  Reference
    # call shape: method(*test) with a dict test spreads its KEYS.
    code = "def pick(k):\n    return k"
    r = verify_one(code, {"fn_name": "pick",
                          "inputs": [{"3": "v"}], "outputs": [3]})
    assert r["passed"]


def test_std_set_ladder_rungs():
    """judge.py:569-607 checks 4-6: word-set / line-set / rounded-
    numeric-set equality rungs of compare_std_results."""
    from open_thoughts_ray.ops.code_verify import compare_std_outputs

    # check 4: words within a line reordered
    assert compare_std_outputs("b a\nd c", "a b\nc d")
    # check 5: whole lines reordered
    assert compare_std_outputs("c d\na b", "a b\nc d")
    # check 6: numerics equal after rounding to 3 decimals
    assert compare_std_outputs("1.0004 2.0\n3.0", "1.0 2.0\n3.0")
    # 3-dp difference is real: must NOT match
    assert not compare_std_outputs("1.002 2.0", "1.0 2.0")
    # different multiset of words: no rung matches
    assert not compare_std_outputs("a b\nc", "a b\nc d")
    # duplicate-word lines collapse to the same set (reference
    # semantics: sets, not multisets)
    assert compare_std_outputs("a a b", "a b")
