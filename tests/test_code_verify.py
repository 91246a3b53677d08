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
    assert r == {"n_tests": 2, "n_passed": 2, "passed": True, "error": ""}


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
