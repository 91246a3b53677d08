import pandas as pd
import pytest

from open_thoughts_ray.ops.math_answers import (
    answers_match,
    extract_boxed,
    math_answer_verify,
    normalize_answer,
    verify_keep_correct,
)


def test_extract_boxed_nested_and_fallback():
    assert extract_boxed(r"so the answer is \boxed{42}.") == "42"
    assert extract_boxed(r"\boxed{\frac{1}{2}} then \boxed{7}") == "7"
    assert extract_boxed(r"\boxed{{a}+{b}}") == "{a}+{b}"
    assert extract_boxed("no box but x = 3.5 here") == "3.5"
    assert extract_boxed("") == ""
    assert extract_boxed(None) == ""


def test_normalize_answer_latex_forms():
    assert normalize_answer(r"\frac{1}{2}") == "(1)/(2)"
    assert normalize_answer(r"\text{ cm } 5") == "cm 5"
    assert normalize_answer("1,234,567") == "1234567"
    assert normalize_answer(r"\$3.50") == "3.50"
    assert normalize_answer("42.") == "42"


@pytest.mark.parametrize("pred,gold,ok", [
    ("42", "42.0", True),
    (r"\frac{1}{2}", "0.5", True),
    (r"\frac{2}{4}", r"\frac{1}{2}", True),
    ("50%", "0.5", True),
    ("1,000", "1000", True),
    ("0.3333333", "0.3333334", True),     # equal at precision 6
    ("0.333", "0.334", False),
    ("42", "43", False),
    ("x+1", "x + 1", False),              # strings differ after norm
    ("east", "East", True),               # case-insensitive strings
    ("", "42", False),
])
def test_answers_match(pred, gold, ok):
    assert answers_match(pred, gold) is ok


def test_math_answer_verify_and_gate(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "solution": [r"steps... \boxed{\frac{3}{4}}",
                     r"thus \boxed{10}",
                     "the result is 99"],
        "ground_truth": [r"\boxed{0.75}", r"\boxed{11}", r"\boxed{99}"],
    })
    ann = (math_answer_verify(rd.from_pandas(df), "solution",
                              "ground_truth").to_pandas())
    assert ann["verifier_label"].tolist() == [True, False, True]
    assert ann["extracted_answer"].tolist() == [r"\frac{3}{4}", "10", "99"]
    kept = verify_keep_correct(rd.from_pandas(df), "solution",
                               "ground_truth").to_pandas()
    assert len(kept) == 2
