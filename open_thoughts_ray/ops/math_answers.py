"""Math answer extraction + verification (reference verify stage).

The reference validates reasoning traces by extracting the final answer
from both the model solution and the ground truth and comparing them
numerically at fixed precision (open_thoughts/math/parser.py:1-51 via
the ``math_verify`` library; gate = ``verify.py:8-19`` keep-correct
filter).  Rebuilt from scratch, deterministic and dependency-free:

* ``extract_boxed`` — last ``\\boxed{...}`` with real brace matching
  (nested braces survive), falling back to the last number in the text;
* ``normalize_answer`` — latex strip (``\\frac{a}{b}``, ``\\text{}``,
  ``\\$``, ``%``, thousands commas, surrounding ``$``), then exact
  ``Fraction`` parsing where possible;
* comparison — exact rational equality when both sides parse, else
  float comparison rounded to ``precision`` decimal places (the
  reference's precision=6), else normalized string equality.

``math_answer_verify`` annotates (extracted_answer, extracted_gold,
verifier_label); ``verify_keep_correct`` is the reference's gate.
Stateless, vectorizes per batch with plain Python over the two string
columns (string parsing is inherently per-row, like scrub)."""

from __future__ import annotations

import re
from fractions import Fraction

import pyarrow as pa

_NUM_RE = re.compile(r"-?\d[\d,]*(?:\.\d+)?(?:[eE][+-]?\d+)?")
_FRAC_RE = re.compile(r"\\[dt]?frac\s*\{([^{}]*)\}\s*\{([^{}]*)\}")


def extract_boxed(text: str | None) -> str:
    """Content of the LAST \\boxed{...} (brace-matched, nesting-safe);
    falls back to the last number in the text, else ''."""
    s = text or ""
    best = None
    i = 0
    while True:
        j = s.find("\\boxed{", i)
        if j < 0:
            break
        depth = 0
        k = j + len("\\boxed{") - 1  # position of the opening brace
        for m in range(k, len(s)):
            if s[m] == "{":
                depth += 1
            elif s[m] == "}":
                depth -= 1
                if depth == 0:
                    best = s[k + 1 : m]
                    i = m + 1
                    break
        else:
            break
        if best is None:
            break
    if best is not None:
        return best.strip()
    nums = _NUM_RE.findall(s)
    return nums[-1] if nums else ""


def normalize_answer(ans: str | None) -> str:
    """Canonical string form: latex fractions → a/b, strip \\text{},
    \\$, $, %, \\!, thousands commas, whitespace, trailing period."""
    s = (ans or "").strip()
    s = _FRAC_RE.sub(lambda m: f"({m.group(1)})/({m.group(2)})", s)
    s = re.sub(r"\\text\s*\{([^{}]*)\}", r"\1", s)
    s = re.sub(r"\\left|\\right|\\!|\\,|\\;", "", s)
    s = s.replace("\\$", "").replace("$", "").replace("\\%", "%")
    s = s.replace("dfrac", "frac")
    s = re.sub(r"(?<=\d),(?=\d{3}\b)", "", s)  # 1,234,567 → 1234567
    s = re.sub(r"\s+", " ", s)
    s = s.strip().rstrip(".").strip()
    return s


def _to_fraction(s: str) -> Fraction | None:
    s = s.strip()
    if s.endswith("%"):
        inner = _to_fraction(s[:-1])
        return inner / 100 if inner is not None else None
    m = re.fullmatch(r"\(?\s*(-?[\d.]+)\s*\)?\s*/\s*\(?\s*(-?[\d.]+)\s*\)?",
                     s)
    if m:
        try:
            return Fraction(m.group(1)) / Fraction(m.group(2))
        except (ValueError, ZeroDivisionError):
            return None
    try:
        return Fraction(s)
    except ValueError:
        pass
    try:
        return Fraction(str(float(s)))
    except (ValueError, OverflowError):
        return None


def answers_match(pred: str | None, gold: str | None,
                  precision: int = 6) -> bool:
    """Reference comparison semantics: exact rational equality when both
    parse; else both-as-float rounded to ``precision`` decimals; else
    normalized string equality (case-insensitive)."""
    p, g = normalize_answer(pred), normalize_answer(gold)
    if not p or not g:
        return False
    fp, fg = _to_fraction(p), _to_fraction(g)
    if fp is not None and fg is not None:
        if fp == fg:
            return True
        return round(float(fp), precision) == round(float(fg), precision)
    return p.lower() == g.lower()


def math_answer_verify(ds, pred_col: str, gold_col: str,
                       precision: int = 6):
    """Annotate (extracted_answer, extracted_gold, verifier_label) —
    the parser.validate_solution shape."""

    def f(t: pa.Table) -> pa.Table:
        preds = t.column(pred_col).to_pylist()
        golds = t.column(gold_col).to_pylist()
        ep = [extract_boxed(x) for x in preds]
        eg = [extract_boxed(x) for x in golds]
        lab = [answers_match(a, b, precision) for a, b in zip(ep, eg)]
        t = t.append_column("extracted_answer", pa.array(ep, pa.string()))
        t = t.append_column("extracted_gold", pa.array(eg, pa.string()))
        return t.append_column("verifier_label", pa.array(lab, pa.bool_()))

    return ds.map_batches(f, batch_format="pyarrow")


def verify_keep_correct(ds, pred_col: str, gold_col: str,
                        precision: int = 6):
    """The reference's verify gate (verify.py:17-18): annotate then keep
    only rows whose answers match."""
    import pyarrow.compute as pc

    ann = math_answer_verify(ds, pred_col, gold_col, precision)
    return ann.map_batches(
        lambda t: t.filter(t.column("verifier_label")),
        batch_format="pyarrow",
    )
