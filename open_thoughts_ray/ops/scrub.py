"""Ordered regex PII / toxicity scrubber.

Descendant of the reference's regex phrase removal (``remove_text``,
open_thoughts_3/dcft/data_strategies/WebInstruct/utils.py:69-89 —
case-insensitive ``re.sub`` over a column).  The graft's correctness bar is
*exact* scrubbed-string equality vs the oracle, so the rule list is a
single canonical ordered tuple (never a dict/set), applied strictly in
order with Python ``re`` (SURVEY.md §7.6 hard-part #1).
"""

from __future__ import annotations

import re

from ..fixtures.textgen import TOXIC_LEXICON

# (name, pattern, replacement) — applied IN ORDER with re.sub.
SCRUB_RULES: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (
        "phone",
        r"\b(?:\+?1[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
        "<PHONE>",
    ),
    ("toxic", r"(?i)\b(?:" + "|".join(map(re.escape, TOXIC_LEXICON)) + r")\b", "****"),
)

SCRUB_VERSION = 1

_COMPILED = tuple((name, re.compile(pat), repl) for name, pat, repl in SCRUB_RULES)


def scrub_text(text: str) -> str:
    """Apply every rule in order to one string."""
    for _, rx, repl in _COMPILED:
        text = rx.sub(repl, text)
    return text


# necessary-trigger prefilters: url needs "http", email needs "@",
# ssn/phone need a digit.  Substitutions can neither seed nor bridge a
# later rule's match (replacement strings contain no digits, "@", "."
# or lexicon words), so a row failing a rule's trigger is untouched by
# that rule even mid-sequence — skipping its sub is exact (asserted vs
# the ordered path in tests/test_rules_scrub.py).
_DIGIT = re.compile(r"\d")
_TRIGGERS = {
    "url": lambda t: "http" in t,
    "email": lambda t: "@" in t,
    "ssn": lambda t: _DIGIT.search(t) is not None,
    "phone": lambda t: _DIGIT.search(t) is not None,
}


def scrub_many(texts) -> list[str]:
    """Batch variant: cheap necessary-condition checks skip whole sub
    passes for rows that cannot match (typical clean captions); the
    toxic pass always runs (its own scan IS the trigger)."""
    out = list(texts)
    for name, rx, repl in _COMPILED:
        sub = rx.sub
        trig = _TRIGGERS.get(name)
        if trig is None:
            out = [sub(repl, t) for t in out]
        else:
            out = [sub(repl, t) if trig(t) else t for t in out]
    return out


def rules_json() -> list[dict]:
    """The ordered rule list as JSON-able dicts (fixture manifest)."""
    return [
        {"name": n, "pattern": p, "replacement": r, "version": SCRUB_VERSION}
        for n, p, r in SCRUB_RULES
    ]
