"""Deterministic synthetic caption / corpus generators (FIXTURES.md F1/F2).

Four "languages":

* ``en``  — stopword-rich English-like sentences from a fixed template
  vocabulary (also the n-gram LM training corpus).
* ``xx1`` / ``xx2`` / ``xx3`` — synthetic languages drawn from disjoint
  character inventories (Greek / Cyrillic / accented-Latin ranges), so the
  from-scratch hashed-ngram langid model is cleanly learnable.

Caption *classes* cover every rule of the quality filter (each ≈3–5 %
share, FIXTURES.md F1): clean, non-English ×3, empty, too-short, too-long,
high-repetition, symbol-heavy, stopword-free word-salad, and scrub targets
(email / phone / SSN / URL / toxicity-lexicon).  Everything derives from a
``numpy.random.Generator`` seeded per row (common.hashing.row_seed) so any
partitioning of the generation work yields identical rows.
"""

from __future__ import annotations

import numpy as np

STOPWORDS = (
    "the a an of to in on and is was with for at by from it as are be this that".split()
)
NOUNS = (
    "cat dog bird tree river mountain city street window table chair garden "
    "cloud ocean forest flower bridge tower market farmer child painter boat "
    "train station library museum valley desert island harbor castle village"
).split()
VERBS = (
    "sits runs walks stands rests sleeps waits watches plays reads sings "
    "jumps flows glows drifts climbs floats shines turns rises falls moves"
).split()
ADJS = (
    "small large old young bright dark quiet calm busy gentle golden silver "
    "red blue green wooden stone distant nearby ancient modern empty full"
).split()

# content vocabulary for the LM; word-salad draws from RARE_WORDS instead
VOCAB = sorted(set(STOPWORDS + NOUNS + VERBS + ADJS))

_SYLL_C = list("bcdfghjklmnpqrstvwxz")
_SYLL_V = list("aeiouy")

_LANG_CHARS = {
    "xx1": list("αβγδεζηθικλμνξοπρστυφχψω"),
    "xx2": list("абвгдежзиклмнопрстуфхцчшщэюя"),
    "xx3": list("àèìòùáéíóúâêîôûäëïöüãõñçå"),
}
LANGS = ("en", "xx1", "xx2", "xx3")

TOXIC_LEXICON = ("crudwordo", "vulgarix", "slurzam", "obscenique", "profanek")

SYMBOLS = list("#@$%^&*+=~|<>{}[]\\")


def _rare_words(n: int = 200, seed: int = 1234) -> list[str]:
    """Deterministic pseudo-words disjoint from VOCAB (OOV for the LM)."""
    rng = np.random.default_rng(seed)
    out = []
    seen = set(VOCAB)
    while len(out) < n:
        k = rng.integers(2, 4)
        w = "".join(
            _SYLL_C[rng.integers(0, len(_SYLL_C))] + _SYLL_V[rng.integers(0, len(_SYLL_V))]
            for _ in range(int(k))
        )
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


RARE_WORDS = _rare_words()


def gen_clean_en(rng: np.random.Generator, min_words: int = 8, max_words: int = 20) -> str:
    """Stopword-rich English-like sentence; passes every quality rule."""
    n = int(rng.integers(min_words, max_words + 1))
    words = []
    while len(words) < n:
        words.append(STOPWORDS[rng.integers(0, len(STOPWORDS))])
        words.append(ADJS[rng.integers(0, len(ADJS))])
        words.append(NOUNS[rng.integers(0, len(NOUNS))])
        words.append(VERBS[rng.integers(0, len(VERBS))])
    return " ".join(words[:n]) + "."


def gen_lang(rng: np.random.Generator, lang: str, min_words: int = 6, max_words: int = 15) -> str:
    chars = _LANG_CHARS[lang]
    n = int(rng.integers(min_words, max_words + 1))
    words = []
    for _ in range(n):
        k = int(rng.integers(3, 9))
        words.append("".join(chars[i] for i in rng.integers(0, len(chars), size=k)))
    return " ".join(words)


def gen_word_salad(rng: np.random.Generator) -> str:
    """Stopword-free OOV word salad → fails stopword-density and LM ppl."""
    n = int(rng.integers(8, 18))
    return " ".join(RARE_WORDS[i] for i in rng.integers(0, len(RARE_WORDS), size=n))


def gen_repetitive(rng: np.random.Generator) -> str:
    """Repetition ratio > 0.3: few unique tokens repeated many times."""
    base = gen_clean_en(rng, 4, 6).rstrip(".").split()
    reps = []
    n = int(rng.integers(14, 24))
    for _ in range(n):
        reps.append(base[int(rng.integers(0, min(3, len(base))))])
    return " ".join(base + reps)


def gen_symbol_heavy(rng: np.random.Generator) -> str:
    words = gen_clean_en(rng, 6, 10).rstrip(".").split()
    out = []
    for w in words:
        out.append(w)
        for _ in range(int(rng.integers(1, 4))):
            out.append(SYMBOLS[int(rng.integers(0, len(SYMBOLS)))])
    return " ".join(out)


def gen_too_short(rng: np.random.Generator) -> str:
    return "".join(
        _SYLL_C[i] for i in rng.integers(0, len(_SYLL_C), size=int(rng.integers(1, 4)))
    )


def gen_too_long(rng: np.random.Generator) -> str:
    s = " ".join(gen_clean_en(rng, 15, 20) for _ in range(8))
    return s[: int(rng.integers(520, 700))]


def _gen_pii(rng: np.random.Generator, kind: str) -> str:
    base = gen_clean_en(rng, 6, 12).rstrip(".")
    words = base.split()
    if kind == "email":
        ins = f"{NOUNS[rng.integers(0, len(NOUNS))]}{int(rng.integers(0, 99))}@example{int(rng.integers(0, 9))}.com"
    elif kind == "phone":
        ins = f"{int(rng.integers(200, 999))}-{int(rng.integers(200, 999))}-{int(rng.integers(1000, 9999))}"
    elif kind == "ssn":
        ins = f"{int(rng.integers(100, 999))}-{int(rng.integers(10, 99))}-{int(rng.integers(1000, 9999))}"
    elif kind == "url":
        ins = f"https://www.example{int(rng.integers(0, 99))}.com/{NOUNS[rng.integers(0, len(NOUNS))]}"
    elif kind == "toxic":
        ins = TOXIC_LEXICON[int(rng.integers(0, len(TOXIC_LEXICON)))]
    else:
        raise ValueError(kind)
    pos = int(rng.integers(1, len(words)))
    words.insert(pos, ins)
    return " ".join(words) + "."


# (class name, probability) — probabilities sum to 1.0
CAPTION_CLASSES: list[tuple[str, float]] = [
    ("clean", 0.40),
    ("xx1", 0.05),
    ("xx2", 0.05),
    ("xx3", 0.05),
    ("empty", 0.04),
    ("too_short", 0.04),
    ("too_long", 0.04),
    ("repetitive", 0.05),
    ("symbol_heavy", 0.05),
    ("word_salad", 0.05),
    ("pii_email", 0.04),
    ("pii_phone", 0.04),
    ("pii_ssn", 0.03),
    ("pii_url", 0.03),
    ("toxic", 0.04),
]

_CLASS_NAMES = [c for c, _ in CAPTION_CLASSES]
_CLASS_CUM = np.cumsum([p for _, p in CAPTION_CLASSES])
assert abs(_CLASS_CUM[-1] - 1.0) < 1e-9


def pick_class(rng: np.random.Generator) -> str:
    u = float(rng.random())
    return _CLASS_NAMES[int(np.searchsorted(_CLASS_CUM, u, side="right").clip(0, len(_CLASS_NAMES) - 1))]


def gen_caption(rng: np.random.Generator, cls: str) -> str:
    if cls == "clean":
        return gen_clean_en(rng)
    if cls in _LANG_CHARS:
        return gen_lang(rng, cls)
    if cls == "empty":
        return "" if rng.random() < 0.7 else "   "
    if cls == "too_short":
        return gen_too_short(rng)
    if cls == "too_long":
        return gen_too_long(rng)
    if cls == "repetitive":
        return gen_repetitive(rng)
    if cls == "symbol_heavy":
        return gen_symbol_heavy(rng)
    if cls == "word_salad":
        return gen_word_salad(rng)
    if cls.startswith("pii_"):
        return _gen_pii(rng, cls[4:])
    if cls == "toxic":
        return _gen_pii(rng, "toxic")
    raise ValueError(cls)


def paraphrase(rng: np.random.Generator, caption: str) -> str:
    """Near-dup caption: swap one inner word (keeps class/rule outcomes)."""
    words = caption.split()
    if len(words) < 4:
        return caption
    pos = int(rng.integers(1, len(words) - 1))
    words[pos] = ADJS[int(rng.integers(0, len(ADJS)))]
    return " ".join(words)


def langid_corpus(n_per_lang: int = 5000, seed: int = 4242) -> tuple[list[str], list[str]]:
    """(texts, labels) for training the hashed-ngram langid classifier."""
    texts, labels = [], []
    for li, lang in enumerate(LANGS):
        for i in range(n_per_lang):
            rng = np.random.default_rng((seed << 8) + li * 1_000_003 + i)
            texts.append(gen_clean_en(rng) if lang == "en" else gen_lang(rng, lang))
            labels.append(lang)
    return texts, labels


def lm_corpus(n: int = 20000, seed: int = 7777) -> list[str]:
    """Clean English-like sentences for the n-gram LM."""
    return [gen_clean_en(np.random.default_rng((seed << 8) + i)) for i in range(n)]
