import numpy as np

from open_thoughts_ray.ops.scrub import scrub_many, scrub_text
from open_thoughts_ray.ops.text_rules import RuleConfig, caption_stats, first_drop_reason


def _reasons(caps, lang=None, ppl=None, cfg=None):
    cfg = cfg or RuleConfig()
    lang = lang or ["en"] * len(caps)
    ppl = ppl if ppl is not None else [50.0] * len(caps)
    return list(
        first_drop_reason(
            caption_stats(caps), np.asarray(lang, dtype=object),
            np.asarray(ppl, dtype=np.float64), cfg,
        )
    )


def test_rule_order_and_reasons():
    caps = [
        "",
        "ab",
        "x" * 600,
        "the small cat sits on the old mat.",
        "word word word word word word",
        "the cat # # # # # # sits % % % %",
        "zorvax milkar pentol quoz vanter relpix grandel",
    ]
    lang = ["en", "en", "en", "en", "en", "en", "en"]
    ppl = [50, 50, 50, 50, 50, 50, 2000.0]
    got = _reasons(caps, lang, ppl)
    assert got == ["empty", "too_short", "too_long", "", "repetition", "symbol", "ppl"]


def test_lang_rule():
    assert _reasons(["αβγ δεζ ηθι κλμν οπρστ"], ["xx1"]) == ["lang"]


def test_stopword_rule():
    # no stopwords but low ppl and unique words
    caps = ["golden harbor drifts silver window bright castle"]
    assert _reasons(caps) == ["stopword"]


def test_scrub_targets():
    assert scrub_text("mail me at bob.smith+1@example9.com now") == "mail me at <EMAIL> now"
    assert scrub_text("see https://www.x.com/a?b=1 page") == "see <URL> page"
    assert scrub_text("ssn 123-45-6789 ok") == "ssn <SSN> ok"
    assert scrub_text("call 555-123-4567 today") == "call <PHONE> today"
    assert scrub_text("you CrudWordo person") == "you **** person"


def test_scrub_order_url_before_email():
    # an email-looking substring inside a URL is consumed by the URL rule
    assert scrub_text("go to https://a.com/x@y.com thanks") == "go to <URL> thanks"


def test_scrub_many_matches_scalar():
    texts = [
        "a@b.co and https://q.org plus 999-88-7777 and 333-555-1234 crudwordo",
        "plain caption with no pii at all",
    ]
    assert scrub_many(texts) == [scrub_text(t) for t in texts]
