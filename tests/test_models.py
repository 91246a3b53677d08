import numpy as np

from open_thoughts_ray.fixtures import textgen
from open_thoughts_ray.models import artifacts


def test_langid_heldout_accuracy():
    lid = artifacts.load_langid()
    texts, labels = [], []
    for li, lang in enumerate(textgen.LANGS):
        for i in range(100):
            rng = np.random.default_rng(555_000 + li * 1000 + i)
            texts.append(
                textgen.gen_clean_en(rng) if lang == "en" else textgen.gen_lang(rng, lang)
            )
            labels.append(lang)
    pred, conf = lid.predict_batch(texts)
    assert np.mean([p == l for p, l in zip(pred, labels)]) >= 0.99
    assert conf.min() > 0.5


def test_langid_batch_matches_single():
    """Actor-pool batch scoring must equal the oracle's one-row scoring."""
    lid = artifacts.load_langid()
    texts = [
        textgen.gen_caption(np.random.default_rng(123_000 + i),
                            textgen.pick_class(np.random.default_rng(321_000 + i)))
        for i in range(100)
    ]
    labels_b, conf_b = lid.predict_batch(texts)
    for i, t in enumerate(texts):
        l1, c1 = lid.predict_one(t)
        assert l1 == labels_b[i]
        assert np.float32(c1) == np.float32(conf_b[i])


def test_langid_serialization_roundtrip():
    from open_thoughts_ray.models.fasttext_like import HashedNgramClassifier

    lid = artifacts.load_langid()
    lid2 = HashedNgramClassifier.from_bytes(lid.to_bytes())
    assert lid2.classes == lid.classes
    assert np.array_equal(lid2.W, lid.W)


def test_lm_separates_clean_from_salad():
    lm = artifacts.load_lm()
    clean = [textgen.gen_clean_en(np.random.default_rng(900_000 + i)) for i in range(200)]
    salad = [textgen.gen_word_salad(np.random.default_rng(910_000 + i)) for i in range(200)]
    pc = lm.perplexity_batch(clean)
    ps = lm.perplexity_batch(salad)
    assert pc.max() < 1000.0 < ps.min()


def test_lm_deterministic_roundtrip():
    from open_thoughts_ray.models.ngram_lm import BigramLM

    lm = artifacts.load_lm()
    lm2 = BigramLM.from_bytes(lm.to_bytes())
    for i in range(20):
        t = textgen.gen_clean_en(np.random.default_rng(77_000 + i))
        assert lm.perplexity(t) == lm2.perplexity(t)


def test_artifacts_deterministic():
    import hashlib

    a = artifacts.build_langid_bytes()
    b = artifacts.build_langid_bytes()
    assert hashlib.sha256(a).hexdigest() == hashlib.sha256(b).hexdigest()


def test_train_bigram_lm_distributed_bit_identical(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from open_thoughts_ray.models.ngram_lm import BigramLM
    from open_thoughts_ray.ops.perplexity import train_bigram_lm_distributed

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(words, size=int(rng.integers(3, 12))))
             for _ in range(60)]
    df = pd.DataFrame({"doc_id": range(60), "text": texts})

    serial = BigramLM.train(list(df.sort_values("doc_id")["text"]))
    # shuffle the row order/partitioning — the fit must not care
    ds = rd.from_pandas(df.sample(frac=1.0, random_state=3)).repartition(7)
    dist_bytes = train_bigram_lm_distributed(ds)

    assert dist_bytes == serial.to_bytes()
    lm = BigramLM.from_bytes(dist_bytes)
    probe = ["alpha beta gamma", "zeta zeta unseen"]
    assert np.allclose(lm.perplexity_batch(probe),
                       serial.perplexity_batch(probe), rtol=0, atol=0)
