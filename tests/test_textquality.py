"""paragraph_quality (jusText-style tier) and unigram_surprisal
(CCNet-style unigram-LM signal): naive-reference parity + edge cases."""

import math

import pyarrow as pa

import ray.data

from dedup.textstats import (_STOPWORDS, paragraph_quality,
                             unigram_surprisal)

EN = _STOPWORDS["en"]


def _naive_para_quality(text, short_chars=40, denom=4):
    n_paras = n_short = n_boiler = n_good = good_chars = 0
    for p in (text or "").split("\n\n"):
        n_paras += 1
        toks = [t for t in p.split() if t]
        n_stop = sum(1 for t in toks if t in EN)
        if len(p) < short_chars:
            n_short += 1
        elif n_stop * denom < len(toks):
            n_boiler += 1
        else:
            n_good += 1
            good_chars += len(p)
    return n_paras, n_short, n_boiler, n_good, good_chars


PARA_TEXTS = [
    # good: long, stopword-dense
    "the cat sat on the mat and it was very happy about this in the sun "
    "for a long while as the day went by\n\nnav home products contact",
    # boilerplate only (long, no stopwords) + short
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu "
    "xi omicron pi rho sigma tau\n\nok",
    "",                                    # one short (empty) paragraph
    "the and of to in is that it was for on with as at by this are be",
]


def test_paragraph_quality_matches_naive():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(PARA_TEXTS))), "text": PARA_TEXTS}))
    got = {r["doc_id"]: r for r in
           paragraph_quality(ds).sort("doc_id").take_all()}
    for i, txt in enumerate(PARA_TEXTS):
        exp = _naive_para_quality(txt)
        r = got[i]
        assert (r["n_paras"], r["n_short"], r["n_boiler"], r["n_good"],
                r["good_chars"]) == exp, (i, r, exp)


def test_paragraph_quality_shuffle_free_across_partitions():
    t = pa.table({"doc_id": list(range(len(PARA_TEXTS))),
                  "text": PARA_TEXTS})
    a = paragraph_quality(ray.data.from_arrow(t)).sort("doc_id").take_all()
    b = paragraph_quality(
        ray.data.from_arrow(t).repartition(3)).sort("doc_id").take_all()
    assert a == b


SURP_TEXTS = ["a a b", "b c", "", "a"]


def test_unigram_surprisal_matches_naive():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(SURP_TEXTS))), "text": SURP_TEXTS}))
    got = {r["doc_id"]: r for r in
           unigram_surprisal(ds).sort("doc_id").take_all()}
    toks = [t for txt in SURP_TEXTS for t in txt.split() if t]
    total = len(toks)
    cnt = {t: toks.count(t) for t in set(toks)}
    lp6 = {t: math.floor(math.log(c / total) * 1e6) for t, c in cnt.items()}
    for i, txt in enumerate(SURP_TEXTS):
        dt = [t for t in txt.split() if t]
        exp_n = len(dt)
        exp_s = (-sum(lp6[t] for t in dt)) // exp_n if exp_n else 0
        assert got[i]["n_tokens"] == exp_n, i
        assert got[i]["surprisal_e6"] == exp_s, i


def test_unigram_surprisal_rare_scores_higher():
    # doc of one rare token must out-score a doc of common tokens
    texts = ["the the the the the the", "zyzzyva"]
    ds = ray.data.from_arrow(pa.table({"doc_id": [0, 1], "text": texts}))
    got = {r["doc_id"]: r["surprisal_e6"] for r in
           unigram_surprisal(ds).take_all()}
    assert got[1] > got[0]
