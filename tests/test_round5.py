"""Round-5 additions: char-trigram language ID (profiles, scoring,
decision rule, accuracy on a labeled multi-language fixture) and the
interpolated trigram LM."""

import math
import re

import pytest

from xmlschema_spark.operators import text as T

# labeled fixture: original sentences per language, disjoint from the
# profile seed samples (different topic/vocabulary), so the accuracy
# check measures generalization, not memorization
FIXTURE = [
    ("en", "The train arrived late in the evening and we waited for our friends near the old bridge."),
    ("en", "She wrote a long letter about the journey and posted it from a small village by the sea."),
    ("en", "There is nothing better than a warm meal after a long day of walking in the rain."),
    ("de", "Der Zug kam erst am späten Abend an und wir warteten auf unsere Freunde bei der alten Brücke."),
    ("de", "Sie schrieb einen langen Brief über die Reise und schickte ihn aus einem kleinen Dorf am Meer."),
    ("de", "Es gibt nichts Besseres als ein warmes Essen nach einem langen Tag im Regen."),
    ("fr", "Le train est arrivé tard dans la soirée et nous avons attendu nos amis près du vieux pont."),
    ("fr", "Elle a écrit une longue lettre sur le voyage et l a envoyée depuis un petit village au bord de la mer."),
    ("fr", "Il n y a rien de mieux qu un repas chaud après une longue journée de marche sous la pluie."),
    ("es", "El tren llegó tarde por la noche y esperamos a nuestros amigos cerca del puente viejo."),
    ("es", "Ella escribió una carta larga sobre el viaje y la envió desde un pueblo pequeño junto al mar."),
    ("es", "No hay nada mejor que una comida caliente después de un largo día caminando bajo la lluvia."),
    ("it", "Il treno è arrivato tardi la sera e abbiamo aspettato i nostri amici vicino al vecchio ponte."),
    ("it", "Ha scritto una lunga lettera sul viaggio e l ha spedita da un piccolo paese in riva al mare."),
    ("pt", "O trem chegou tarde da noite e esperamos os nossos amigos perto da ponte velha."),
    ("pt", "Ela escreveu uma longa carta sobre a viagem e enviou a de uma pequena aldeia junto ao mar."),
    ("zh", "火车晚上很晚才到 我们在老桥边等朋友"),
]


def test_trigram_profiles_deterministic_and_shaped():
    b1, w1 = T.build_trigram_profiles()
    b2, w2 = T.build_trigram_profiles()
    assert b1 == b2 and w1 == w2  # pure function of the embedded samples
    assert sorted(b1) == ["de", "en", "es", "fr", "it", "pt"]
    per_lang = {}
    for lang, tri, bonus in w1:
        per_lang.setdefault(lang, []).append((tri, bonus))
        assert len(tri) == 3 and bonus > 0  # seen trigrams always beat floor
    assert all(len(v) == 200 for v in per_lang.values())
    assert all(base < 0 for base in b1.values())


def test_trigram_langid_accuracy(spark):
    """Every fixture sentence (held out from the profile samples) must be
    identified correctly — six Latin languages plus the CJK fast path."""
    df = spark.createDataFrame(
        [(i, lang, s) for i, (lang, s) in enumerate(FIXTURE)],
        "doc_id long, lang string, text string",
    )
    out = {r.doc_id: r for r in T.detect_language_trigram(df, "text", "doc_id").collect()}
    wrong = [
        (FIXTURE[i][0], out[i].lang_pred, FIXTURE[i][1][:40])
        for i in range(len(FIXTURE))
        if out[i].lang_pred != FIXTURE[i][0]
    ]
    assert not wrong, wrong


def test_trigram_langid_decision_rule(spark):
    """und for no-trigram docs, NULL for NULL text, zh beats trigram
    evidence, integer scores present only on the scored path."""
    df = spark.createDataFrame(
        [
            (1, "12345 --- !!!"),
            (2, None),
            (3, "the house 火车 of the people"),  # CJK wins over en words
            (4, "ab"),  # one padded trigram minimum? ' ab ' -> 2 trigrams
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in T.detect_language_trigram(df, "text", "doc_id").collect()}
    assert out[1].lang_pred == "und" and out[1].n_trigrams == 0 and out[1].score is None
    assert out[2].lang_pred is None
    assert out[3].lang_pred == "zh" and out[3].score is None
    assert out[4].lang_pred in {"de", "en", "es", "fr", "it", "pt"}
    assert out[4].n_trigrams == 2 and isinstance(out[4].score, int)


def test_trigram_langid_tie_is_deterministic(spark):
    """A doc whose trigrams hit NO profile scores n_tri*base for every
    language; ties resolve to the lexicographically smallest code — and
    the bases differ, so verify the rule on the actual argmax."""
    bases, _ = T.build_trigram_profiles()
    df = spark.createDataFrame([(1, "zzzzqqqqxxxx")], "doc_id long, text string")
    r = T.detect_language_trigram(df, "text", "doc_id").collect()[0]
    n = r.n_trigrams
    # expected winner: max n*base, tie -> smallest lang code
    want = min(sorted(bases), key=lambda lang: (-n * bases[lang], lang))
    assert r.lang_pred == want and r.score == n * bases[want]


# --------------------------------------------------------------------------
# interpolated trigram LM
# --------------------------------------------------------------------------

def _toks(s):
    return [t for t in re.split(r"[^\w']+", s.lower()) if t]


def _py_lm3_scores(docs, alpha=0.5, lambdas=(0.5, 0.3, 0.2)):
    """Independent plain-Python replay of ngram_lm3_score (model = the
    scored corpus itself)."""
    from collections import Counter

    toks = {d: _toks(t) for d, t in docs}
    c123, c12, c1 = Counter(), Counter(), Counter()
    n = 0
    for t in toks.values():
        n += len(t)
        c1.update(t)
        c12.update(zip(t, t[1:]))
        c123.update(zip(t, t[1:], t[2:]))
    v = len(c1)
    l3, l2, l1 = lambdas
    out = {}
    for d, t in toks.items():
        trips = list(zip(t, t[1:], t[2:]))
        if not trips:
            out[d] = (0, None)
            continue
        lps = []
        for w1, w2, w3 in trips:
            p3 = (c123[(w1, w2, w3)] + alpha) / (c12[(w1, w2)] + alpha * v)
            p2 = (c12[(w2, w3)] + alpha) / (c1[w2] + alpha * v)
            p1 = (c1[w3] + alpha) / (n + alpha * v)
            lps.append(math.log(l3 * p3 + l2 * p2 + l1 * p1))
        out[d] = (len(lps), sum(lps) / len(lps))
    return out


LM3_DOCS = [
    (1, "the cat sat on the mat and the cat slept"),
    (2, "the dog sat on the mat and the dog slept"),
    (3, "zq xv qp zz xq"),            # all-unseen trigrams (floor mixture)
    (4, "the cat sat on the mat and the cat slept"),  # duplicate of 1
    (5, "two words"),                  # < 3 tokens -> no trigrams
    (6, "one"),
]


def test_lm3_matches_python_replay(spark):
    df = spark.createDataFrame(LM3_DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_trigrams, r.avg_logp)
        for r in T.ngram_lm3_score(df, "doc_id", "text").collect()
    }
    want = _py_lm3_scores(LM3_DOCS)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        if want[d][1] is None:
            assert got[d][1] is None
        else:
            assert got[d][1] == pytest.approx(want[d][1], rel=1e-9), d


def test_lm3_orders_quality_sensibly(spark):
    """Identical docs score identically; the all-unseen gibberish doc
    lands strictly below the natural docs; ppl = exp(-avg_logp)."""
    df = spark.createDataFrame(LM3_DOCS, "doc_id long, text string")
    got = {r.doc_id: r for r in T.ngram_lm3_score(df, "doc_id", "text").collect()}
    assert got[1].avg_logp == got[4].avg_logp
    assert got[3].avg_logp < got[1].avg_logp
    assert got[3].avg_logp < got[2].avg_logp
    assert got[1].ppl == pytest.approx(math.exp(-got[1].avg_logp))
    assert got[5].n_trigrams == 0 and got[5].avg_logp is None and got[5].ppl is None


def test_lm3_separate_model_corpus(spark):
    """model_df path: scores depend on the MODEL corpus, not the scored
    docs; column names on the model side are irrelevant (placeholder id)."""
    model = [(f"m{i}", "the cat sat on the mat " * 3) for i in range(4)]
    docs = [(1, "the cat sat on the mat"), (2, "mat the on sat cat the")]
    mdf = spark.createDataFrame(model, "mid string, body string")
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.avg_logp
        for r in T.ngram_lm3_score(
            ddf, "doc_id", "text", model_df=mdf, model_text_col="body"
        ).collect()
    }
    # doc 1 matches the model phrasing; doc 2 is its shuffle -> lower
    assert got[1] > got[2]


def test_lm3_param_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="alpha"):
        T.ngram_lm3_score(df, "doc_id", "text", alpha=0.0)
    with pytest.raises(ValueError, match="lambdas"):
        T.ngram_lm3_score(df, "doc_id", "text", lambdas=(0.5, 0.5, 0.5))
    with pytest.raises(ValueError, match="lambdas"):
        T.ngram_lm3_score(df, "doc_id", "text", lambdas=(1.0, 0.0, 0.0))


def test_lm3_bigram_path_unchanged(spark):
    """The round-4-certified bigram scorer still gives its exact shape
    on the same fixture (guard against accidental coupling)."""
    df = spark.createDataFrame(LM3_DOCS, "doc_id long, text string")
    out = T.ngram_lm_score(df, "doc_id", "text")
    assert out.columns == ["doc_id", "n_bigrams", "avg_logp", "ppl"]
    got = {r.doc_id: r.n_bigrams for r in out.collect()}
    assert got[5] == 1 and got[6] == 0 and got[1] == 9


# --------------------------------------------------------------------------
# declarative lang_expected rule kind
# --------------------------------------------------------------------------

def test_lang_expected_rule_kind(spark):
    """The caption-language gate runs inside the normal engine pass:
    non-English captions violate, NULL passes (not_null owns missingness),
    'und' is acceptable when listed."""
    from xmlschema_spark.engine import ValidationEngine
    from xmlschema_spark.rules import Rule, RuleSet

    df = spark.createDataFrame(
        [
            ("a", "the cat sat on the mat and it was happy there", "p0"),
            ("b", "der zug kam erst am späten abend an und die kinder warteten", "p0"),
            ("c", "这是一个中文句子", "p0"),
            ("d", None, "p0"),
            ("e", "12345 --- !!!", "p0"),  # 'und'
        ],
        "doc_id string, caption string, part string",
    )
    rules = RuleSet([
        Rule(rule_id="caption_en", kind="lang_expected", column="caption",
             params={"langs": ["en", "und"]}),
    ])
    res = ValidationEngine(rules, id_col="doc_id", partition_col="part").validate(
        df, run_id="lang", with_stats=False
    )
    bad = sorted(r.row_id for r in res.violations.collect())
    assert bad == ["b", "c"]


def test_lang_expected_rule_kind_bad_params():
    from xmlschema_spark.rules import Rule, RuleCompileError
    from xmlschema_spark.operators.text import _lang_rule_ok

    with pytest.raises(RuleCompileError, match="lang_expected"):
        _lang_rule_ok(Rule(rule_id="x", kind="lang_expected", column="caption"))
    with pytest.raises(RuleCompileError, match="lang_expected"):
        _lang_rule_ok(Rule(rule_id="x", kind="lang_expected", column="caption",
                           params={"langs": "en"}))


def test_trigram_langid_beats_stopword_heuristic_on_italian(spark):
    """The trigram path identifies languages the 4-language stopword
    heuristic cannot (it/pt are not in STOPWORDS at all)."""
    s = "il treno è arrivato tardi la sera e abbiamo aspettato i nostri amici"
    df = spark.createDataFrame([(1, s)], "doc_id long, text string")
    assert T.detect_language_trigram(df, "text", "doc_id").collect()[0].lang_pred == "it"
    assert "it" not in T.STOPWORDS
