"""Round-5 additions: char-trigram language ID (profiles, scoring,
decision rule, accuracy on a labeled multi-language fixture)."""

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


def test_trigram_langid_beats_stopword_heuristic_on_italian(spark):
    """The trigram path identifies languages the 4-language stopword
    heuristic cannot (it/pt are not in STOPWORDS at all)."""
    s = "il treno è arrivato tardi la sera e abbiamo aspettato i nostri amici"
    df = spark.createDataFrame([(1, s)], "doc_id long, text string")
    assert T.detect_language_trigram(df, "text", "doc_id").collect()[0].lang_pred == "it"
    assert "it" not in T.STOPWORDS
