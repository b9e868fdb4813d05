"""Char-trigram multinomial Naive Bayes language ID (en / de / fr / es).

Upgrade of the marker-word heuristic (r6 verdict ask #5): a real
character-trigram NB model, trained at import time from the embedded
PUBLIC-knowledge corpus below (UDHR Article 1 — public domain — plus
everyday sentences composed for this module). Training is deterministic
counting (no RNG, no external file), the model is a few hundred
log-probability constants, and scoring is pure column expressions —
map-literal lookup inside a single ``aggregate`` fold per language, all
constant-folded JVM-side, zero per-row Python, zero shuffle.

Scoring: score_l(doc) = Σ_t W_l(t) over the doc's char trigrams, where
W_l(t) is the add-α-smoothed log P(t | l) **quantized to integer
micro-nats** (round(log_p · 1e6), stored as BIGINT). Trigrams outside
language l's top-K table get that language's quantized miss constant.
Integer sums are exact and associative, so the engine's sequential
``aggregate`` fold and the oracle's join-then-SUM produce bit-identical
scores regardless of addition order — no float rounding boundary can
diverge between engines. The predicted language is the argmax of the
integer scores with alphabetical tie-break; documents with no trigrams
(empty after normalization) get 'und'.

The DuckDB oracle (queries_pipeline._langid_oracle_sql) replays the
identical model from the same weight dict via :func:`oracle_values_rows`:
normalization regex, trigram extraction, per-language weight-or-miss,
integer sum, argmax chain.

Reference parity: the reference ships no language-ID operator; this is
part of the LLM-training-data pipeline surface (language filtering before
mixing/packing), modeled on the public n-gram NB approach of langid.py
(Lui & Baldwin 2012) at toy scale.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LANGS = ["de", "en", "es", "fr"]

# characters kept by normalization: ascii letters, the accented letters
# used by the four languages, and space. Shared with the oracle SQL.
NORM_KEEP_RE = "[^a-zäöüßáéíóúñàèùâêîôûçœ ]+"

_ALPHA = 0.5
_TOP_K = 250
_SCALE = 1_000_000  # micro-nats per nat: weights are round(log_p * _SCALE)

# ---------------------------------------------------------------- corpus
# UDHR Article 1 (public domain) + everyday sentences composed for this
# module. ~15 sentences per language — enough for a 4-way trigram NB.
_CORPUS: dict[str, str] = {
    "en": (
        "all human beings are born free and equal in dignity and rights "
        "they are endowed with reason and conscience and should act "
        "towards one another in a spirit of brotherhood "
        "the quick brown fox jumps over the lazy dog "
        "what time is it please "
        "i would like a cup of coffee "
        "where is the nearest train station "
        "this book about history is very interesting "
        "we are going to the market tomorrow morning "
        "she said that it was raining all day "
        "the weather today is cold and windy "
        "how much does this cost "
        "thank you very much for your help "
        "the children are playing in the garden "
        "he works in an office in the city "
        "can you tell me the way to the museum "
        "i do not understand what you mean "
        "the meeting starts at nine in the morning "
        "people often travel by bus or by bicycle across town "
        "science teaches us how plants grow from tiny seeds "
        "music from the old radio filled every room of the house "
        "after dinner they walked along the beach and watched boats "
        "a good night of sleep makes hard work feel easier "
        "winter brings snow while spring brings flowers and light rain "
        "everyone agreed that the story had a surprising ending "
        "learning new things keeps the mind young and curious "
        "some questions have simple answers and some have none "
        "their house stands near a quiet lake between two hills "
        "it might seem strange but many answers change with time "
        "friends who listen well are worth more than gold "
        "nothing beats warm soup on a freezing evening "
        "each language sounds different yet says similar things "
        "the early light of day slowly crossed the empty street "
        "walking and running through rough country is tiring though rewarding "
        "she was thinking about visiting the young painters studio "
        "they found enough mushrooms although the ground was slippery "
        "our neighbours proudly brought round various housewarming gifts "
        "carefully studying helps anyone remember surprisingly tricky spellings "
        "without doubt the journey south sounds thoroughly exciting"
    ),
    "de": (
        "alle menschen sind frei und gleich an würde und rechten geboren "
        "sie sind mit vernunft und gewissen begabt und sollen einander im "
        "geist der brüderlichkeit begegnen "
        "der schnelle braune fuchs springt über den faulen hund "
        "wie spät ist es bitte "
        "ich hätte gerne eine tasse kaffee "
        "wo ist der nächste bahnhof "
        "dieses buch über geschichte ist sehr interessant "
        "wir gehen morgen früh auf den markt "
        "sie sagte dass es den ganzen tag geregnet hat "
        "das wetter ist heute kalt und windig "
        "wie viel kostet das bitte "
        "vielen dank für ihre hilfe "
        "die kinder spielen im garten "
        "er arbeitet in einem büro in der stadt "
        "können sie mir den weg zum museum zeigen "
        "ich verstehe nicht was sie meinen "
        "die besprechung beginnt um neun uhr morgens "
        "viele leute fahren mit dem bus oder mit dem fahrrad durch die stadt "
        "die wissenschaft zeigt uns wie pflanzen aus kleinen samen wachsen "
        "musik aus dem alten radio erfüllte jedes zimmer des hauses "
        "nach dem essen gingen sie am strand entlang und sahen schiffe "
        "ein guter schlaf macht schwere arbeit leichter "
        "der winter bringt schnee während der frühling blumen bringt "
        "alle waren sich einig dass die geschichte überraschend endete "
        "neues zu lernen hält den kopf jung und neugierig "
        "manche fragen haben einfache antworten und manche keine "
        "ihr haus steht an einem ruhigen see zwischen zwei hügeln "
        "es mag seltsam klingen aber viele antworten ändern sich "
        "freunde die gut zuhören sind mehr wert als gold "
        "nichts geht über warme suppe an einem kalten abend "
        "jede sprache klingt anders und sagt doch ähnliches "
        "das frühe licht des tages zog langsam über die leere straße"
    ),
    "fr": (
        "tous les êtres humains naissent libres et égaux en dignité et en "
        "droits ils sont doués de raison et de conscience et doivent agir "
        "les uns envers les autres dans un esprit de fraternité "
        "le rapide renard brun saute par dessus le chien paresseux "
        "quelle heure est il sil vous plaît "
        "je voudrais une tasse de café "
        "où est la gare la plus proche "
        "ce livre sur lhistoire est très intéressant "
        "nous allons au marché demain matin "
        "elle a dit quil a plu toute la journée "
        "le temps est froid et venteux aujourdhui "
        "combien ça coûte "
        "merci beaucoup pour votre aide "
        "les enfants jouent dans le jardin "
        "il travaille dans un bureau en ville "
        "pouvez vous me montrer le chemin du musée "
        "je ne comprends pas ce que vous voulez dire "
        "la réunion commence à neuf heures du matin "
        "beaucoup de gens se déplacent en bus ou à vélo dans la ville "
        "la science nous montre comment les plantes poussent depuis de petites graines "
        "la musique de la vieille radio remplissait chaque pièce de la maison "
        "après le dîner ils ont marché le long de la plage en regardant les bateaux "
        "une bonne nuit de sommeil rend le travail difficile plus facile "
        "lhiver apporte la neige tandis que le printemps apporte des fleurs "
        "tout le monde a trouvé que lhistoire finissait de façon surprenante "
        "apprendre de nouvelles choses garde lesprit jeune et curieux "
        "certaines questions ont des réponses simples et dautres aucune "
        "leur maison se trouve près dun lac calme entre deux collines "
        "cela peut sembler étrange mais beaucoup de réponses changent "
        "les amis qui savent écouter valent plus que lor "
        "rien ne vaut une soupe chaude par un soir glacial "
        "chaque langue sonne autrement et dit pourtant des choses semblables "
        "la première lumière du jour traversait lentement la rue vide"
    ),
    "es": (
        "todos los seres humanos nacen libres e iguales en dignidad y "
        "derechos y dotados como están de razón y conciencia deben "
        "comportarse fraternalmente los unos con los otros "
        "el rápido zorro marrón salta sobre el perro perezoso "
        "qué hora es por favor "
        "me gustaría una taza de café "
        "dónde está la estación de tren más cercana "
        "este libro sobre historia es muy interesante "
        "vamos al mercado mañana por la mañana "
        "ella dijo que llovió todo el día "
        "el tiempo hoy es frío y ventoso "
        "cuánto cuesta esto "
        "muchas gracias por su ayuda "
        "los niños juegan en el jardín "
        "él trabaja en una oficina en la ciudad "
        "puede decirme el camino al museo "
        "no entiendo lo que quiere decir "
        "la reunión empieza a las nueve de la mañana "
        "mucha gente se mueve en autobús o en bicicleta por la ciudad "
        "la ciencia nos muestra cómo las plantas crecen desde pequeñas semillas "
        "la música de la vieja radio llenaba cada habitación de la casa "
        "después de cenar caminaron por la playa mirando los barcos "
        "una buena noche de sueño hace más fácil el trabajo duro "
        "el invierno trae nieve mientras la primavera trae flores "
        "todos pensaron que la historia terminaba de forma sorprendente "
        "aprender cosas nuevas mantiene la mente joven y curiosa "
        "algunas preguntas tienen respuestas sencillas y otras ninguna "
        "su casa está cerca de un lago tranquilo entre dos colinas "
        "puede parecer extraño pero muchas respuestas cambian con el tiempo "
        "los amigos que saben escuchar valen más que el oro "
        "nada supera una sopa caliente en una noche helada "
        "cada lengua suena distinto y sin embargo dice cosas parecidas "
        "la primera luz del día cruzaba despacio la calle vacía"
    ),
}


def normalize_py(text: str) -> str:
    """Python twin of the engine/oracle normalization (for training and
    tests): lower → keep-class → collapse spaces → trim → pad."""
    import re

    x = re.sub(NORM_KEEP_RE, " ", text.lower())
    x = re.sub(" +", " ", x).strip()
    return f" {x} " if x else ""


def trigrams_py(text: str) -> list[str]:
    x = normalize_py(text)
    return [x[i : i + 3] for i in range(len(x) - 2)] if len(x) >= 3 else []


def _train() -> tuple[dict[str, dict[str, int]], dict[str, int]]:
    counts = {
        lang: Counter(
            normalize_py(corpus)[i : i + 3]
            for i in range(len(normalize_py(corpus)) - 2)
        )
        for lang, corpus in _CORPUS.items()
    }
    vocab_size = len(set().union(*counts.values()))
    model: dict[str, dict[str, int]] = {}
    miss: dict[str, int] = {}
    for lang in LANGS:
        c = counts[lang]
        n = sum(c.values())
        denom = n + _ALPHA * vocab_size
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOP_K]
        model[lang] = {
            t: round(math.log((k + _ALPHA) / denom) * _SCALE) for t, k in top
        }
        miss[lang] = round(math.log(_ALPHA / denom) * _SCALE)
    return model, miss


LANG_MODEL, LANG_MISS = _train()


def score_py(text: str) -> dict[str, int]:
    """Python twin of the engine scoring (micro-nat integer sums) for tests."""
    tgs = trigrams_py(text)
    return {
        lang: sum(LANG_MODEL[lang].get(t, LANG_MISS[lang]) for t in tgs)
        for lang in LANGS
    }


def predict_py(text: str) -> str:
    tgs = trigrams_py(text)
    if not tgs:
        return "und"
    s = score_py(text)
    # argmax, alphabetical tie-break (LANGS is sorted)
    return max(LANGS, key=lambda lang: (s[lang], -LANGS.index(lang)))


# ------------------------------------------------------- engine exprs
def _norm_col(c: Column) -> Column:
    x = F.regexp_replace(F.lower(c), NORM_KEEP_RE, " ")
    x = F.trim(F.regexp_replace(x, " +", " "))
    return F.when(F.length(x) > 0, F.concat(F.lit(" "), x, F.lit(" "))).otherwise(
        F.lit("")
    )


def add_language_scores(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "lang_pred",
    keep_scores: bool = False,
) -> DataFrame:
    """Append ``out_col`` (predicted language) and, with ``keep_scores``,
    the per-language integer micro-nat NB scores (score_de … score_fr).

    Plan shape: normalized text and the trigram array are projected ONCE
    as columns (never re-derived inside lambda bodies — the measured
    per-element re-evaluation cliff); each language score is a single
    ``aggregate`` fold over the trigram column with a constant-folded
    map-literal lookup. No shuffle, no Python, no window. BIGINT
    accumulators keep engine and oracle sums bit-identical."""
    nt, tg = "__lid_nt", "__lid_tg"
    out = df.withColumn(nt, _norm_col(F.col(text_col)))
    out = out.withColumn(
        tg,
        F.when(
            F.length(F.col(nt)) >= 3,
            F.expr(f"transform(sequence(1, length({nt}) - 2), i -> substring({nt}, i, 3))"),
        ).otherwise(F.expr("cast(array() as array<string>)")),
    )
    score_cols = {}
    for lang in LANGS:
        mcol = f"__lid_m_{lang}"
        entries = ", ".join(
            f"'{t}', {v}L" for t, v in sorted(LANG_MODEL[lang].items())
        )
        out = out.withColumn(mcol, F.expr(f"map({entries})"))
        sc = f"score_{lang}"
        out = out.withColumn(
            sc,
            F.expr(
                f"aggregate({tg}, CAST(0 AS BIGINT), (a, t) -> "
                f"a + coalesce(element_at({mcol}, t), {LANG_MISS[lang]}L))"
            ),
        )
        score_cols[lang] = F.col(sc)
    s = score_cols
    pred = (
        F.when(F.size(F.col(tg)) == 0, F.lit("und"))
        .when((s["de"] >= s["en"]) & (s["de"] >= s["es"]) & (s["de"] >= s["fr"]), F.lit("de"))
        .when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]), F.lit("en"))
        .when(s["es"] >= s["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    out = out.withColumn(out_col, pred)
    drop = [nt, tg] + [f"__lid_m_{lang}" for lang in LANGS]
    if not keep_scores:
        drop += [f"score_{lang}" for lang in LANGS]
    return out.drop(*drop)


# ------------------------------------------------------- oracle pieces
def oracle_values_rows() -> list[str]:
    """One VALUES row per inventory trigram: (tg, w_de, w_en, w_es, w_fr),
    each weight = the language's table entry or its miss constant —
    exactly the engine's per-language map-or-miss semantics. Weights are
    integer micro-nats, so the oracle's SUM is exact."""
    inv = sorted(set().union(*[set(LANG_MODEL[lang]) for lang in LANGS]))
    rows = []
    for t in inv:
        ws = ", ".join(
            str(LANG_MODEL[lang].get(t, LANG_MISS[lang])) for lang in LANGS
        )
        rows.append(f"('{t}', {ws})")
    return rows
