"""Input schema + deterministic synthetic Common-Crawl-style pages table.

Authoritative input shape (BASELINE.json input_hint):
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

The synthesizer is **distributed and partitioning-invariant**: it runs as
`mapInPandas` over `spark.range(n)`, and every row is generated from a
per-row RNG seeded by a hash of (seed, doc id) — so the same (seed, n)
produces byte-identical rows at any parallelism level (the determinism
invariant FIXTURES.md requires), and generation scales linearly with
executors (no driver bottleneck at 500k+ rows).

Skew: domains are drawn Zipf-style with `mega0.example.com` holding ≥20% of
rows, to exercise the salting/repartition paths.
"""

from __future__ import annotations

import random
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# --- corpus building blocks (frozen) ---------------------------------------

_EN_SENTS = (
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "It was a bright cold day in April and the clocks were striking thirteen.",
    "She opened the window and looked out at the quiet street below.",
    "The committee agreed that the proposal was sound and should be adopted.",
    "He walked to the market in the morning to buy fresh bread and fruit.",
    "Many people believe that regular exercise is important for good health.",
    "The history of this small town is longer than most visitors expect.",
    "After the storm passed, the children went outside to play in the park.",
)
_DE_SENTS = (
    "Der schnelle braune Fuchs springt über den faulen Hund im Garten.",
    "Es war ein kalter Tag und die Stadt war still und leer.",
    "Sie öffnete das Fenster und sah auf die ruhige Straße hinunter.",
    "Viele Leute glauben dass Bewegung wichtig für die Gesundheit ist.",
)
_FR_SENTS = (
    "Le renard brun rapide saute par dessus le chien paresseux du village.",
    "Elle ouvrit la fenêtre et regarda la rue calme en bas de la maison.",
    "Beaucoup de gens pensent que le sport est important pour la santé.",
    "Après la pluie les enfants sont sortis pour jouer dans le parc.",
)
_ES_SENTS = (
    "El rápido zorro marrón salta sobre el perro perezoso en el jardín.",
    "Ella abrió la ventana y miró la calle tranquila de abajo.",
    "Mucha gente piensa que el ejercicio es importante para la salud.",
    "Después de la tormenta los niños salieron a jugar en el parque.",
)
_ZH_SENTS = (
    "这是一个安静的小镇历史比大多数游客想象的要长得多。",
    "她打开窗户看着下面安静的街道和远处的山。",
    "许多人认为经常锻炼对身体健康非常重要。",
    "暴风雨过后孩子们出去在公园里玩耍了。",
)
_LANG_SENTS = {"en": _EN_SENTS, "de": _DE_SENTS, "fr": _FR_SENTS, "es": _ES_SENTS, "zh": _ZH_SENTS}
_LANGS = ("en", "en", "en", "en", "de", "fr", "es", "zh")  # en-heavy mix

# Per-language vocabularies for clean-prose sampling: (function words,
# content words).  Function words overlap the rules' STOPWORDS set so clean
# docs register stop-word hits; content words are drawn from the sentence
# corpora above (deduped, punctuation-stripped).
_FUNC_WORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "this", "at", "on"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "mit", "nicht", "auf", "im", "den"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "pas", "des", "du"),
    "es": ("el", "la", "los", "las", "y", "es", "por", "para", "con", "del", "se", "en"),
}


def _content_words(sents: tuple[str, ...]) -> tuple[str, ...]:
    seen: dict[str, None] = {}
    for s in sents:
        for w in s.split():
            w = w.strip(".,;:!?").lower()
            if len(w) >= 3:
                seen.setdefault(w, None)
    return tuple(seen)


_LANG_VOCAB = {
    lang: (_FUNC_WORDS[lang], _content_words(_LANG_SENTS[lang]))
    for lang in ("en", "de", "fr", "es")
}
_ZH_CHARS = "".join(dict.fromkeys("".join(_ZH_SENTS).replace("。", "")))

_PII_SNIPPETS = (
    "contact me at john.doe{i}@example.com for details",
    "call +1 (555) 123-4{i:03d} during office hours",
    "server logs show 192.168.{i2}.{i3} connected twice",
    "ssn on file 123-45-{i:04d} do not share",
)
_TOXIC_WORDS = ("damnword", "toxicterm", "badword")

_DOC_KINDS = (
    # (kind, weight)
    ("clean", 62),
    ("clean_pii", 10),
    ("clean_toxic", 4),
    ("short", 6),
    ("repeat_spam", 6),
    ("symbol_soup", 5),
    ("bullets", 4),
    ("no_stopwords", 3),
)
_KIND_CUM = []
_acc = 0
for _k, _w in _DOC_KINDS:
    _acc += _w
    _KIND_CUM.append((_acc, _k))
_KIND_TOTAL = _acc


def _gen_row(seed: int, i: int) -> tuple[str, datetime, bytes, str, str]:
    rng = random.Random((seed * 1_000_003 + i * 2_654_435_761) % (2**63))
    # Zipf-ish domain skew: ~22% of rows on one mega domain
    r = rng.random()
    if r < 0.22:
        domain = "mega0.example.com"
    elif r < 0.32:
        domain = "mega1.example.com"
    else:
        domain = f"site{rng.randrange(5000)}.example.org"
    url = f"https://{domain}/page/{i}"
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(seconds=i % 31_536_000)

    pick = rng.randrange(_KIND_TOTAL)
    kind = next(k for c, k in _KIND_CUM if pick < c)
    lang = rng.choice(_LANGS)
    sents = _LANG_SENTS[lang]

    if kind in ("clean", "clean_pii", "clean_toxic"):
        if lang == "zh":
            # unsegmented prose: 60–600 chars sampled from the zh charset,
            # sentence-terminated with 。 every 15–30 chars
            chars = _ZH_CHARS
            n = rng.randrange(60, 600)
            buf, run = [], rng.randrange(15, 30)
            for _ in range(n):
                buf.append(chars[rng.randrange(len(chars))])
                run -= 1
                if run == 0:
                    buf.append("。")
                    run = rng.randrange(15, 30)
            text = "".join(buf)
        else:
            func_words, content_words = _LANG_VOCAB[lang]
            n_sents = rng.randrange(5, 20)
            sent_list = []
            for _ in range(n_sents):
                n_w = rng.randrange(6, 15)
                ws = []
                for j in range(n_w):
                    pool = func_words if rng.random() < 0.45 else content_words
                    ws.append(pool[rng.randrange(len(pool))])
                ws[0] = ws[0].capitalize()
                sent_list.append(" ".join(ws) + ".")
            if kind == "clean_pii":
                snip = _PII_SNIPPETS[rng.randrange(len(_PII_SNIPPETS))]
                sent_list.insert(
                    rng.randrange(len(sent_list)),
                    snip.format(i=i % 1000, i2=i % 250, i3=(i * 7) % 250) + ".",
                )
            if kind == "clean_toxic":
                sent_list.insert(
                    rng.randrange(len(sent_list)),
                    f"And then he said {rng.choice(_TOXIC_WORDS)} loudly.",
                )
            # paragraph breaks every 2–4 sentences
            out_lines, k = [], 0
            while k < len(sent_list):
                step = rng.randrange(2, 5)
                out_lines.append(" ".join(sent_list[k : k + step]))
                k += step
            text = "\n".join(out_lines)
    elif kind == "short":
        text = " ".join(sents[0].split()[: rng.randrange(1, 8)])
    elif kind == "repeat_spam":
        phrase = "click here to buy cheap products online now"
        text = " ".join([phrase] * rng.randrange(10, 30))
    elif kind == "symbol_soup":
        toks = ["".join(rng.choice("!@#$%^&*()_+=<>/\\|~`") for _ in range(rng.randrange(2, 8))) for _ in range(rng.randrange(30, 80))]
        # sprinkle a few words so it's not trivially empty of letters
        toks[::7] = [rng.choice(("win", "free", "the", "now")) for _ in toks[::7]]
        text = " ".join(toks)
    elif kind == "bullets":
        items = [f"- {sents[rng.randrange(len(sents))].split('.')[0]}" for _ in range(rng.randrange(12, 25))]
        text = "\n".join(items)
    else:  # no_stopwords
        vocab = ("alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
        text = " ".join(rng.choice(vocab) for _ in range(rng.randrange(40, 120)))

    # well-formed markup (entities escaped, one <p> per paragraph) so the
    # input_hint's per-row invariant — extract(html) byte-equals text per
    # url — holds for EVERY row incl. symbol-soup docs containing <>&;
    # gated by tests/test_htmltext.py::test_pages_fixture_extraction_invariant
    esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    paras = esc.replace("\n", "</p><p>")
    html = f"<html><body><p>{paras}</p></body></html>".encode("utf-8")
    # noisy prior label: 15% wrong, 10% empty
    lr = rng.random()
    if lr < 0.10:
        label = ""
    elif lr < 0.25:
        label = rng.choice([l for l in _LANG_SENTS if l != lang])
    else:
        label = lang
    return url, ts, html, text, label


def synthesize_pages(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table (see module docstring)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_gen_row(seed, int(i)) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    rng_df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def gen_rows_local(n: int, seed: int = 42) -> list[tuple]:
    """Driver-side generator for oracle/golden computation in tests."""
    return [_gen_row(seed, i) for i in range(n)]
