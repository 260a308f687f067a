"""Deterministic synthetic Common-Crawl-style web_pages corpus.

Schema per BASELINE.json input_hint:
    url: string (unique key), warc_ts: timestamp, html: binary,
    text: string, lang: string

Synthesis (FIXTURES.md §1.2): N base documents; a fraction `dup_rate` get
near-duplicate variants (token swaps / small edits / boilerplate wraps)
under distinct urls. Ground-truth (url_a, url_b) dup pairs and cluster ids
are recorded. Everything is seeded — re-running yields byte-identical data.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import datetime, timedelta

def _make_vocab(n_words: int = 40000, seed: int = 99) -> list[str]:
    """Deterministic pseudo-word vocabulary. A large vocabulary keeps the
    background shingle-Jaccard of unrelated pages near zero, like real web
    text (a tiny vocabulary makes every page look like a near-dup).

    40k content types + ~13% stopword token mass approximates a real web
    corpus's type/token profile: measured background 5-char-shingle Jaccard
    between unrelated pages is <0.1, so LSH collisions are dominated by
    true near-dups — at 2,500 types (the old value) unrelated pages shared
    ~0.3+ Jaccard and candidate generation degenerated quadratically, which
    no banding scheme survives at scale."""
    rng = random.Random(seed)
    consonants = "bcdfghjklmnpqrstvwz"
    vowels = "aeiou"
    words = set()
    while len(words) < n_words:
        n_syll = rng.randint(2, 4)
        word = "".join(
            rng.choice(consonants) + rng.choice(vowels) for _ in range(n_syll)
        )
        words.add(word)
    common = "the and of to in a is for on with".split()
    # ~13% stopword token mass (600 x 10 / 46,000), like real prose
    return sorted(words) + common * 600


_VOCAB = _make_vocab()

_BOILERPLATE = [
    "cookie notice accept all cookies privacy policy terms of service",
    "subscribe to our newsletter for updates follow us on social media",
    "copyright all rights reserved contact us about careers",
]


@dataclass
class WebPage:
    url: str
    warc_ts: datetime
    html: bytes
    text: str
    lang: str


@dataclass
class SyntheticCorpus:
    pages: list[WebPage]
    #: ground-truth duplicate pairs (url_a < url_b)
    dup_pairs: set[tuple[str, str]]
    #: url -> cluster id (cluster = base doc index)
    clusters: dict[str, int]


def _base_text(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_VOCAB) for _ in range(n_words))


def _near_dup(rng: random.Random, text: str) -> str:
    """Token swaps / small edits / boilerplate wraps."""
    words = text.split()
    kind = rng.random()
    if kind < 0.4 and len(words) > 4:
        # swap a few adjacent tokens
        for _ in range(max(1, len(words) // 40)):
            i = rng.randrange(len(words) - 1)
            words[i], words[i + 1] = words[i + 1], words[i]
        return " ".join(words)
    if kind < 0.7 and len(words) > 4:
        # drop / duplicate a few tokens
        for _ in range(max(1, len(words) // 50)):
            i = rng.randrange(len(words))
            if rng.random() < 0.5:
                del words[i]
            else:
                words.insert(i, words[i])
        return " ".join(words)
    # boilerplate wrap
    return rng.choice(_BOILERPLATE) + " " + text + " " + rng.choice(_BOILERPLATE)


def generate_corpus(
    n_base: int = 200,
    dup_rate: float = 0.3,
    max_variants: int = 3,
    seed: int = 1234,
    min_words: int = 30,
    max_words: int = 220,
) -> SyntheticCorpus:
    rng = random.Random(seed)
    t0 = datetime(2025, 1, 1)
    pages: list[WebPage] = []
    dup_pairs: set[tuple[str, str]] = set()
    clusters: dict[str, int] = {}
    langs = ["en", "en", "en", "de", "es", "fr"]

    for base_idx in range(n_base):
        text = _base_text(rng, rng.randint(min_words, max_words))
        lang = rng.choice(langs)
        urls = [f"https://site{base_idx % 37}.example/page/{base_idx}"]
        texts = [text]
        if rng.random() < dup_rate:
            for v in range(rng.randint(1, max_variants)):
                urls.append(
                    f"https://mirror{v}.site{base_idx % 37}.example/page/{base_idx}"
                )
                texts.append(_near_dup(rng, text))
        for url, t in zip(urls, texts):
            ts = t0 + timedelta(seconds=rng.randint(0, 10_000_000))
            html = f"<html><body><p>{t}</p></body></html>".encode()
            pages.append(WebPage(url=url, warc_ts=ts, html=html, text=t, lang=lang))
            clusters[url] = base_idx
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                a, b = sorted((urls[i], urls[j]))
                dup_pairs.add((a, b))

    rng.shuffle(pages)
    return SyntheticCorpus(pages=pages, dup_pairs=dup_pairs, clusters=clusters)


def _pages_for_base(base_idx: int, seed: int, dup_rate: float, max_variants: int,
                    min_words: int, max_words: int) -> list[tuple]:
    """All pages (base + near-dup variants) for one base doc, deterministic
    in (seed, base_idx) alone — generation order independent."""
    rng = random.Random(seed * 1_000_003 + base_idx)
    t0 = datetime(2025, 1, 1)
    langs = ["en", "en", "en", "de", "es", "fr"]
    text = _base_text(rng, rng.randint(min_words, max_words))
    lang = rng.choice(langs)
    urls = [f"https://site{base_idx % 37}.example/page/{base_idx}"]
    texts = [text]
    if rng.random() < dup_rate:
        for v in range(rng.randint(1, max_variants)):
            urls.append(f"https://mirror{v}.site{base_idx % 37}.example/page/{base_idx}")
            texts.append(_near_dup(rng, text))
    out = []
    for url, t in zip(urls, texts):
        ts = t0 + timedelta(seconds=rng.randint(0, 10_000_000))
        html = f"<html><body><p>{t}</p></body></html>".encode()
        out.append((url, ts, html, t, lang, base_idx))
    return out


def generate_pages_distributed(
    spark,
    n_base: int,
    dup_rate: float = 0.3,
    max_variants: int = 3,
    seed: int = 1234,
    min_words: int = 100,
    max_words: int = 500,
    partitions: int | None = None,
):
    """Executor-side corpus generation for large scaling runs: the base-doc
    index range is parallelized and each base doc is generated from its own
    (seed, base_idx) rng, so output is deterministic regardless of
    partitioning or cluster size. Includes ground-truth `cluster_truth`."""
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("html", BinaryType(), False),
            StructField("text", StringType(), False),
            StructField("lang", StringType(), False),
            StructField("cluster_truth", IntegerType(), False),
        ]
    )
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(indices):
        for base_idx in indices:
            yield from _pages_for_base(
                base_idx, seed, dup_rate, max_variants, min_words, max_words
            )

    rdd = spark.sparkContext.parallelize(range(n_base), parts).mapPartitions(
        lambda it: gen(it)
    )
    return spark.createDataFrame(rdd, schema)


def corpus_to_df(spark, corpus: SyntheticCorpus):
    """Materialize as a Spark DataFrame with the input_hint schema."""
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType(), False),
            StructField("warc_ts", TimestampType(), False),
            StructField("html", BinaryType(), False),
            StructField("text", StringType(), False),
            StructField("lang", StringType(), False),
        ]
    )
    rows = [(p.url, p.warc_ts, p.html, p.text, p.lang) for p in corpus.pages]
    return spark.createDataFrame(rows, schema)
