"""Text analysis for large-scale training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting (shingle rolling
hash). All pure built-in Column expressions — JVM-side, whole-stage-codegen —
and every formula is pinned so a DuckDB oracle reproduces it exactly
(md5 is the cross-engine hash; xxhash64 exists only in Spark).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed stopword lists (pinned; the DuckDB oracles embed the same lists).
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une", "du", "que"),
}
LANG_PRIORITY = ("en", "de", "es", "fr")  # deterministic tie-break order

BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[.,!?;:]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens of lowercased text (empty strings dropped)."""
    return F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != F.lit("")
    )


def token_count(text: Column) -> Column:
    return F.size(ws_tokens(text))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish subword count: letter runs + digit runs + single symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def _stop_hits(tokens: Column, lang: str) -> Column:
    vocab = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(vocab, t)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = ws_tokens(text)
    n = F.size(toks)
    return F.when(n > 0, _stop_hits(toks, lang) / n).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    removed = n - F.length(F.regexp_replace(text, PUNCT_RE, ""))
    return F.when(n > 0, removed.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Pinned quality formula, rounded to 4 dp for cross-engine comparison:
    0.4·min(1, tokens/100) + 0.3·(1 − punct_ratio) + 0.3·en_stopword_ratio."""
    toks = token_count(text).cast("double")
    return F.round(
        0.4 * F.least(F.lit(1.0), toks / 100.0)
        + 0.3 * (1.0 - punct_ratio(text))
        + 0.3 * stopword_ratio(text, "en"),
        4,
    )


def lang_id(text: Column) -> Column:
    """Argmax of per-language stopword hits; ties break by LANG_PRIORITY;
    zero hits everywhere -> 'und' (undetermined)."""
    toks = ws_tokens(text)
    hits = {lang: _stop_hits(toks, lang) for lang in LANG_PRIORITY}
    best = F.greatest(*[hits[lang] for lang in LANG_PRIORITY])
    out = F.when(best <= 0, F.lit("und"))
    for lang in LANG_PRIORITY:
        out = out.when(hits[lang] == best, F.lit(lang))
    return out.otherwise(F.lit("und"))


def doc_fingerprint(text: Column, shingle: int = 8) -> Column:
    """Rolling-hash document fingerprint: min md5 over all ``shingle``-token
    windows (1 window of everything if the doc is shorter). Equal fingerprints
    ⇒ near-identical prefix-window content; used as a cheap near-dup key."""
    toks = ws_tokens(text)
    n_windows = F.greatest(F.lit(1), F.size(toks) - (shingle - 1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, shingle))),
    )
    return F.array_min(hashes)


def text_sha(text: Column) -> Column:
    """Exact-dedup key: md5 of the raw text (cross-engine deterministic)."""
    return F.md5(text)


def doc_lines(text: Column) -> Column:
    """Non-empty lines of the raw text (whitespace-trimmed per line)."""
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )


def dup_line_frac(text: Column) -> Column:
    """Gopher-style repetition signal: fraction of non-empty lines that are
    duplicates of an earlier line (0 when the doc has no lines). Pure
    array algebra — no explode, no shuffle; rounded 4 dp for the oracle."""
    ls = doc_lines(text)
    n = F.size(ls)
    return F.when(
        n > 0,
        F.round((n - F.size(F.array_distinct(ls))).cast("double") / n, 4),
    ).otherwise(F.lit(0.0))


def bigrams(text: Column) -> Column:
    """Adjacent whitespace-token bigrams ('tok1 tok2'); empty for docs with
    fewer than 2 tokens."""
    toks = ws_tokens(text)
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
