"""Text-analysis column functions for training-data pipelines.

Everything here is a pure JVM-side column expression (whole-stage
codegen, no Python in the hot path) and has an exact ANSI-SQL
equivalent, so every function is oracle-checkable in DuckDB at test
scale and shuffle-free at 100 TB (they're all map-side projections).

Functions:
* token counting — whitespace tokens + a BPE-ish subword regex count
* quality scoring — length / punctuation / stopword / word-length stats
* language-ID — deterministic stopword-profile argmax (n-gram heuristic)
* document fingerprint — min-hash over rolling character shingles
  (winnowing-style content fingerprint, md5-based for SQL parity)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# BPE-ish tokenization: words, numbers, or single non-space symbols —
# the GPT-2 pre-tokenizer shape without the library dependency.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language function-word profiles (deterministic heuristic;
# the scoring rule is the spec — identical SQL runs in the oracle)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une"],
    "es": ["el", "la", "de", "que", "los", "es", "un", "una"],
}


def whitespace_token_count(text: Column | str) -> Column:
    """Number of whitespace-separated tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(F.trim(c), r"\s+"))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Subword-ish token count: alpha runs + digit runs + symbols."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are non-alphanumeric, non-space."""
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are English stopwords."""
    sw = stopwords or LANG_PROFILES["en"]
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.trim(F.lower(c)), r"\s+")
    hits = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_word_length(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.trim(c), r"\s+")
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: rewards moderate length, low
    punctuation density, and 3–8-char mean word length. The formula IS
    the spec (oracle reproduces it verbatim):

        0.4·min(1, n_tokens/64) + 0.3·(1 − min(1, 4·punct_ratio))
        + 0.3·(1 if 3 ≤ mean_word_len ≤ 8 else 0.5)
    """
    c = F.col(text) if isinstance(text, str) else text
    nt = whitespace_token_count(c).cast("double")
    pr = punct_ratio(c)
    mwl = mean_word_length(c)
    len_term = F.least(F.lit(1.0), nt / F.lit(64.0))
    punct_term = F.lit(1.0) - F.least(F.lit(1.0), F.lit(4.0) * pr)
    wl_term = F.when((mwl >= 3.0) & (mwl <= 8.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        F.lit(0.4) * len_term + F.lit(0.3) * punct_term + F.lit(0.3) * wl_term, 6
    )


def lang_id(text: Column | str) -> Column:
    """Deterministic language-ID: argmax of per-language stopword hit
    counts over lowercased whitespace tokens; ties and zero-hit rows
    resolve to 'und' (undetermined) / lexicographically smallest lang.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.trim(F.lower(c)), r"\s+")

    def _hits(sw: list[str]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*sw)))

    scores = [(lang, _hits(sw)) for lang, sw in sorted(LANG_PROFILES.items())]
    best = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # first (lexicographically smallest) language achieving the max wins
    for lang, s in reversed(scores):
        result = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(result)
    return result


def doc_fingerprint(text: Column | str, shingle_chars: int = 16) -> Column:
    """Winnowing-style content fingerprint: the minimum 60-bit integer
    derived from md5 over all rolling ``shingle_chars``-character
    substrings. Robust to local edits outside the minimizing window;
    md5-based so DuckDB reproduces it exactly. Short texts fall back to
    hashing the whole string.
    """
    c = F.col(text) if isinstance(text, str) else text
    w = int(shingle_chars)
    n_sh = F.greatest(F.length(c) - F.lit(w - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.conv(F.substring(F.md5(F.substring(c, i, w)), 1, 15), 16, 10).cast(
            "long"
        ),
    )
    return F.array_min(hashes)
