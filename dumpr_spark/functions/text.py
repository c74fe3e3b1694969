"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language-ID heuristic, fingerprinting.

All built from JVM-side `pyspark.sql.functions` (no Python UDFs in the hot
path) so they stay inside whole-stage codegen and scale linearly — at 100 TB
these run as a single narrow projection over the documents scan, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic and oracle-expressible; a production lang-id model
# would slot in behind the same column contract.
LANG_MARKERS = {
    "en": ("the", "of", "and", "a", "to"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "una", "y"),
}

# BPE-ish tokenizer regex: word pieces, digit runs, single punctuation marks.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens(col) -> Column:
    """Whitespace tokens."""
    return F.split(col, " ")


def token_count(col) -> Column:
    return F.size(tokens(col)).cast("long")


def regex_token_count(col) -> Column:
    """BPE-ish token count via regexp_extract_all (still JVM-side)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), F.lit(0))).cast("long")


def distinct_token_ratio(col) -> Column:
    """Lexical diversity: |distinct tokens| / |tokens| — a cheap quality signal."""
    toks = tokens(col)
    return F.size(F.array_distinct(toks)) / F.size(toks)


def stopword_count(col, lang: str = "en") -> Column:
    toks = tokens(col)
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.array_intersect(toks, markers)).cast("long")


def mean_token_length(col) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("double")), F.lit(0.0), lambda a, x: a + x
    )
    return total / F.size(toks)


def lang_scores(col) -> dict[str, Column]:
    """Per-language stopword *distinct hit* counts (the lang-ID signal)."""
    toks = F.array_distinct(tokens(col))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).cast("long")
        for lang, words in LANG_MARKERS.items()
    }


def predict_lang(col) -> Column:
    """Argmax of lang_scores with deterministic tie-break (alphabetical lang
    order wins ties); 'und' when no marker hits at all."""
    scores = lang_scores(col)
    best = None
    for lang in sorted(scores):  # alphabetical => deterministic tie-break
        s = scores[lang]
        if best is None:
            best = F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        else:
            best = F.when(s > best.getField("score"), F.struct(s.alias("score"), F.lit(lang).alias("lang"))).otherwise(best)
    return F.when(best.getField("score") > 0, best.getField("lang")).otherwise(F.lit("und"))


def normalize_text(col) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum, collapse
    whitespace, trim."""
    lowered = F.lower(col)
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
    collapsed = F.regexp_replace(stripped, " +", " ")
    return F.trim(collapsed)


def fingerprint(col) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text.
    (md5 chosen over xxhash because it is identically available in DuckDB —
    the oracle can recompute it.)"""
    return F.md5(normalize_text(col))


# Rolling-hash (Rabin-Karp) fingerprint constants. ROLL_P = 2^56 - 5 (prime)
# keeps every intermediate in int64 in BOTH engines: acc < 2^56, token hash
# < 2^56, so acc*31 + h < 2^61 + 2^56 << 2^63 (DuckDB raises on overflow,
# Java would wrap silently — either way a larger modulus would diverge).
ROLL_P = 72057594037927931
ROLL_B = 31


def rolling_fingerprint(col, base: int = ROLL_B) -> Column:
    """Order-sensitive polynomial rolling hash over whitespace tokens:
    fold (acc * base + h(tok)) mod ROLL_P with h = 56-bit md5 prefix.

    Unlike `fingerprint` (order-insensitive after normalization), this is the
    streaming-friendly Rabin-Karp form — extendable to windowed/winnowed
    chunk fingerprints where chunk hashes update incrementally. Fold starts
    at the first token's hash (mirrors DuckDB list_reduce's no-init form so
    the oracle matches bit-for-bit)."""
    from dumpr_spark.functions.dedup import minhash_base_hash

    hs = F.transform(tokens(col), minhash_base_hash)
    first = F.element_at(hs, 1)
    rest = F.slice(hs, F.lit(2), F.greatest(F.size(hs) - 1, F.lit(0)))
    return F.aggregate(
        rest, first, lambda acc, h: (acc * F.lit(base) + h) % F.lit(ROLL_P)
    )


def gram_hashes(col, k: int = 3) -> Column:
    """ARRAY<LONG> of 56-bit md5 hashes of the k-token grams, in order."""
    from dumpr_spark.functions.dedup import minhash_base_hash, shingles

    return F.transform(shingles(col, k), minhash_base_hash)


def winnow_from_hashes(hs: Column | str, w: int = 4) -> Column:
    """Window-min selection over a MATERIALIZED gram-hash array column.

    Must be applied to a column reference from a previous select, NOT to the
    `gram_hashes(...)` expression inline: nesting it inside this window
    transform makes codegen re-evaluate every gram md5 once PER WINDOW —
    measured 8x slower on the test corpus. `winnow_fingerprints_df` wires the
    two steps correctly."""
    c = F.col(hs) if isinstance(hs, str) else hs
    n = F.size(c)
    starts = F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1)))
    mins = F.transform(starts, lambda i: F.array_min(F.slice(c, i, w)))
    return F.array_sort(F.array_distinct(mins))


def winnow_fingerprints_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 3, w: int = 4, out_col: str = "fps",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    hash every k-token gram, slide a window of w consecutive gram hashes, and
    select each window's minimum — any shared token run of length >= w+k-1
    between two documents is guaranteed to share a selected hash, so the
    distinct selected set is a substring-robust fingerprint (MOSS's algorithm).

    Output: (id, out_col sorted distinct ARRAY<LONG>). Pure JVM array ops (one
    md5 per gram, no Python, no explode until the caller chooses to) — at
    100 TB this is a narrow projection; the downstream near-dup join explodes
    to thin (fp, doc_id) rows and equi-joins on fp, same shape as LSH bands.

    Selection is by VALUE min (not the paper's rightmost-tie rule): the
    selected *set* is identical under any tie rule once deduped, and value-min
    is what both Spark `array_min` and the DuckDB oracle compute natively.
    Docs shorter than one window contribute min-of-all (the paper's
    degenerate case).
    """
    hs_df = df.select(F.col(id_col), gram_hashes(F.col(text_col), k).alias("_hs"))
    return hs_df.select(F.col(id_col), winnow_from_hashes("_hs", w).alias(out_col))


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the standard quality-signal columns to a documents DataFrame."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(c),
            "n_tokens_re": regex_token_count(c),
            "mean_tok_len": mean_token_length(c),
            "distinct_ratio": distinct_token_ratio(c),
            "stopwords_en": stopword_count(c, "en"),
            "fingerprint": fingerprint(c),
        }
    )
