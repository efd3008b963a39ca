"""Text-analysis functions for training-data pipelines — all JVM-side
column expressions (whole-stage codegen, no Python in the hot path):
token counting, quality scoring, language-ID heuristic, document
fingerprinting. Formulas are pure arithmetic/array ops so an exact SQL
oracle (DuckDB) can reproduce them bit-for-bit where required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small public stopword lists (top function words per language)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "que"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "en"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "zu", "den", "von"],
}


def raw_pieces(col) -> Column:
    """``split(trim(text), '\\s+')`` — the pre-filter pieces behind
    ``tokens()``/``token_count()``. After ``trim`` (which strips spaces
    only) an empty piece can appear ONLY at the ends, from leading or
    trailing non-space whitespace (``'hello\\n'`` -> ``['hello','']``);
    interior pieces are never empty because the split pattern is a
    maximal ``\\s+`` run. Exposed so exploding consumers (simhash) can
    apply the not-empty filter AFTER a codegen ``explode`` instead of
    through the interpreted ArrayFilter lambda — same tokens, one
    tokenizer."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def tokens(col) -> Column:
    """Whitespace tokens of a text column (empty array for blank text)."""
    return F.filter(raw_pieces(col), lambda t: t != "")


_WS_CHARS = [" ", "\t", "\n", "\x0b", "\f", "\r"]  # Java regex \s


def token_count(col) -> Column:
    """``size(tokens(col))`` computed without the higher-order
    ArrayFilter: HOF lambdas are CodegenFallback expressions, so one of
    them anywhere in a projection/filter knocks the WHOLE stage out of
    whole-stage codegen (measured 2.5x on the clean_corpus filter,
    OPTIMIZATION_r06.md). Empty pieces of ``raw_pieces`` occur only at
    the two ends (see its docstring), so the filtered size is the raw
    size minus an end correction — value-identical for every string
    (gated by test_token_count_oracle_matches_on_whitespace_edges and a
    5M-doc equivalence sweep).

    (An r6 attempt to count via ``regexp_count(t, '\\s+') + 1`` measured
    SLOWER: Spark's regexp_count is RuntimeReplaceable sugar for
    ``size(regexp_extract_all(...))``, which materializes every matched
    run — the filter stage re-evaluating it went 17.4s -> 26.5s on the
    5M-doc bench, so split+size stays.)"""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    first_ws = F.substring(t, 1, 1).isin(_WS_CHARS).cast("int")
    last_ws = F.substring(t, -1, 1).isin(_WS_CHARS).cast("int")
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+")) - first_ws - last_ws
    )


def bpe_ish_token_count(col) -> Column:
    """A BPE-ish proxy: word-pieces split on whitespace plus intra-word
    boundaries between letters and digits/punctuation (regex), the usual
    cheap stand-in for tokenizer counts at corpus scale."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.split(F.trim(c), r"(\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|(?=[^\w\s]))")
    return F.size(F.filter(pieces, lambda t: t != ""))


# every char Java regex [\w\s] can match without UNICODE_CHARACTER_CLASS:
# \w = [a-zA-Z_0-9], \s = [ \t\n\x0b\f\r] — 69 ASCII chars total
_WORD_WS = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
    " \t\n\x0b\f\r"
)


def punct_ratio(col) -> Column:
    # [^\w\s] char count computed regex-free: translate() deletes the 69
    # ASCII \w\s chars, so the remaining length IS the class-match count
    # (each regex match is exactly one code point, and length() counts
    # code points). Identical value to the old
    # length(c) - length(regexp_replace(c, '[^\w\s]', '')) without
    # running a regex matcher or building the replaced string per doc —
    # this expression is evaluated in both the pushed-down clean_corpus
    # filter and its projection (r6, guide §1.2 per-task work).
    c = F.col(col) if isinstance(col, str) else col
    total = F.greatest(F.length(c), F.lit(1))
    punct = F.length(F.translate(c, _WORD_WS, ""))
    return punct / total


def stopword_ratio(col, lang: str = "en") -> Column:
    t = tokens(col)
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(t, stop)) / F.greatest(F.size(t), F.lit(1))


def quality_milliscore(col) -> Column:
    """Deterministic [0,1000] integer quality score:
    0.5 * min(1, len/500) + 0.3 * (1 - punct_ratio) + 0.2 * min(1, tokens/80),
    scaled by 1000 and floored — integer so exact oracles hash stably."""
    c = F.col(col) if isinstance(col, str) else col
    length_term = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - punct_ratio(c)
    tok_term = F.least(token_count(c) / F.lit(80.0), F.lit(1.0))
    score = F.lit(0.5) * length_term + F.lit(0.3) * punct_term + F.lit(0.2) * tok_term
    return F.floor(score * 1000).cast("long")


TOKEN_COUNT_SQL = (
    "LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM({c}), '\\s+'), x -> x <> ''))"
)
"""DuckDB rendering of token_count. The LIST_FILTER mirrors tokens()'s
empty-piece filter: without it a trailing newline ('hello\\n' -> pieces
['hello','']) or a blank text counts one phantom token, diverging from
the Spark side exactly at the clean_corpus min_tokens boundary
(code-review r5)."""

QUALITY_MILLISCORE_SQL = (
    "CAST(FLOOR(("
    "0.5 * LEAST(LENGTH({c}) / 500.0, 1.0)"
    " + 0.3 * (1.0 - (LENGTH({c}) - LENGTH(REGEXP_REPLACE({c}, '[^\\w\\s]', '', 'g')))"
    " / GREATEST(LENGTH({c}), 1))"
    " + 0.2 * LEAST(" + TOKEN_COUNT_SQL + " / 80.0, 1.0)"
    ") * 1000) AS BIGINT)"
)
"""DuckDB rendering of quality_milliscore for exact oracle comparison."""


def langid(col) -> Column:
    """Stopword-vote language ID over {en, fr, es, de}; 'und' when no
    stopword hits. Deterministic ties broken by fixed language order."""
    t = tokens(col)
    scores = []
    for lang, words in STOPWORDS.items():
        stop = F.array(*[F.lit(w) for w in words])
        scores.append((lang, F.size(F.array_intersect(t, stop))))
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for lang, s in reversed(scores):
        expr = F.when(s == best, F.lit(lang)).otherwise(expr) if lang != "und" else expr
    return F.when(best <= 0, F.lit("und")).otherwise(expr)


def fingerprint(col) -> Column:
    """64-bit document fingerprint: xxhash64 of the case/whitespace
    normalized text — equal normalized content => equal fingerprint."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.xxhash64(normalized)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("quality_milli", quality_milliscore(text_col))
        .withColumn("lang_pred", langid(text_col))
        .withColumn("fingerprint", fingerprint(text_col))
    )


def clean_corpus(
    df: DataFrame,
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
    min_quality_milli: int = 300,
    languages: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = None,
    dedup: str = "rows",
) -> DataFrame:
    """The canonical training-data hygiene pass as ONE composable
    pipeline: token-count bounds + quality threshold (+ optional
    language allow-list) + exact dedup keeping the min-id representative.

    Plan shape at 100 TB: every filter is whole-stage-codegen JVM
    arithmetic applied AT THE SCAN (before any exchange), so the dedup
    shuffle only ever sees surviving rows; the output adds ``n_tokens``
    / ``quality_milli`` so downstream sampling can reuse them without
    recomputing.

    ``dedup`` picks the dedup exchange (VERDICT r3 item 5):

    * ``'rows'``: one window over (hash(text), text) — the full
      surviving rows shuffle once. Fewest jobs; right when rows are
      narrow or most rows survive.
    * ``'map'``: ``exact_dedup_map`` + a keep-id LEFT SEMI join — the
      dedup exchange carries only (id, 16-byte md5) projections
      (~24 bytes/row however wide the documents), then the keep-set
      joins back against the filtered scan on id. For wide documents
      this replaces a full-row exchange with two narrow ones; results
      are value-identical up to 128-bit hash collisions (rows mode
      ties on in-group text equality — collision-proof; map mode
      trusts the 16-byte md5 alone, quantified in exact_dedup_map —
      ~1e-17 expected collisions at 10^11 docs; ADVICE r4), and
      oracle-gated under both modes. Measured
      guidance (bench, 5M docs): on NARROW ~60-byte texts rows mode is
      ~1.8x faster (md5 + the second source read cost more than
      shuffling short rows) — map mode is the wide-document path, not a
      universal win."""
    from ..operators.dedup import exact_dedup_map

    if dedup not in ("rows", "map"):
        raise ValueError(f"dedup must be 'rows' or 'map', got {dedup!r}")
    stats = df.withColumn("n_tokens", token_count(text_col)).withColumn(
        "quality_milli", quality_milliscore(text_col)
    )
    kept = stats.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality_milli") >= min_quality_milli)
    )
    if languages is not None:
        lc = F.col(lang_col) if lang_col else langid(text_col)
        kept = kept.filter(lc.isin(list(languages)))
    if dedup == "map":
        keep_ids = exact_dedup_map(kept, id_col=id_col, text_col=text_col).select(
            F.col("rep_id").alias(id_col)
        )
        return kept.join(keep_ids, id_col, "leftsemi")
    # rows mode: keep the min-id row per distinct text. One
    # groupBy(text) + min_by(full row, id) — a hash aggregate with
    # map-side partials (dup rows collapse BEFORE the exchange) instead
    # of exact_dedup's Window, which shuffled AND sorted every surviving
    # row only to discard the non-representatives right after
    # (guide §2.3 "aggregate before you shuffle"; r6: window 12s ->
    # agg 5s on 5M docs). Row-identical to the Window path: ids are
    # unique, so min_by picks exactly the rep row (null texts cannot
    # reach here — the n_tokens/quality predicates reject them).
    others = [c for c in kept.columns if c != text_col]
    rep = kept.groupBy(text_col).agg(
        F.min_by(F.struct(*[F.col(c) for c in others]), F.col(id_col)).alias("__rep")
    )
    return rep.select(
        *[
            F.col(text_col) if c == text_col else F.col(f"__rep.{c}").alias(c)
            for c in kept.columns
        ]
    )
