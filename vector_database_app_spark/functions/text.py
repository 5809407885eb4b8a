"""Text analysis as column expressions: tokenization, shingles, language ID,
quality metrics, token counting, fingerprinting.

The reference's only text processing is `str.strip()` at ingest
(`rag_search/vector_db.py:269,323,355`) and a JSON-fence cleaner
(`clean_json_string`, `:598-606`). Everything else here is the
LLM-training-data-pipeline extension surface, built as JVM-side expressions
(whole-stage codegen; no Python in the hot path) so a 100 TB corpus pays one
scan, not a Python round-trip per row.

Every function that backs an oracle-checked query uses only constructs with
exact DuckDB equivalents (split on literal space, md5, regexp with a shared
dialect subset) so results hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword markers for the heuristic language ID.
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", [" the ", " and ", " of "]),
    ("fr", [" le ", " la ", " et "]),
    ("es", [" el ", " los ", " y "]),
    ("de", [" der ", " und ", " die "]),
    ("zh", ["的", "是", "了"]),
]

#: BPE-ish pretokenizer: letter runs, digit runs, single punctuation.
#: Same regex dialect subset works in Java (Spark) and RE2 (DuckDB).
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def let(val: Column, body) -> Column:
    """Let-binding for column expressions: evaluate `val` ONCE per row
    and pass it to `body` as a lambda variable — the single-element
    ``transform(array(val), x -> body(x))[1]`` trick.

    Why it exists: Catalyst's CollapseProject inlines a withColumn
    alias into every downstream reference, so an expensive array
    expression referenced N times in the final projection executes N
    times per row. Binding it as an HOF lambda variable pins exactly
    one evaluation (measured on doc_winnow: 20.9 s -> 4.0 s at sf0.1,
    where the md5-shingle array was being re-derived inside each of its
    three consumers). Nested `let`s compose — inner lambdas close over
    outer variables lexically, same as Spark SQL's nested HOFs."""
    return F.element_at(F.transform(F.array(val), body), 1)


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def words(text: Column | str) -> Column:
    """Split on single literal spaces, lowercased. Keeps empty trailing
    tokens exactly like DuckDB `string_split` (oracle parity)."""
    return F.split(F.lower(_c(text)), " ")


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined). Docs shorter than n words fall
    back to a single whole-text shingle. Pure expressions — no explode, so
    shingling is row-local and shuffle-free.

    The word array is `let`-bound: HOF bodies evaluate interpreted, so
    an outer non-variable subtree like the split is re-executed on
    EVERY lambda invocation — with ~k grams × n element_at references
    that made shingling O(k·n) splits per row. Binding `w` as a lambda
    variable pins one split per row (doc_fingerprint 6.2 s -> measured
    after fix in PERF.md; every shingle consumer inherits it)."""
    t = _c(text)

    def _grams(w: Column) -> Column:
        k = F.size(w)
        grams = F.transform(
            F.sequence(F.lit(1), k - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(n)]
            ),
        )
        return F.when(k >= n, grams).otherwise(F.array(F.lower(t)))

    return let(words(t), _grams)


def lang_id(text: Column | str) -> Column:
    """Heuristic stopword-marker language ID (first matching language wins,
    'und' if none). A real n-gram model would be a broadcast lookup table +
    the same expression shape; the heuristic keeps it oracle-checkable."""
    t = F.concat(F.lit(" "), F.lower(_c(text)), F.lit(" "))
    expr: Column | None = None
    for lang, markers in LANG_MARKERS:
        cond = None
        for m in markers:
            c = t.contains(m)
            cond = c if cond is None else (cond | c)
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr.otherwise("und")


def n_words(text: Column | str) -> Column:
    """Whitespace token count (empty tokens excluded)."""
    return F.size(F.array_remove(F.split(_c(text), " +"), ""))


def n_bpe_tokens(text: Column | str) -> Column:
    """BPE-ish token count via regexp_extract_all."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(BPE_TOKEN_RE), 0))


def avg_word_len(text: Column | str, scale: int = 6) -> Column:
    """Mean token length; NULL for empty docs (nullif guards ANSI div-by-0)."""
    t = _c(text)
    total = F.length(F.regexp_replace(t, " +", ""))
    return F.round(total / F.nullif(n_words(t), F.lit(0)), scale)


def punct_ratio(text: Column | str, scale: int = 6) -> Column:
    """Non-alphanumeric-non-space chars / total chars — a quality signal."""
    t = _c(text)
    n_punct = F.length(F.regexp_replace(t, "[A-Za-z0-9 ]", ""))
    return F.round(n_punct / F.nullif(F.length(t), F.lit(0)), scale)


def stopword_ratio(text: Column | str, scale: int = 6) -> Column:
    """Fraction of words that are common-English stopwords."""
    stop = F.array(*[F.lit(s) for s in ("the", "a", "and", "of", "to", "in", "is")])
    w = F.array_remove(words(_c(text)), "")
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop, x)))
    return F.round(n_stop / F.nullif(F.size(w), F.lit(0)), scale)


def fingerprint(text: Column | str, n: int = 3) -> Column:
    """Document fingerprint: lexicographic min of md5(shingle) — a 1-perm
    minhash. Identical-modulo-word-order-windows docs collide; md5 keeps it
    reproducible in the DuckDB oracle. The k-perm generalization lives in
    ``operators.dedup.minhash_signatures``."""
    return F.array_min(F.transform(shingles(_c(text), n), F.md5))


def clean_json_string(c: Column | str) -> Column:
    """Reference `clean_json_string` (`rag_search/vector_db.py:598-606`):
    strip, extract the outermost {...} (DOTALL), drop ``` fences."""
    t = F.regexp_replace(F.trim(_c(c)), "```(json)?", "")
    return F.regexp_extract(t, r"(?s)\{.*\}", 0)
