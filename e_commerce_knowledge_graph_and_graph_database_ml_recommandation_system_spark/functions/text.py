"""Cross-engine-deterministic text primitives (all JVM-side, zero UDFs).

The trick that makes MinHash/SimHash oracle-checkable: both Spark and DuckDB
expose md5() over strings, so ``int(md5(s)[:8], 16)`` is an engine-agnostic
32-bit string hash — Spark ``conv(substring(md5(s),1,8),16,10)``, DuckDB
``('0x' || substr(md5(s),1,8))::BIGINT``. Everything downstream (minhash
permutations, simhash bits) is integer arithmetic on that value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# SQL fragments for the DuckDB oracle (same semantics as the Column fns)
SQL_NORMALIZE = "trim(regexp_replace(lower({c}), '[^a-z0-9 ]', ' ', 'g'))"
SQL_WORDS = f"string_split_regex({SQL_NORMALIZE}, ' +')"
SQL_MD5_INT32 = "('0x' || substr(md5({c}), 1, 8))::BIGINT"


def normalize_text(c: Column) -> Column:
    """lowercase, strip non-alphanumerics (P7-style normalization)."""
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " "))


def words(c: Column) -> Column:
    """normalized word array."""
    return F.split(normalize_text(c), " +")


def word_ngrams(c: Column, n: int) -> Column:
    """word n-gram (shingle) array; empty array when fewer than n words.

    The split is BOUND ONCE per row via a single-element ``transform``
    lambda: inlining ``words(c)`` directly into the per-gram lambda makes
    Catalyst re-evaluate the regex split for EVERY gram (no common-
    subexpression elimination inside higher-order functions) — measured
    16x slower on gram-explode passes. Callers that already hold the
    split array should use ``word_ngrams_from`` directly."""
    return F.element_at(
        F.transform(F.array(words(c)), lambda w: word_ngrams_from(w, n)), 1
    )


def word_ngrams_from(w: Column, n: int) -> Column:
    """n-gram array over an already-split word array (avoids re-tokenizing
    when the caller also needs the words themselves)."""
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def sql_word_ngrams(c: str, n: int) -> str:
    """DuckDB equivalent of word_ngrams (1-based inclusive list slicing)."""
    return (
        f"CASE WHEN len({SQL_WORDS.format(c=c)}) >= {n} THEN "
        f"list_transform(range(1, len({SQL_WORDS.format(c=c)}) - {n - 2}), "
        f"i -> array_to_string(({SQL_WORDS.format(c=c)})[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


def md5_int32(c: Column) -> Column:
    """Engine-agnostic 32-bit unsigned hash of a string as BIGINT."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")
