"""Fuzzy record linkage — edit-distance joins without all-pairs.

Entity resolution over names/titles/identifiers is the canonical
"this cannot be an equi-join" problem: the match predicate is
``levenshtein(a, b) <= k``. Comparing everything to everything is
O(n²) and dead at corpus scale, so the operator blocks with DELETION
NEIGHBORHOODS (the FastSS / SymSpell family, Bocek et al. 2007):
every string expands to the set of variants reachable by deleting up
to ``k`` characters, and any two strings within edit distance ``k``
provably share at least one variant — take an optimal alignment and
delete from each side the characters it substitutes/inserts/deletes;
each unit edit removes at most one character from each side, so both
strings reduce to the same core with ≤ k deletions apiece. Candidate
generation is therefore an exact-recall equi-join on variant strings;
one ``levenshtein`` evaluation per CANDIDATE pair (never per pair of
records) keeps only true matches. The DuckDB oracle computes the
naive all-pairs DEFINITION, proving the blocking misses nothing —
the setsim_join/PPJoin oracle recipe.

Cost model: a string of length n has n one-deletion variants and
~n²/2 two-deletion variants — built for SHORT keys (names, codes,
titles: n ≲ 40, k ≤ 2), where the blow-up is a few hundred rows per
record, flat-mapped (no shuffle) before one equi-join. For long-text
similarity use the MinHash/SimHash family instead; for token-set
similarity use ``setsim_join``.

Scale shape: explode → equi-join on the variant key → distinct pair
ids → verify. No collects, no broadcasts forced (AQE decides; a
dictionary-skewed variant key — e.g. thousands of "JOHN SMITH"
records sharing variants — is ordinary join skew, handled by AQE
skew-join or upstream exact-dedup of identical keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column, k: int) -> Column:
    """All strings reachable from ``col`` by deleting up to ``k``
    characters (including the string itself), as a distinct array.
    ``sequence(1, length)`` is guarded for the empty string — Spark's
    ``sequence(1, 0)`` counts DOWN to ``[1, 0]``."""
    if k < 1 or k > 2:
        raise ValueError(f"k must be 1 or 2; got {k}")

    def one_del(s: Column) -> Column:
        return F.when(
            F.length(s) > 0,
            F.transform(
                F.sequence(F.lit(1), F.length(s)),
                lambda i: F.concat(
                    s.substr(F.lit(1), i - 1),
                    s.substr(i + 1, F.length(s) - i),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    v1 = F.array_union(F.array(col), one_del(col))
    if k == 1:
        return v1
    v2 = F.flatten(F.transform(v1, one_del))
    return F.array_distinct(F.concat(v1, v2))


def _guard_len(text: Column, max_len: int, max_dist: int) -> Column:
    """Pass ``text`` through unchanged iff it fits ``max_len``; raise a
    per-row execution-time error otherwise. Distributed (no driver
    scan), zero cost on conforming rows, and the error names the
    escape hatches rather than letting a single long outlier OOM an
    executor with its O(len^max_dist) variant fan-out."""
    # NULL passes through (the callers filter NULL texts anyway, but
    # the guard must not fire on them if Catalyst evaluates the
    # projection expression in a different order than written).
    return F.when(
        text.isNull() | (F.length(text) <= F.lit(max_len)), text
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"fuzzy_join: text longer than max_len={max_len} "
                    "(len="
                ),
                F.length(text).cast("string"),
                F.lit(
                    f"); deletion blocking fans out O(len^{max_dist}) "
                    "variants per row — use minhash_lsh_pairs/"
                    "simhash_pairs for long text, or raise max_len "
                    "deliberately for known-bounded keys"
                ),
            )
        )
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    *,
    max_dist: int = 1,
    lowercase: bool = True,
    max_len: int = 64,
) -> DataFrame:
    """Edit-distance join → ``(left_id, right_id, dist)`` for every
    cross-table pair with ``levenshtein <= max_dist`` (exact recall —
    module docstring has the completeness argument). Ids must be
    non-null and unique per side; NULL/empty texts never match
    (an empty string is still linked to strings within ``max_dist``
    of it via their own deletion chains down to length 0 only when
    their length ≤ ``max_dist`` — the definition, preserved).

    ``lowercase`` pre-normalizes case on BOTH the blocking key and
    the verify predicate (case differences are substitutions
    otherwise). For a self-join, pass the same frame twice and filter
    the reflexive/symmetric half afterwards (``left_id < right_id``).

    ``max_len`` is the variant-blowup guard: deletion neighborhoods
    are O(len^max_dist) variants PER ROW (a 10k-char document at
    ``max_dist=2`` is ~50M variants), so this operator is for SHORT
    keys by construction. Any text longer than ``max_len`` raises at
    execution time (a distributed per-row check, not a driver scan) —
    use the MinHash/SimHash banded family for long text, or raise
    ``max_len`` deliberately for known-bounded keys. ``max_dist`` > 2
    is rejected outright by :func:`deletion_variants`.
    """
    lnorm = _guard_len(
        F.lower(F.col(left_text)) if lowercase else F.col(left_text),
        max_len, max_dist,
    )
    rnorm = _guard_len(
        F.lower(F.col(right_text)) if lowercase else F.col(right_text),
        max_len, max_dist,
    )
    lv = (
        left.where(F.col(left_text).isNotNull())
        .select(
            F.col(left_id).alias("left_id"), lnorm.alias("__lt")
        )
        .select(
            "left_id", "__lt",
            F.explode(deletion_variants(F.col("__lt"), max_dist)).alias(
                "__v"
            ),
        )
    )
    rv = (
        right.where(F.col(right_text).isNotNull())
        .select(
            F.col(right_id).alias("right_id"), rnorm.alias("__rt")
        )
        .select(
            "right_id", "__rt",
            F.explode(deletion_variants(F.col("__rt"), max_dist)).alias(
                "__v"
            ),
        )
    )
    cand = lv.join(rv, "__v").select(
        "left_id", "right_id", "__lt", "__rt"
    ).distinct()
    dist = F.levenshtein(F.col("__lt"), F.col("__rt"))
    return (
        cand.select(
            "left_id", "right_id", dist.cast("int").alias("dist")
        )
        .where(F.col("dist") <= F.lit(max_dist))
    )
