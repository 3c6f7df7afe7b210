"""Edit-distance (fuzzy string) join — the record-linkage member of
the join family: match short strings (titles, names, product labels)
across two tables within a Levenshtein budget, EXACTLY, without the
|L|×|R| cross product.

Public literature: the q-gram count/length filters are Gravano et al.,
"Approximate String Joins in a Database (Almost) for Free", VLDB 2001;
the prefix filter is the Ed-Join family (Xiao, Wang, Lin, VLDB 2008).
This implementation composes the SET-semantics prefix filter with the
length filter and an exact `levenshtein` verify:

* every string's q-grams (on a ``^``/``$``-padded copy, so strings
  shorter than q still produce grams) are ordered by GLOBAL document
  frequency (rarity first — any total order is correct, rarity keeps
  posting lists short);
* one edit changes at most ``q`` distinct grams, so two strings within
  distance k share all but ≤ ``q·k`` grams — if their ``q·k + 1``
  RAREST grams are disjoint, the distance exceeds k (the prefix-filter
  lemma). Only prefix grams enter the inverted-index join: the
  candidate index is ``(q·k+1)·n`` rows, never the full gram table;
* candidates pass ``|len(a) − len(b)| ≤ k`` inside the join condition
  and are verified with Spark's built-in ``levenshtein`` (JVM-side).

Exactness (no missed pair, no false pair) is oracle-checked against a
DuckDB brute-force cross join at driver scale.

Scale shape: one gram-frequency aggregate, one gram-keyed join to
attach frequencies + per-string regroup (state = the string's own gram
list), one prefix-keyed candidate join, one id-keyed verify join. No
cartesian term; hot grams are demoted out of prefixes by the rarity
order itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["edit_distance_join"]


def _prefix_table(df, id_col, str_col, side, q, k, lowercase):
    s = F.col(str_col)
    if lowercase:
        s = F.lower(s)
    base = df.where(F.col(str_col).isNotNull()).select(
        F.col(id_col).alias(f"__{side}id__"),
        s.alias(f"__{side}s__"),
        F.length(s).alias(f"__{side}n__"),
    )
    padded = F.concat(
        F.lit("^" * (q - 1)), F.col(f"__{side}s__"), F.lit("$" * (q - 1))
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(padded) - q + 1),
            lambda i: F.substring(padded, i, q),
        )
    )
    return base.withColumn("__g__", grams)


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 2,
    q: int = 2,
    lowercase: bool = True,
) -> DataFrame:
    """All pairs ``(left_id, right_id, dist)`` with
    ``levenshtein(left_col, right_col) ≤ max_dist`` — exact (the
    filters only prune, never drop a true pair; tests + the DuckDB
    brute-force oracle pin it). ``lowercase=True`` matches
    case-insensitively (distance computed on the lowercased forms).
    NULL strings never match. ``max_dist = 0`` degenerates to an
    exact equi-join (still routed through the same plan).
    """
    k = int(max_dist)
    if k < 0:
        raise ValueError("max_dist must be >= 0")
    if q < 2:
        raise ValueError(
            "q must be >= 2 (the sentinel padding that keeps every "
            "string's gram set non-empty needs q-1 characters)"
        )
    prefix_len = q * k + 1

    L = _prefix_table(left, left_id, left_col, "l", q, k, lowercase)
    R = _prefix_table(right, right_id, right_col, "r", q, k, lowercase)

    lg = L.select(F.explode("__g__").alias("g"))
    rg = R.select(F.explode("__g__").alias("g"))
    dfreq = (
        lg.unionByName(rg)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("__df__"))
    )

    def prefixes(T, side):
        exploded = T.select(
            f"__{side}id__", F.explode("__g__").alias("g")
        )
        ranked = exploded.join(dfreq, "g").groupBy(
            f"__{side}id__"
        ).agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("__df__").alias("d"),
                            F.col("g").alias("g"),
                        )
                    )
                ),
                1,
                prefix_len,
            ).alias("__p__")
        )
        return ranked.select(
            f"__{side}id__",
            F.explode(F.transform("__p__", lambda s: s["g"])).alias("g"),
        )

    cand = (
        prefixes(L, "l")
        .join(prefixes(R, "r"), "g")
        .select("__lid__", "__rid__")
    )
    if k >= 1:
        # prefix-filter exactness boundary: the required overlap is
        # max(|Ga|,|Gb|) − q·k, vacuous only when BOTH DISTINCT gram
        # sets have ≤ q·k grams. Gate on the provable condition —
        # |distinct grams| ≤ q·k — not on string length: array_distinct
        # can shrink a long repetitive string ("aaaa…") below the bound
        # while its length passes a length gate. Those rows route
        # through a bounded length-band block instead: each fans out to
        # its 2k+1 admissible partner lengths (an equi-join on length,
        # no cartesian term); the block is small² by construction and
        # the levenshtein verify below keeps the result exact.
        small = q * k
        ls = L.where(F.size("__g__") <= small).select(
            "__lid__", "__ln__"
        )
        rs = R.where(F.size("__g__") <= small).select(
            "__rid__", "__rn__"
        )
        fan = ls.select(
            "__lid__",
            F.explode(
                F.sequence(
                    F.greatest(F.col("__ln__") - k, F.lit(0)),
                    F.col("__ln__") + k,
                )
            ).alias("__tn__"),
        )
        short_cand = fan.join(
            rs, fan["__tn__"] == rs["__rn__"]
        ).select("__lid__", "__rid__")
        cand = cand.unionByName(short_cand)
    cand = cand.distinct()
    verified = (
        cand.join(L.select("__lid__", "__ls__", "__ln__"), "__lid__")
        .join(R.select("__rid__", "__rs__", "__rn__"), "__rid__")
        .where(F.abs(F.col("__ln__") - F.col("__rn__")) <= k)
        .select(
            F.col("__lid__").alias(left_id),
            F.col("__rid__").alias(right_id),
            F.levenshtein("__ls__", "__rs__").alias("dist"),
        )
        .where(F.col("dist") <= k)
    )
    return verified
