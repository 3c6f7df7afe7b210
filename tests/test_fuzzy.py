"""Edit-distance join (functions/fuzzy.py) vs a transparent
brute-force Levenshtein reference — the filters must be EXACT (no
missed pair, no false pair)."""

import random

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.functions.fuzzy import edit_distance_join


def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def _brute(lrows, rrows, k, lowercase=True):
    out = set()
    for li, ls in lrows:
        for ri, rs in rrows:
            if ls is None or rs is None:
                continue
            a = ls.lower() if lowercase else ls
            b = rs.lower() if lowercase else rs
            d = _lev(a, b)
            if d <= k:
                out.add((li, ri, d))
    return out


def _typo(rng, s):
    if not s:
        return s + rng.choice("xyz")
    i = rng.randrange(len(s))
    op = rng.choice(["del", "sub", "ins"])
    if op == "del":
        return s[:i] + s[i + 1:]
    if op == "sub":
        return s[:i] + rng.choice("abcxyz") + s[i + 1:]
    return s[:i] + rng.choice("abcxyz") + s[i:]


class TestEditDistanceJoin:
    @pytest.fixture(scope="class")
    def tables(self, spark):
        rng = random.Random(13)
        words = [
            "spark", "sparks", "sprak", "quartz", "quarts", "engine",
            "engines", "a", "ab", "", "data pipeline", "dta pipeline",
            "weighted", "weigthed", "Levenshtein", "levenstein",
        ]
        base = [
            "".join(rng.choice("abcdefgh") for _ in range(rng.randint(0, 12)))
            for _ in range(40)
        ]
        lrows = [(i, w) for i, w in enumerate(words + base)]
        rrows = [(100 + i, _typo(rng, w)) for i, (_, w) in
                 enumerate(lrows)] + [(500, None), (501, "unrelatedzz")]
        L = spark.createDataFrame(lrows, "lid long, name string")
        R = spark.createDataFrame(rrows, "rid long, name string")
        return lrows, rrows, L, R

    @pytest.mark.parametrize("k", [0, 1, 2])
    def test_exact_vs_bruteforce(self, spark, tables, k):
        lrows, rrows, L, R = tables
        got = {
            (r["lid"], r["rid"], r["dist"])
            for r in edit_distance_join(
                L, R, "lid", "name", "rid", "name", max_dist=k
            ).collect()
        }
        assert got == _brute(lrows, rrows, k)

    def test_q3_also_exact(self, spark, tables):
        lrows, rrows, L, R = tables
        got = {
            (r["lid"], r["rid"], r["dist"])
            for r in edit_distance_join(
                L, R, "lid", "name", "rid", "name", max_dist=2, q=3
            ).collect()
        }
        assert got == _brute(lrows, rrows, 2)

    def test_case_sensitivity_switch(self, spark):
        L = spark.createDataFrame([(1, "Spark")], "lid long, name string")
        R = spark.createDataFrame([(2, "spark")], "rid long, name string")
        ci = edit_distance_join(
            L, R, "lid", "name", "rid", "name", max_dist=0
        ).collect()
        assert [(r["lid"], r["rid"], r["dist"]) for r in ci] == [(1, 2, 0)]
        cs = edit_distance_join(
            L, R, "lid", "name", "rid", "name", max_dist=0,
            lowercase=False,
        ).collect()
        assert cs == []

    def test_short_string_block(self, spark):
        # both-short pairs evade the prefix filter by the lemma's
        # vacuity — the length-band block must still find them
        L = spark.createDataFrame(
            [(1, ""), (2, "a"), (3, "ab")], "lid long, s string"
        )
        R = spark.createDataFrame(
            [(9, "b"), (10, "abc")], "rid long, s string"
        )
        got = {
            (r["lid"], r["rid"], r["dist"])
            for r in edit_distance_join(
                L, R, "lid", "s", "rid", "s", max_dist=2
            ).collect()
        }
        exp = _brute([(1, ""), (2, "a"), (3, "ab")],
                     [(9, "b"), (10, "abc")], 2)
        assert got == exp
        assert (1, 9, 1) in got  # "" vs "b"

    def test_no_cartesian_in_plan(self, spark, tables):
        _, _, L, R = tables
        plan = edit_distance_join(
            L, R, "lid", "name", "rid", "name", max_dist=1
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_guards(self, spark, tables):
        _, _, L, R = tables
        with pytest.raises(ValueError, match="max_dist"):
            edit_distance_join(L, R, "lid", "name", "rid", "name",
                               max_dist=-1)
        with pytest.raises(ValueError, match="q must"):
            edit_distance_join(L, R, "lid", "name", "rid", "name", q=1)


@pytest.mark.slow
class TestEditJoinProperties:
    def test_symmetry_under_table_swap(self, spark):
        # dist(a,b) == dist(b,a): swapping tables yields the mirrored
        # pair set with identical distances
        rows_a = [(1, "spark"), (2, "sprak"), (3, "walnut")]
        rows_b = [(9, "spark"), (8, "prank"), (7, "walnuts")]
        A = spark.createDataFrame(rows_a, "aid long, s string")
        B = spark.createDataFrame(rows_b, "bid long, s string")
        fwd = {
            (r["aid"], r["bid"], r["dist"])
            for r in edit_distance_join(
                A, B, "aid", "s", "bid", "s", max_dist=2
            ).collect()
        }
        rev = {
            (r["aid"], r["bid"], r["dist"])  # read back in fwd order
            for r in edit_distance_join(
                B, A, "bid", "s", "aid", "s", max_dist=2
            ).collect()
        }
        assert fwd == rev and len(fwd) >= 2

    def test_monotone_in_max_dist(self, spark):
        rng = random.Random(29)
        rows = [(i, "".join(rng.choice("abcd") for _ in range(6)))
                for i in range(25)]
        L = spark.createDataFrame(rows, "lid long, s string")
        R = spark.createDataFrame(
            [(100 + i, t) for i, (_, t) in enumerate(rows)],
            "rid long, s string",
        )
        prev: set = set()
        for k in (0, 1, 2, 3):
            cur = {
                (r["lid"], r["rid"])
                for r in edit_distance_join(
                    L, R, "lid", "s", "rid", "s", max_dist=k
                ).collect()
            }
            assert prev <= cur  # k grows -> pair set grows
            prev = cur


class TestRepetitiveStringGate:
    """r8 (ADVICE): the short-pair fallback gates on the PROVABLE
    condition — distinct gram-set size <= q*k — not string length.
    array_distinct shrinks a long repetitive string ("aaaa…") below
    the prefix-filter bound while its LENGTH passes a length gate;
    these rows must route through the length-band block."""

    def test_long_repetitive_strings_exact(self, spark):
        lrows = [
            (1, "a" * 50),
            (2, "a" * 49 + "b"),
            (3, "ab" * 25),
            (4, "b" * 50),
            (5, "a" * 3),
            (6, "xyxyxyxyxyxyxyxyxyxy"),
        ]
        rrows = [
            (10, "a" * 50),
            (11, "a" * 48),
            (12, "ab" * 25 + "a"),
            (13, "b" * 49 + "a"),
            (14, "aa"),
            (15, "yxyxyxyxyxyxyxyxyxyx"),
        ]
        L = spark.createDataFrame(lrows, ["lid", "ls"])
        R = spark.createDataFrame(rrows, ["rid", "rs"])
        for k in (1, 2):
            got = {
                (r["lid"], r["rid"], r["dist"])
                for r in edit_distance_join(
                    L, R, "lid", "ls", "rid", "rs", max_dist=k
                ).collect()
            }
            assert got == _brute(lrows, rrows, k)

    def test_fallback_covers_small_gramsets_regardless_of_length(
        self, spark
    ):
        # both sides' distinct 2-gram sets are <= q*k = 4 while the
        # strings are 40 chars long — the old length gate (<= 3)
        # excluded them from the band block
        lrows = [(1, "a" * 40)]
        rrows = [(2, "a" * 39 + "b")]
        L = spark.createDataFrame(lrows, ["lid", "ls"])
        R = spark.createDataFrame(rrows, ["rid", "rs"])
        got = edit_distance_join(
            L, R, "lid", "ls", "rid", "rs", max_dist=2
        ).collect()
        assert {(r["lid"], r["rid"], r["dist"]) for r in got} == {
            (1, 2, 1)
        }
