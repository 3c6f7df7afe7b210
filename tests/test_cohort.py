"""Cohort retention triangle (cohort.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pandas_weights_spark.cohort import cohort_retention


@pytest.fixture(scope="module")
def events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: first day 0, returns day 1 and day 3 (twice)
        (1, base, 1.0),
        (1, base + dt.timedelta(days=1), 2.0),
        (1, base + dt.timedelta(days=3), 1.0),
        (1, base + dt.timedelta(days=3, hours=5), 1.0),
        # user 2: first day 0 only
        (2, base + dt.timedelta(hours=3), 5.0),
        # user 3: first day 1, returns day 2
        (3, base + dt.timedelta(days=1), 1.0),
        (3, base + dt.timedelta(days=2), 1.0),
    ]
    return spark.createDataFrame(rows, "user long, ts timestamp, w double")


class TestCohortRetention:
    def test_triangle(self, events):
        out = {
            (r["cohort"], r["period"]): r
            for r in cohort_retention(
                events, "user", "ts", "1d", weight=F.col("w")
            ).collect()
        }
        d0 = dt.datetime(2024, 1, 1)
        d1 = dt.datetime(2024, 1, 2)
        # cohort day0 = users 1,2; period 0 mass = 1 + 5
        assert out[(d0, 0)]["n_users"] == 2
        assert out[(d0, 0)]["mass"] == 6.0
        # day0 cohort, period 1: only user 1
        assert out[(d0, 1)]["n_users"] == 1 and out[(d0, 1)]["mass"] == 2.0
        # day0 cohort, period 3: user 1's two events aggregate
        assert out[(d0, 3)]["n_users"] == 1 and out[(d0, 3)]["mass"] == 2.0
        # day1 cohort = user 3
        assert out[(d1, 0)]["n_users"] == 1
        assert out[(d1, 1)]["n_users"] == 1
        assert (d0, 2) not in out  # nobody from day0 active on day2

    def test_retention_never_exceeds_cohort_size(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        out = cohort_retention(ev, "user_id", "ts", "1d")
        base = {r["cohort"]: r["n_users"]
                for r in out.where(F.col("period") == 0).collect()}
        for r in out.where(F.col("period") > 0).collect():
            assert r["n_users"] <= base[r["cohort"]], r

    def test_max_periods(self, events):
        out = cohort_retention(events, "user", "ts", "1d", max_periods=1)
        assert out.agg(F.max("period")).first()[0] <= 1

    def test_no_sort_in_first_seen(self, events):
        out = cohort_retention(events, "user", "ts", "1d")
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re
        # the first-seen window is unordered (min over user partition)
        for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
            assert " ASC" not in spec and " DESC" not in spec, spec

    def test_null_user_counts_as_one_pseudo_user(self, spark):
        # VERDICT r4 repro: NULL user (day 0, day 1) + user 7 (day 0).
        base = dt.datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [
                (None, base, 1.0),
                (None, base + dt.timedelta(days=1), 1.0),
                (7, base, 1.0),
            ],
            "user long, ts timestamp, w double",
        )
        out = {
            (r["cohort"], r["period"]): r
            for r in cohort_retention(
                ev, "user", "ts", "1d", weight=F.col("w")
            ).collect()
        }
        d0 = dt.datetime(2024, 1, 1)
        # period 0: user 7 + the NULL pseudo-user = 2 users, mass 2.0
        assert out[(d0, 0)]["n_users"] == 2
        assert out[(d0, 0)]["mass"] == 2.0
        # period 1: only the NULL pseudo-user is active
        assert out[(d0, 1)]["n_users"] == 1
        assert out[(d0, 1)]["mass"] == 1.0

    def test_calendar_rule_rejected(self, events):
        with pytest.raises((ValueError, KeyError)):
            cohort_retention(events, "user", "ts", "3ME")


class TestFunnel:
    @pytest.fixture(scope="class")
    def events_f(self, spark):
        from pandas_weights_spark.cohort import funnel  # noqa: F401

        base = dt.datetime(2024, 1, 1)
        m = lambda k: base + dt.timedelta(minutes=k)  # noqa: E731
        rows = [
            # u1 completes view -> cart -> buy in order
            (1, "view", m(0), 1.0), (1, "cart", m(5), 1.0),
            (1, "buy", m(9), 1.0),
            # u2 views and carts, never buys
            (2, "view", m(0), 2.0), (2, "cart", m(3), 2.0),
            # u3 BUYS BEFORE viewing: buy must not count (order matters)
            (3, "buy", m(0), 1.0), (3, "view", m(1), 1.0),
            # u4 only views
            (4, "view", m(2), 5.0),
            # u5 same-timestamp progression (ties allowed)
            (5, "view", m(0), 1.0), (5, "cart", m(0), 1.0),
            (5, "buy", m(0), 1.0),
        ]
        return spark.createDataFrame(
            rows, "user long, step string, ts timestamp, w double"
        )

    def test_ordered_conversion(self, events_f):
        from pandas_weights_spark.cohort import funnel

        out = {
            r["step"]: r
            for r in funnel(
                events_f, "user", "ts", "step",
                ["view", "cart", "buy"], weight=F.col("w"),
            ).collect()
        }
        assert out["view"]["n_users"] == 5
        assert out["cart"]["n_users"] == 3  # u1, u2, u5
        assert out["buy"]["n_users"] == 2   # u1, u5 (u3 bought too early)
        assert out["view"]["conversion"] == 1.0
        assert out["buy"]["conversion"] == pytest.approx(2 / 5)
        assert out["cart"]["mass"] == pytest.approx(1.0 + 2.0 + 1.0)
        assert out["buy"]["step_idx"] == 2

    def test_out_of_order_never_counts(self, spark):
        from pandas_weights_spark.cohort import funnel

        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, "b", base, 1.0), (1, "a", base + dt.timedelta(1), 1.0)],
            "user long, step string, ts timestamp, w double",
        )
        out = {
            r["step"]: r["n_users"]
            for r in funnel(df, "user", "ts", "step", ["a", "b"]).collect()
        }
        assert out == {"a": 1, "b": 0}

    def test_min_steps_guard(self, events_f):
        from pandas_weights_spark.cohort import funnel

        with pytest.raises(ValueError, match="2 steps"):
            funnel(events_f, "user", "ts", "step", ["view"])

    def test_mass_is_qualifying_event_weight(self, spark):
        # r6 (VERDICT r5 item 1): weights VARY within a user, so this
        # discriminates the pinned contract (qualifying event's weight)
        # from MAX / first / mean of the user's event weights.
        from pandas_weights_spark.cohort import funnel

        base = dt.datetime(2024, 1, 1)
        m = lambda k: base + dt.timedelta(minutes=k)  # noqa: E731
        rows = [
            # u1: view@0 (w=1), a LATER heavier view (w=9, must NOT be
            # the view mass), cart@5 (w=4), buy@9 (w=2)
            (1, "view", m(0), 1.0), (1, "view", m(3), 9.0),
            (1, "cart", m(5), 4.0), (1, "buy", m(9), 2.0),
            # u2: cart BEFORE first view (w=100, must not count), then
            # view@2 (w=3) and a qualifying cart@4 (w=5); no buy
            (2, "cart", m(0), 100.0), (2, "view", m(2), 3.0),
            (2, "cart", m(4), 5.0),
            # u3: tie at the qualifying cart time — two cart events at
            # m(1) with w=8 and w=6; min-weight tie-break picks 6
            (3, "view", m(0), 2.0), (3, "cart", m(1), 8.0),
            (3, "cart", m(1), 6.0),
        ]
        df = spark.createDataFrame(
            rows, "user long, step string, ts timestamp, w double"
        )
        out = {
            r["step"]: r
            for r in funnel(
                df, "user", "ts", "step",
                ["view", "cart", "buy"], weight=F.col("w"),
            ).collect()
        }
        # view mass: u1's FIRST view (1), u2's view (3), u3's view (2)
        assert out["view"]["mass"] == pytest.approx(1.0 + 3.0 + 2.0)
        # cart mass: u1 qualifying cart (4), u2 qualifying cart (5 —
        # NOT the pre-view 100), u3 tie-broken min weight (6)
        assert out["cart"]["mass"] == pytest.approx(4.0 + 5.0 + 6.0)
        # buy mass: only u1 (2) — the qualifying buy event's weight
        assert out["buy"]["mass"] == pytest.approx(2.0)
        assert out["cart"]["n_users"] == 3 and out["buy"]["n_users"] == 1
