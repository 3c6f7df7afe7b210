"""Registry coverage gate (r7, closes the r6 driver-correctness blind
spot): round 6 shipped 8 new queries that the driver's correctness
snapshot never saw, because nothing in-repo asserted that the
``queries()`` / ``oracle_sql()`` enumerations and the SURVEY §2.7
inventory stay in lock-step.  These tests make a silent enumeration
mismatch a pytest failure.

No SparkSession needed — pure registry introspection (fast).
"""

import importlib.util
import re
from pathlib import Path

import pytest

_REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "_spark_entry_for_registry", _REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


#: queries deliberately shipped WITHOUT a DuckDB oracle (non-SQL
#: semantics — the driver records a weaker rows-only check for these).
#: Empty today: every registered query has a full value-hash oracle.
ROWS_ONLY_QUERIES: frozenset = frozenset()


class TestRegistry:
    def test_every_query_has_oracle(self, entry_mod):
        q = set(entry_mod.queries())
        o = set(entry_mod.oracle_sql())
        missing = q - o - ROWS_ONLY_QUERIES
        assert not missing, (
            f"queries with neither oracle_sql nor ROWS_ONLY exemption: "
            f"{sorted(missing)}"
        )

    def test_no_orphan_oracle(self, entry_mod):
        q = set(entry_mod.queries())
        o = set(entry_mod.oracle_sql())
        orphans = o - q
        assert not orphans, f"oracle_sql keys with no query: {sorted(orphans)}"

    def test_rows_only_list_current(self, entry_mod):
        # if an exemption becomes stale (the oracle was added), prune it
        o = set(entry_mod.oracle_sql())
        stale = ROWS_ONLY_QUERIES & o
        assert not stale, f"ROWS_ONLY entries that now HAVE oracles: {stale}"

    def test_queries_callable_and_named(self, entry_mod):
        q = entry_mod.queries()
        assert len(q) >= 58
        for name, fn in q.items():
            assert re.fullmatch(r"[a-z][a-z0-9_]*", name), name
            assert callable(fn), name

    def test_oracle_sql_nonempty_strings(self, entry_mod):
        for name, sql in entry_mod.oracle_sql().items():
            assert isinstance(sql, str) and "SELECT" in sql.upper(), name

    #: the driver's correctness snapshot checks only the FIRST 50 keys
    #: of queries().  r11 made rotation a POLICY (VERDICT r10 "What's
    #: wrong" #2) and, at 90 registered queries (the every-other-round
    #: bound exactly saturated), widened it to a THREE-round guarantee:
    #: the ordering is computed from _PREV_WINDOW / _PREV_WINDOW2 /
    #: _NEW_THIS_ROUND / _TOUCHED_THIS_ROUND in __spark_entry__; these
    #: tests enforce the policy's OUTCOMES so a stale set is a failure.
    _WINDOW = 50

    def test_new_and_touched_inside_window(self, entry_mod):
        window = set(list(entry_mod.queries())[: self._WINDOW])
        priority = set(entry_mod._NEW_THIS_ROUND) | set(
            entry_mod._TOUCHED_THIS_ROUND
        )
        missing = sorted(priority - window)
        assert not missing, (
            "queries added/engine-touched this round outside the "
            f"driver's first-{self._WINDOW} correctness window: {missing}"
        )

    def test_stale2_inside_window(self, entry_mod):
        # the HARD rotation guarantee: a query checked in NEITHER of
        # the last two windows must be checked now — otherwise it goes
        # three rounds driver-unchecked
        window = set(list(entry_mod.queries())[: self._WINDOW])
        dark = (
            set(entry_mod.queries())
            - entry_mod._PREV_WINDOW
            - entry_mod._PREV_WINDOW2
        )
        missing = sorted(dark - window)
        assert not missing, (
            "queries unchecked in both previous windows AND outside "
            f"this round's window (3 rounds dark): {missing}"
        )

    def test_stale1_before_back(self, entry_mod):
        # unchecked-last-round queries must sort before checked-last-
        # round ones, so the window prefers the stalest coverage
        names = list(entry_mod.queries())
        prio = set(entry_mod._NEW_THIS_ROUND) | set(
            entry_mod._TOUCHED_THIS_ROUND
        )
        rest = [n for n in names if n not in prio]
        seen_back = False
        for n in rest:
            if n in entry_mod._PREV_WINDOW:
                seen_back = True
            else:
                assert not seen_back, (
                    f"stale query {n} ordered after a checked-last-"
                    "round query"
                )

    def test_three_round_coverage_complete(self, entry_mod):
        window = set(list(entry_mod.queries())[: self._WINDOW])
        uncovered = sorted(
            set(entry_mod.queries())
            - window
            - entry_mod._PREV_WINDOW
            - entry_mod._PREV_WINDOW2
        )
        assert not uncovered, uncovered

    def test_rotation_feasible(self, entry_mod):
        # hard bound: this round's must-check set fits the window;
        # advisory bound: keep headroom before a widen-again is needed
        prio = set(entry_mod._NEW_THIS_ROUND) | set(
            entry_mod._TOUCHED_THIS_ROUND
        )
        stale2 = (
            set(entry_mod.queries())
            - entry_mod._PREV_WINDOW
            - entry_mod._PREV_WINDOW2
            - prio
        )
        assert len(prio | stale2) <= self._WINDOW, (
            f"{len(prio | stale2)} must-check queries exceed the "
            f"{self._WINDOW}-row window — the three-round guarantee "
            "is infeasible this round; trim _TOUCHED or widen again"
        )
        n = len(entry_mod.queries())
        assert n <= 140, (
            f"{n} registered queries — nearing the three-round "
            "feasibility ceiling; widen the rotation policy in "
            "__spark_entry__ (e.g. four-round coverage)"
        )

    def test_prev_window_names_resolve(self, entry_mod):
        stale = sorted(entry_mod._PREV_WINDOW - set(entry_mod.queries()))
        assert not stale, f"_PREV_WINDOW names not in queries(): {stale}"

    def test_prev_window2_names_resolve(self, entry_mod):
        stale = sorted(
            entry_mod._PREV_WINDOW2 - set(entry_mod.queries())
        )
        assert not stale, f"_PREV_WINDOW2 names not in queries(): {stale}"


class TestSurveyInventory:
    """Every oracle-query name cited in SURVEY §2.7 must resolve to a
    key of ``queries()``; rows with no query citation must be explicit
    tests-only rows (differential / pin / plan / parity / fixture …)."""

    _TESTS_ONLY = re.compile(
        r"test|differential|pin|round-trip|plan |plan-|plan/|property"
        r"|parity|fixture|invariant|robustness|availableNow|bound"
        r"|tie te|effect across",
        re.IGNORECASE,
    )

    def _survey_rows(self):
        lines = (_REPO / "SURVEY.md").read_text().splitlines()
        start = next(
            i for i, l in enumerate(lines) if l.startswith("### 2.7")
        )
        end = next(
            i for i, l in enumerate(lines) if i > start and l.startswith("## 3")
        )
        for ln in lines[start:end]:
            if (
                ln.startswith("|")
                and not ln.startswith("|---")
                and not ln.startswith("| Extension")
            ):
                yield ln

    def test_survey_query_names_resolve(self, entry_mod):
        q = set(entry_mod.queries())
        bad = []
        for row in self._survey_rows():
            tokens = set(re.findall(r"`([a-z][a-z0-9_]*)`", row))
            if tokens & q:
                continue  # row is oracle-checked by a live query
            if not self._TESTS_ONLY.search(row):
                bad.append(row[:100])
        assert not bad, (
            "SURVEY §2.7 rows citing no live query and not marked "
            f"tests-only (stale oracle-query name?): {bad}"
        )

    def test_survey_row_count_at_least_inventory(self):
        rows = list(self._survey_rows())
        assert len(rows) >= 151, len(rows)
