"""The complete job state machine (reference internal/geocube/job.go:28-130,
350-641): every consolidation/deletion arc, step-by-step Waiting semantics,
Continue / RetryForced precedence, and the compiled SQL fold used by the
job_state_replay query (3-way checked here: Go-port Python fold vs the Spark
higher-order-function fold; DuckDB is the driver's oracle side)."""

from __future__ import annotations

import pytest

from geocube_spark.streaming.jobs import (
    ARCS_BY_TYPE,
    CONSOLIDATION_ARCS,
    DELETION_ARCS,
    JOB_STATE_INFO,
    REPLAY_EVENT_MIX,
    STEP_ALL,
    STEP_CRITICAL,
    STEP_MAJOR,
    trigger,
)


class TestEveryArc:
    @pytest.mark.parametrize("jt,arcs", [("consolidation", CONSOLIDATION_ARCS), ("deletion", DELETION_ARCS)])
    def test_all_arcs_fire_when_waiting(self, jt, arcs):
        # waiting=True satisfies every only_when_waiting guard; exec_level=ALL
        # keeps the job pausing so new_waiting is exercised too
        for (state, event), (nxt, _only_w) in arcs.items():
            new_state, new_waiting, handled = trigger(jt, state, True, STEP_ALL, event)
            assert handled, (state, event)
            assert new_state == nxt, (state, event)
            assert new_waiting == (STEP_ALL >= JOB_STATE_INFO[nxt][0])

    def test_waiting_only_arcs_blocked_when_running(self):
        # CancelledByUser (non-forced) only lands while paused (job.go:397-401)
        for jt, arcs in ARCS_BY_TYPE.items():
            for (state, event), (_nxt, only_w) in arcs.items():
                if not only_w:
                    continue
                s, w, handled = trigger(jt, state, False, STEP_ALL, event)
                assert not handled and s == state and not w, (jt, state, event)

    def test_unlisted_events_are_unhandled(self):
        s, w, handled = trigger("consolidation", "DONE", False, STEP_ALL, "JobCreated")
        assert (s, w, handled) == ("DONE", False, False)
        s, w, handled = trigger("deletion", "FAILED", False, STEP_ALL, "DeletionReady")
        assert (s, w, handled) == ("FAILED", False, False)


class TestPrecedence:
    def test_continue_clears_waiting(self):
        s, w, handled = trigger("consolidation", "CREATED", True, STEP_ALL, "Continue")
        assert (s, w, handled) == ("CREATED", False, True)

    def test_continue_unhandled_when_running(self):
        s, w, handled = trigger("consolidation", "CREATED", False, STEP_ALL, "Continue")
        assert (s, w, handled) == ("CREATED", False, False)

    def test_generic_retry_forced_is_noop_requeue(self):
        # CREATED is flagged retry_forced -> handled, no state change
        # (job.go:361-364: requeues the step, logs, does not changeState)
        s, w, handled = trigger("consolidation", "CREATED", True, STEP_ALL, "RetryForced")
        assert (s, w, handled) == ("CREATED", True, True)

    def test_retry_forced_table_arc_when_not_flagged(self):
        # CONSOLIDATIONINPROGRESS is NOT flagged -> the table arc fires
        s, _w, handled = trigger(
            "consolidation", "CONSOLIDATIONINPROGRESS", False, STEP_ALL, "RetryForced"
        )
        assert handled and s == "CONSOLIDATIONFORCERETRYING"

    def test_donebutuntidy_retry_differs_by_type(self):
        # consolidation allows Retried; deletion only RetryForced (job.go:568)
        s, _, h = trigger("consolidation", "DONEBUTUNTIDY", False, STEP_ALL, "Retried")
        assert h and s == "CONSOLIDATIONEFFECTIVE"
        s, _, h = trigger("deletion", "DONEBUTUNTIDY", False, STEP_ALL, "Retried")
        assert not h and s == "DONEBUTUNTIDY"
        s, _, h = trigger("deletion", "DONEBUTUNTIDY", False, STEP_ALL, "RetryForced")
        assert h and s == "DELETIONEFFECTIVE"

    def test_initialisationfailed_forced_cancel_differs_by_type(self):
        # consolidation rolls back via ABORTED; deletion goes straight FAILED
        s, _, h = trigger(
            "consolidation", "INITIALISATIONFAILED", False, STEP_ALL, "CancelledByUserForced"
        )
        assert h and s == "ABORTED"
        s, _, h = trigger(
            "deletion", "INITIALISATIONFAILED", False, STEP_ALL, "CancelledByUserForced"
        )
        assert h and s == "FAILED"


class TestWaitingComputation:
    def test_pause_levels(self):
        # NEW --JobCreated--> CREATED (pause level MAJOR=3)
        _, w, _ = trigger("consolidation", "NEW", True, STEP_MAJOR, "JobCreated")
        assert w is True  # 3 >= 3
        _, w, _ = trigger("consolidation", "NEW", True, STEP_CRITICAL, "JobCreated")
        assert w is False  # 2 < 3

    def test_terminal_states_never_pause(self):
        _, w, _ = trigger(
            "consolidation", "CONSOLIDATIONEFFECTIVE", False, STEP_ALL, "DeletionStarted"
        )
        assert w is False  # DONE is STEP_NEVER

    def test_happy_path_async_never_pauses(self):
        state, waiting = "NEW", False
        for evt in [
            "JobCreated", "OrdersPrepared", "ConsolidationDone",
            "ConsolidationIndexed", "DatasetsSwapped", "DeletionStarted",
        ]:
            state, waiting, handled = trigger("consolidation", state, waiting, 1, evt)
            assert handled and not waiting
        assert state == "DONE"

    def test_cancel_retry_rollback_path(self):
        # cancel mid-consolidation, cancellation fails, retry, rollback
        path = [
            ("JobCreated", "CREATED"),
            ("OrdersPrepared", "CONSOLIDATIONINPROGRESS"),
            ("CancelledByUser", "CONSOLIDATIONCANCELLING"),
            ("CancellationFailed", "CANCELLATIONFAILED"),
            ("Retried", "CONSOLIDATIONCANCELLING"),
            ("CancellationDone", "ABORTED"),
            ("RollbackFailed", "ROLLBACKFAILED"),
            ("Retried", "ABORTED"),
            ("RollbackDone", "FAILED"),
        ]
        state, waiting = "NEW", False
        for evt, expect in path:
            state, waiting, handled = trigger("consolidation", state, waiting, 1, evt)
            assert handled and state == expect


def _python_replay(event_ids: list[int], job_id: int):
    """Pure-Python twin of the replay query's synthesis + fold."""
    exec_level = job_id % 5
    jt = "consolidation" if job_id % 2 == 0 else "deletion"
    state, waiting = "NEW", exec_level >= JOB_STATE_INFO["NEW"][0]
    for eid in sorted(event_ids):
        mix = (eid * 1103515245 + 12345) % 2147483648
        evt = REPLAY_EVENT_MIX[(mix // 65536) % len(REPLAY_EVENT_MIX)]
        state, waiting, _ = trigger(jt, state, waiting, exec_level, evt)
    return state, int(waiting)


class TestReplayQuery:
    def test_spark_fold_matches_python_port(self, spark):
        from geocube_spark.registry import job_state_replay

        got = {
            r["job_id"]: (r["final_state"], r["waiting"])
            for r in job_state_replay(spark, "/root/testdata/sf0.001").collect()
        }
        import duckdb

        ids = duckdb.sql(
            "SELECT event_id FROM '/root/testdata/sf0.001/events.parquet'"
        ).fetchall()
        by_job: dict[int, list[int]] = {}
        for (eid,) in ids:
            by_job.setdefault(eid % 64, []).append(eid)
        expected = {j: _python_replay(evs, j) for j, evs in by_job.items()}
        assert got == expected

    def test_replay_reaches_deep_states(self, spark):
        from geocube_spark.registry import job_state_replay

        states = {
            r["final_state"]
            for r in job_state_replay(spark, "/root/testdata/sf0.001").collect()
        }
        # the synthetic mix must actually traverse the machine, not idle in NEW
        assert len(states) >= 5, states
