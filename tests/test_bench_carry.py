"""bench.py's sf1 evidence carry-forward (_carry_sf1_evidence): a
partial/failed sf1 pass must never clobber a previous complete artifact
(r8 review find), and — r13 review find — the per-query run lists must
move WITH the mins they back, so a carried sf1_tail_sec is never paired
with an unrelated partial run list. Pure-function tests, no Spark."""

import bench


def _prev():
    return {
        "sf1_tail_sec": {"q1": 1.0, "q2": 2.0},
        "sf1_tail_runs_sec": {"q1": [1.0, 1.2], "q2": [2.0, 2.2]},
        "sf1_plan_metrics": {"q1": {"input_records": 10},
                             "q2": {"input_records": 20}},
    }


def test_complete_run_passes_through():
    payload = {
        "sf1_tail_sec": {"q1": 9.0, "q2": 8.0},
        "sf1_tail_runs_sec": {"q1": [9.0], "q2": [8.0]},
        "sf1_plan_metrics": {"q1": {}, "q2": {}},
    }
    out = bench._carry_sf1_evidence(dict(payload), _prev(), ["q1", "q2"])
    assert out["sf1_tail_sec"] == payload["sf1_tail_sec"]
    assert out["sf1_tail_runs_sec"] == payload["sf1_tail_runs_sec"]
    assert "sf1_carried_from_previous_run" not in out


def test_partial_run_carries_prev_and_stashes_attempt():
    partial = {
        "sf1_tail_sec": {"q1": 9.0},
        "sf1_tail_runs_sec": {"q1": [9.0, 9.5]},
        "sf1_plan_metrics": {"q1": {"input_records": 11}},
    }
    out = bench._carry_sf1_evidence(dict(partial), _prev(), ["q1", "q2"])
    assert out["sf1_carried_from_previous_run"] is True
    # mins AND their run lists come from the same (previous) run —
    # never prev mins with this run's partial lists
    assert out["sf1_tail_sec"] == _prev()["sf1_tail_sec"]
    assert out["sf1_tail_runs_sec"] == _prev()["sf1_tail_runs_sec"]
    assert out["sf1_plan_metrics"] == _prev()["sf1_plan_metrics"]
    # the partial attempt is stashed for debuggability, runs included
    stash = out["sf1_partial_attempt"]
    assert stash["sf1_tail_sec"] == partial["sf1_tail_sec"]
    assert stash["sf1_tail_runs_sec"] == partial["sf1_tail_runs_sec"]


def test_partial_run_with_no_prev_keeps_own_sections():
    partial = {
        "sf1_tail_sec": {"q1": 9.0},
        "sf1_tail_runs_sec": {"q1": [9.0]},
        "sf1_plan_metrics": {"q1": {}},
    }
    out = bench._carry_sf1_evidence(dict(partial), {}, ["q1", "q2"])
    assert out["sf1_tail_sec"] == partial["sf1_tail_sec"]
    assert "sf1_carried_from_previous_run" not in out
