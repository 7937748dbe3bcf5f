"""Task-queue (jug-equivalent) tests: at-most-once claiming across
concurrent workers, failure records, barriers, invalidation
(reference: experiments/jug/*.py semantics)."""
import json
import threading
import time

import pytest

from bnn_priors_tpu.exp import BarrierNotReady, TaskQueue


def make_queue(tmp_path, log):
    q = TaskQueue(tmp_path / "jugdir")

    @q.generator
    def work(i):
        log.append(i)
        return i * 10

    for i in range(20):
        work(i)
    return q


def test_execute_runs_each_task_once(tmp_path):
    log = []
    q = make_queue(tmp_path, log)
    assert q.status() == {"waiting": 20, "running": 0, "done": 0, "failed": 0}
    assert q.execute(verbose=False) == 20
    assert sorted(log) == list(range(20))
    assert q.status()["done"] == 20
    # re-execute: everything already done, nothing runs again
    assert q.execute(verbose=False) == 0
    assert sorted(log) == list(range(20))
    # results readable
    assert q.result(q.tasks[3]) == 30


def test_two_workers_share_disjointly(tmp_path):
    "two concurrent workers on the same jugdir never run the same task"
    log = []
    qs = [make_queue(tmp_path, log) for _ in range(2)]
    counts = [0, 0]

    def worker(j):
        counts[j] = qs[j].execute(verbose=False)

    threads = [threading.Thread(target=worker, args=(j,)) for j in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sum(counts) == 20
    assert sorted(log) == list(range(20))  # each exactly once


def test_failure_recorded_and_invalidated(tmp_path):
    q = TaskQueue(tmp_path / "jugdir")
    state = {"fail": True}

    @q.generator
    def flaky():
        if state["fail"]:
            raise ValueError("boom")
        return "ok"

    flaky()
    q.execute(verbose=False)
    assert q.status()["failed"] == 1
    rec_dir = q._dir(q.tasks[0])
    rec = json.loads((rec_dir / "result.json").read_text())
    assert "boom" in rec["error"]
    # barrier refuses while failed
    with pytest.raises(RuntimeError):
        q.barrier()
    # invalidate + retry succeeds
    state["fail"] = False
    q.invalidate()
    assert q.status()["waiting"] == 1
    q.execute(verbose=False)
    assert q.status()["done"] == 1
    q.barrier()


def test_barrier_not_ready(tmp_path):
    q = TaskQueue(tmp_path / "jugdir")

    @q.generator
    def work():
        return 1

    work()
    with pytest.raises(BarrierNotReady):
        q.barrier()
    q.execute(verbose=False)
    q.barrier()


def test_stale_lock_cleanup(tmp_path):
    "a crashed worker's lock is reclaimed by cleanup(stale_s)"
    log = []
    q = make_queue(tmp_path, log)
    t0 = q.tasks[0]
    assert q._claim(t0)  # simulate a worker that died while holding the lock
    assert q.state(t0) == "running"
    q.cleanup(stale_s=1e9)  # not stale yet
    assert q.state(t0) == "running"
    time.sleep(0.01)
    q.cleanup(stale_s=0.0)
    assert q.state(t0) == "waiting"
    q.execute(verbose=False)
    assert q.status()["done"] == 20


def test_task_identity_is_stable(tmp_path):
    "re-declaring the same grid maps onto the same task records (jug hashes)"
    log = []
    q1 = make_queue(tmp_path, log)
    q1.execute(verbose=False)
    log2 = []
    q2 = make_queue(tmp_path, log2)
    assert q2.status()["done"] == 20
    assert q2.execute(verbose=False) == 0
    assert log2 == []


def test_post_claim_double_check(tmp_path, monkeypatch):
    """The claim/finish race deterministically: a task that gains a durable
    'done' record between the state check and the claim must not re-run."""
    log = []
    q = make_queue(tmp_path, log)
    t0 = q.tasks[0]

    real_state = q.state
    fired = {"n": 0}

    def racy_state(t):
        st = real_state(t)
        if t is t0 and st == "waiting" and fired["n"] == 0:
            # simulate a fast peer: claim+finish+unlock between our state
            # check and our claim attempt
            fired["n"] = 1
            q._finish(t0, "done", result=999)
        return st

    monkeypatch.setattr(q, "state", racy_state)
    assert q.execute(verbose=False) == 19  # t0 skipped, 19 others run
    assert sorted(log) == list(range(1, 20))  # t0's fn never executed
    assert not q._lock(t0).exists()  # the dead claim's lock was released
    assert q.result(t0) == 999


def test_unreadable_result_record_is_no_record(tmp_path):
    "a torn/deleted result.json reads as 'no durable record', not a crash"
    log = []
    q = make_queue(tmp_path, log)
    t0 = q.tasks[0]
    d = q._dir(t0)
    d.mkdir(parents=True, exist_ok=True)
    (d / "result.json").write_text("{not json")  # torn read
    assert q.state(t0) == "waiting"
    assert q.execute(verbose=False) == 20  # overwrites the torn record
    assert q.result(t0) == 0


def test_max_tasks_bounds_failures_too(tmp_path):
    "max_tasks time-boxes executions, not merely successes"
    q = TaskQueue(tmp_path / "jugdir")
    calls = []

    @q.generator
    def boom(i):
        calls.append(i)
        raise ValueError(i)

    for i in range(10):
        boom(i)
    assert q.execute(max_tasks=3, verbose=False) == 0  # 0 completed...
    assert len(calls) == 3  # ...but only 3 executed
    assert q.status()["failed"] == 3
