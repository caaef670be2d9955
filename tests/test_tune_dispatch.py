"""Multi-host trial dispatch (shared-filesystem queue): atomic claiming,
result collection, cross-host ASHA rungs, and the coordinator flow."""

import json
import multiprocessing as mp
import os
import time

import pytest

from masters_thesis_tpu.tune.asha import ASHAScheduler
from masters_thesis_tpu.tune.dispatch import (
    FileLock,
    FileRungs,
    _Heartbeat,
    _require_fresh_queue,
    _server_now,
    claim_next,
    collect_results,
    enqueue_trials,
    init_queue,
    requeue_stale,
    run_distributed_experiment,
    run_worker,
    stop_queue,
)


def test_enqueue_claim_exactly_once(tmp_path):
    q = str(tmp_path / "q")
    assert enqueue_trials(q, [{"x": i} for i in range(5)]) == 5
    seen = []
    while True:
        spec = claim_next(q, "w0")
        if spec is None:
            break
        seen.append(spec["trial_id"])
    assert sorted(seen) == [0, 1, 2, 3, 4]
    assert claim_next(q, "w0") is None  # drained


def test_file_rungs_roundtrip_and_lock(tmp_path):
    rungs = FileRungs(str(tmp_path / "rungs.json"))
    assert rungs.get(2) is None
    rungs[2] = [1.0, 3.0]
    assert rungs.get(2) == [1.0, 3.0]
    lock = FileLock(str(tmp_path / "l.lock"))
    with lock:
        assert os.path.exists(lock.path)
    assert not os.path.exists(lock.path)


def test_worker_runs_trials_and_records(tmp_path):
    q = str(tmp_path / "q")
    enqueue_trials(q, [{"v": 1.0}, {"v": 2.0}, {"v": "boom"}])

    def trial(cfg, report):
        if cfg["v"] == "boom":
            raise RuntimeError("synthetic failure")
        report(1, {"val_loss": cfg["v"]})
        return cfg["v"]

    n = run_worker(q, trial, scheduler=None, max_idle_s=0.1)
    assert n == 3
    records = collect_results(q, 3, timeout_s=5)
    ok = [r for r in records if r.get("final_metric") is not None]
    bad = [r for r in records if r.get("final_metric") is None]
    assert len(ok) == 2 and len(bad) == 1
    assert "RuntimeError" in bad[0]["error"]
    assert ok[0]["history"] == [{"t": 1, "val_loss": 1.0}]


def _worker_proc(q, wid):
    # trial metric = config value; 4 epochs, rungs at t=2
    def trial(cfg, report):
        last = cfg["v"]
        for t in range(1, 5):
            if report(t, {"val_loss": cfg["v"]}) == "stop":
                return cfg["v"]
        return last

    sched = ASHAScheduler(max_t=10, grace_period=2, reduction_factor=2)
    run_worker(q, trial, sched, worker_id=wid, max_idle_s=1.0)


def test_two_worker_processes_share_asha_rungs(tmp_path):
    """Two genuinely separate processes prune against the SAME rung file:
    with reduction_factor=2, the worse half of trials reaching rung t=2
    stops early."""
    q = str(tmp_path / "q")
    # 8 trials, metric = v: 4 good (0.1..0.4), 4 bad (10..40)
    vals = [0.1, 0.2, 0.3, 0.4, 10.0, 20.0, 30.0, 40.0]
    enqueue_trials(q, [{"v": v} for v in vals])
    ctx = mp.get_context("spawn")
    ps = [ctx.Process(target=_worker_proc, args=(q, f"w{i}"))
          for i in range(2)]
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=120)
        assert p.exitcode == 0
    records = collect_results(q, 8, timeout_s=5)
    stopped = {r["config"]["v"] for r in records if r["stopped_early"]}
    survived = {r["config"]["v"] for r in records if not r["stopped_early"]}
    # the single worst trial at each rung observation must be cut; the best
    # trials must never be cut (async cutoffs depend on arrival order, so
    # exact membership varies — assert the invariants that don't)
    assert 40.0 in stopped or 30.0 in stopped
    assert 0.1 in survived
    # records came from the spawned workers (instant trials mean one worker
    # can legitimately drain the whole queue before the other starts)
    assert {r["worker"] for r in records} <= {"w0", "w1"}
    # rung file holds all 8 observations at t=2
    rungs = json.load(open(os.path.join(q, "rungs.json")))
    assert len(rungs["2"]) == 8


def test_coordinator_flow(tmp_path):
    q = str(tmp_path / "q")

    def trial(cfg, report):
        report(1, {"val_loss": cfg["v"]})
        return cfg["v"]

    res = run_distributed_experiment(
        trial, [{"v": 3.0}, {"v": 1.0}, {"v": 2.0}],
        scheduler=None, queue_dir=q, timeout_s=10)
    assert len(res.trials) == 3
    assert res.best()["config"] == {"v": 1.0}
    assert os.path.exists(os.path.join(q, "STOP"))
    # late worker sees STOP and exits without hanging
    assert run_worker(q, trial, max_idle_s=5.0) == 0


def test_stale_lock_is_broken(tmp_path):
    path = str(tmp_path / "x.lock")
    with open(path, "w") as f:
        f.write("999999")
    os.utime(path, (0, 0))  # ancient mtime -> stale
    with FileLock(path, stale_s=1.0):
        pass  # acquiring must not deadlock


def test_dead_worker_claim_requeued_and_rerun(tmp_path):
    """A crashed worker's running/ spec (stale heartbeat) is re-queued by
    the next idle worker and completes, with the requeue recorded."""
    q = str(tmp_path / "q")
    enqueue_trials(q, [{"v": 7.0}])
    dead = claim_next(q, "dead-host")  # simulate a worker that then crashed
    os.utime(dead["_claimed"], (0, 0))  # heartbeat long gone
    stop_queue(q)  # live worker drains pending + stale, then exits

    def trial(cfg, report):
        report(1, {"val_loss": cfg["v"]})
        return cfg["v"]

    assert run_worker(q, trial, stale_claim_s=0.5, max_idle_s=2.0) == 1
    [rec] = collect_results(q, 1, timeout_s=5)
    assert rec["final_metric"] == 7.0
    assert rec["requeues"] == 1
    assert not os.listdir(os.path.join(q, "running"))


def test_live_claim_not_requeued_and_heartbeat_refreshes(tmp_path):
    q = str(tmp_path / "q")
    enqueue_trials(q, [{"v": 1.0}])
    spec = claim_next(q, "w0")  # fresh claim mtime = live heartbeat
    assert requeue_stale(q, stale_claim_s=60.0) == 0
    # the heartbeat thread keeps an aged spec looking live
    os.utime(spec["_claimed"], (0, 0))
    hb = _Heartbeat(spec["_claimed"], every_s=0.05)
    try:
        deadline = time.time() + 5.0
        while (os.path.getmtime(spec["_claimed"]) == 0
               and time.time() < deadline):
            time.sleep(0.02)
        assert os.path.getmtime(spec["_claimed"]) > 0
    finally:
        hb.stop()
    assert requeue_stale(q, stale_claim_s=60.0) == 0


def test_aged_pending_spec_claim_is_not_stale(tmp_path):
    """A spec that sat in pending/ longer than stale_claim_s must NOT look
    stale the instant it is claimed: os.rename preserves the enqueue-time
    mtime, so without claim_next's utime a live fresh claim would be
    re-queued (duplicate execution) before the heartbeat's first touch."""
    q = str(tmp_path / "q")
    enqueue_trials(q, [{"v": 1.0}])
    # age the pending spec far past any staleness threshold
    pending = os.path.join(q, "pending", "trial_0000.json")
    os.utime(pending, (0, 0))
    spec = claim_next(q, "w0")
    assert spec is not None
    # the claim is seconds old at most — a stale scan must leave it alone
    assert requeue_stale(q, stale_claim_s=60.0) == 0
    assert os.path.exists(spec["_claimed"])
    assert os.listdir(os.path.join(q, "pending")) == []


def test_orphaned_requeue_tempfile_is_swept(tmp_path):
    """A requeuer that died between its two renames strands the trial as
    pending/<name>.requeue.<pid> — invisible to every .json listing. The
    orphan sweep inside requeue_stale must restore the canonical name once
    the orphan is older than stale_claim_s, and the trial then runs."""
    q = str(tmp_path / "q")
    enqueue_trials(q, [{"v": 5.0}])
    name = "trial_0000.json"
    orphan = os.path.join(q, "pending", f"{name}.requeue.12345")
    os.rename(os.path.join(q, "pending", name), orphan)
    assert claim_next(q, "w0") is None  # invisible: nothing claimable
    # a fresh orphan is left alone (its requeuer may still be mid-rewrite)
    assert requeue_stale(q, stale_claim_s=60.0) == 0
    os.utime(orphan, (0, 0))  # its requeuer is long dead
    assert requeue_stale(q, stale_claim_s=60.0) == 1
    spec = claim_next(q, "w0")
    assert spec is not None and spec["trial_id"] == 0


def test_requeue_intermediate_is_not_born_stale(tmp_path, monkeypatch):
    """The winning rename in requeue_stale preserves the DEAD worker's
    heartbeat mtime, so the pending/<name>.requeue.<pid> intermediate is
    >= stale_claim_s old by construction — without an immediate utime the
    orphan sweep's grace window never protects a live requeuer and a
    concurrent sweeper races the rewrite (duplicate trial)."""
    q = str(tmp_path / "q")
    enqueue_trials(q, [{"v": 3.0}])
    dead = claim_next(q, "dead-host")
    os.utime(dead["_claimed"], (0, 0))  # heartbeat long gone
    real_rename = os.rename

    def failing_final_rename(src, dst):
        # strand the intermediate: fail only the mine -> canonical rename
        if ".requeue." in str(src) and str(dst).endswith(".json"):
            raise OSError("simulated transient fs error")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_final_rename)
    assert requeue_stale(q, stale_claim_s=60.0) == 0  # aborted mid-requeue
    monkeypatch.undo()
    pending = os.path.join(q, "pending")
    orphans = [n for n in os.listdir(pending) if ".requeue." in n]
    assert len(orphans) == 1
    # the stranded intermediate was utime'd by its (briefly live) requeuer:
    # the sweep's grace window must now actually protect it
    assert requeue_stale(q, stale_claim_s=60.0) == 0
    assert [n for n in os.listdir(pending) if ".requeue." in n] == orphans
    # once genuinely old, the sweep recovers it as before
    os.utime(os.path.join(pending, orphans[0]), (0, 0))
    assert requeue_stale(q, stale_claim_s=60.0) == 1
    spec = claim_next(q, "w0")
    assert spec is not None and spec["trial_id"] == 0


def test_claim_survives_concurrent_steal(tmp_path, monkeypatch):
    """If a concurrent host's stale scan steals a just-claimed spec back to
    pending/ (its rename-preserved enqueue mtime looked stale) before the
    claimer reads it, claim_next must move on to the next spec instead of
    crashing the worker loop with FileNotFoundError."""
    q = str(tmp_path / "q")
    enqueue_trials(q, [{"v": 1.0}, {"v": 2.0}])
    real_utime = os.utime
    stolen = {}

    def stealing_utime(path, *a, **k):
        if "running" in str(path) and "trial_0000" in str(path) and not stolen:
            stolen["done"] = True
            os.rename(path, os.path.join(q, "pending", "trial_0000.json"))
            raise OSError("simulated: spec stolen before the utime landed")
        return real_utime(path, *a, **k)

    monkeypatch.setattr(os, "utime", stealing_utime)
    spec = claim_next(q, "w0")
    assert spec is not None and spec["trial_id"] == 1
    assert os.path.exists(os.path.join(q, "pending", "trial_0000.json"))


def test_broken_holders_exit_does_not_delete_new_lock(tmp_path):
    """A holder whose lock was (rightly or wrongly) broken and reacquired
    by another contender must not unlink the NEW holder's live lock on its
    way out — __exit__ checks the per-acquire token first."""
    path = str(tmp_path / "x.lock")
    a = FileLock(path, stale_s=30.0)
    a.__enter__()
    os.unlink(path)  # simulate a's lock being broken by a contender
    b = FileLock(path, stale_s=30.0)
    b.__enter__()
    a.__exit__(None, None, None)  # must leave b's lock alone
    assert os.path.exists(path)
    b.__exit__(None, None, None)
    assert not os.path.exists(path)


def test_stalled_live_lock_holder_keeps_lock_fresh(tmp_path):
    """A live holder stalled past stale_s (GC pause, NFS hiccup) must not
    get its lock broken: the holder-side heartbeat refreshes the lock
    mtime, so only an actually-dead holder goes stale."""
    path = str(tmp_path / "x.lock")
    with FileLock(path, stale_s=1.0):
        time.sleep(2.5)  # stall well past stale_s
        age = _server_now(path) - os.path.getmtime(path)
        assert age < 1.0, f"lock mtime {age:.2f}s old despite live holder"
    assert not os.path.exists(path)


def test_fresh_queue_refusal_preserves_asha_state(tmp_path):
    """_require_fresh_queue must refuse BEFORE deleting rungs.json: its
    error message tells the user to retry with --resume-queue, and resume
    deliberately preserves rungs.json (cross-host ASHA state)."""
    q = str(tmp_path / "q")
    enqueue_trials(q, [{"v": 1.0}])
    rungs_path = os.path.join(q, "rungs.json")
    with open(rungs_path, "w") as f:
        f.write('{"1": [0.5]}')
    with pytest.raises(RuntimeError, match="resume-queue"):
        _require_fresh_queue(q)
    assert os.path.exists(rungs_path)  # the suggested retry still has it


def test_resume_refuses_out_of_range_trial_ids(tmp_path):
    """Resuming with a smaller search space must be refused: leftover done/
    records with trial_id >= len(configs) would otherwise satisfy
    collect_results' count and leak foreign configs into best()."""
    q = str(tmp_path / "q")

    def trial(cfg, report):
        report(1, {"val_loss": cfg["v"]})
        return cfg["v"]

    space = [{"v": 3.0}, {"v": 1.0}, {"v": 2.0}]
    run_distributed_experiment(trial, space, queue_dir=q, timeout_s=10)
    with pytest.raises(RuntimeError, match="search space has only"):
        run_distributed_experiment(
            trial, space[:2], queue_dir=q, timeout_s=10, resume=True)


def test_coordinator_collect_requeues_stale(tmp_path):
    """The coordinator's collect poll frees a dead worker's claim even when
    it cannot run trials itself (TimeoutError still raised with the count)."""
    q = str(tmp_path / "q")
    enqueue_trials(q, [{"v": 1.0}])
    dead = claim_next(q, "dead-host")
    os.utime(dead["_claimed"], (0, 0))
    with pytest.raises(TimeoutError):
        collect_results(q, 1, poll_s=0.05, timeout_s=0.3, stale_claim_s=0.1)
    assert os.listdir(os.path.join(q, "pending")) == [
        os.path.basename(dead["_claimed"])]


def test_resume_queue_continues_interrupted_run(tmp_path):
    """Coordinator crash recovery: resume keeps done/ results, re-enqueues
    only the missing trials, and finishes the experiment; a changed search
    space is refused."""
    q = str(tmp_path / "q")

    def trial(cfg, report):
        report(1, {"val_loss": cfg["v"]})
        return cfg["v"]

    space = [{"v": 3.0}, {"v": 1.0}, {"v": 2.0}]
    # simulate the interrupted first run: trial 0 done, trial 2 claimed by a
    # now-dead worker, trial 1 never enqueued (coordinator died mid-enqueue)
    enqueue_trials(q, space)
    os.unlink(os.path.join(q, "pending", "trial_0001.json"))
    dead = claim_next(q, "dead-host")
    assert dead["trial_id"] == 0
    run_worker(q, trial, max_idle_s=0.1, stale_claim_s=3600)  # trial 2 only
    os.utime(dead["_claimed"], (0, 0))  # its worker is long dead
    stop_queue(q)
    assert len(os.listdir(os.path.join(q, "done"))) == 1

    with pytest.raises(RuntimeError, match="resume"):
        run_distributed_experiment(trial, space, queue_dir=q, timeout_s=10)
    with pytest.raises(RuntimeError, match="identical"):
        run_distributed_experiment(
            trial, [{"v": 99.0}] * 3, queue_dir=q, timeout_s=10, resume=True)

    res = run_distributed_experiment(
        trial, space, queue_dir=q, timeout_s=30, resume=True,
        stale_claim_s=0.2)
    assert sorted(r["trial_id"] for r in res.trials) == [0, 1, 2]
    assert res.best()["config"] == {"v": 1.0}
    # the dead worker's claim of trial 0 was requeued and re-run
    rec0 = [r for r in res.trials if r["trial_id"] == 0][0]
    assert rec0["final_metric"] == 3.0 and rec0.get("requeues", 0) >= 1


def test_cli_queue_worker_smoke(tmp_path, capsys):
    """`mtt tune --queue` coordinator end-to-end over the real trial body."""
    from tests.test_cli import _smoke_cfg

    from masters_thesis_tpu.cli import main

    cfg = _smoke_cfg(tmp_path)
    q = str(tmp_path / "queue")
    rc = main(["tune", "--config", cfg, "--smoke-test", "--epochs", "1",
               "--smoke-keys", "12", "--queue", q])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_trials"] == 2
    assert os.path.exists(os.path.join(q, "STOP"))
