"""Tests for bench.py's round-end device guards.

The round driver runs bench.py unconditionally at round end. Two
environment facts make that fragile (CLAUDE.md): the axon tunnel flaps
for hours, and only ONE JAX client may hold it (a second deadlocks in
futex waits). bench.py therefore (a) preempts known resumable
tunnel-holder scripts by exact PID, and (b) probes the backend in a
timeout-bounded subprocess, emitting a parseable error record instead
of a stack trace when the tunnel is down. These tests cover the pure
logic of both guards on CPU.
"""
import json
import os
import subprocess
import sys
import time

import bench


def test_holder_pids_excludes_self_and_ancestors():
    # Our own pytest process tree contains no tunnel-holder script
    # names, and the scan must never return our own PID even if it did.
    pids = [pid for pid, _ in bench._holder_pids()]
    assert os.getpid() not in pids


def test_holder_pids_finds_exact_script_name():
    # Spawn a sleeper whose cmdline embeds one of the exact holder
    # names; the scan must find that PID (and only by full-name match —
    # a cmdline with a non-holder name must not appear).
    p = subprocess.Popen(
        ["sh", "-c", "exec sleep 30"],
        # cmdline matching is on the joined argv, so tag via argv:
    )
    try:
        assert p.pid not in [pid for pid, _ in bench._holder_pids()]
    finally:
        p.terminate()
        p.wait()
    q = subprocess.Popen(
        [sys.executable, "-c",
         "import sys, time; time.sleep(60)", "run_full_grid.py"])
    try:
        # /proc/<pid>/cmdline shows the parent image until execve
        # completes — poll briefly on this loaded single-core host.
        found = {}
        for _ in range(100):
            found = dict(bench._holder_pids())
            if q.pid in found:
                break
            time.sleep(0.3)
        assert q.pid in found
        assert "run_full_grid.py" in found[q.pid]
    finally:
        q.terminate()
        q.wait()


def test_probe_failure_emits_error_json():
    # With an impossible platform the probe subprocess fails fast; main()
    # must print ONE parseable JSON line carrying an error field, not a
    # traceback.
    env = dict(os.environ)
    env.pop("BENCH_SMALL", None)
    # JAX_PLATFORMS tricks are overridden by the axon sitecustomize, so
    # with the tunnel UP the probe would succeed and this test would run
    # a full TPU bench from CI (violating the one-client rule). Force
    # the failure path explicitly instead.
    env["BENCH_FORCE_PROBE_FAIL"] = "1"
    env["BENCH_TUNNEL_WAIT_S"] = "1"
    env["BENCH_NO_PREEMPT"] = "1"
    env["BENCH_REARM"] = "0"  # never spawn the real watchdog from CI
    r = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        timeout=300, env=env, cwd=os.path.dirname(bench.__file__) or ".")
    assert r.returncode == 0, r.stderr[-500:]
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["metric"] == "population_speedup"
    assert rec["value"] == 0.0
    assert "tunnel" in rec["error"]


def test_rearm_gating(tmp_path, monkeypatch):
    # BENCH_REARM=0 disables re-arm entirely.
    monkeypatch.setenv("BENCH_REARM", "0")
    bench._rearm_watchdog(tmp_path)  # must be a no-op (nothing to spawn)
    monkeypatch.delenv("BENCH_REARM")

    # No watchdog script under root: no-op.
    bench._rearm_watchdog(tmp_path)

    # Script present but every campaign stage stamped: skip (no spawn).
    (tmp_path / "scripts").mkdir()
    (tmp_path / "scripts" / "wait_tpu_and_run_grid.sh").write_text(
        "#!/bin/sh\nexit 0\n")
    stamps = tmp_path / "work" / "r5-stamps"
    stamps.mkdir(parents=True)
    # No campaign script under tmp_path -> the fallback stage list is
    # what _rearm_watchdog checks against.
    for s in bench._CAMPAIGN_STAGES_FALLBACK:
        (stamps / s).touch()
    spawned = []
    monkeypatch.setattr(
        "subprocess.Popen",
        lambda *a, **k: spawned.append(a) or (_ for _ in ()).throw(
            AssertionError("must not spawn when fully stamped")))
    bench._rearm_watchdog(tmp_path)
    assert not spawned


def test_holder_sidecar_and_partials(tmp_path, monkeypatch):
    """utils/holder: the preemption contract (VERDICT r4 #5/#8) —
    register/read sidecars and fsync'd per-arm partials."""
    from sign_language_nlp_tpu.utils import holder

    monkeypatch.setattr(holder, "sidecar_path",
                        lambda pid=None: tmp_path / f"sc_{pid or 0}.json")
    p = holder.register_holder(partials=tmp_path / "arms.jsonl",
                               resumable=False, note="test")
    sc = holder.read_sidecar(0)
    assert sc["partials"].endswith("arms.jsonl")
    assert sc["resumable"] is False and sc["pid"] == os.getpid()

    assert holder.partial_count(tmp_path / "arms.jsonl") == 0
    holder.flush_partial(tmp_path / "arms.jsonl", {"arm": "flat", "s": 1})
    holder.flush_partial(tmp_path / "arms.jsonl", {"arm": "c", "s": 2})
    assert holder.partial_count(tmp_path / "arms.jsonl") == 2
    recs = [json.loads(l) for l in
            (tmp_path / "arms.jsonl").read_text().splitlines()]
    assert [r["arm"] for r in recs] == ["flat", "c"]

    # A dead/missing sidecar reads as None, not an exception:
    assert holder.read_sidecar(999999999) is None
    p.unlink()


def _run_supervisor(tmp_path, stamps=(), pidfiles=(), polls=1):
    """Run the JAX-free campaign supervisor against a faked root."""
    root = tmp_path / "root"
    piddir = tmp_path / "pids"
    (root / "work" / "r5-stamps").mkdir(parents=True, exist_ok=True)
    piddir.mkdir(exist_ok=True)
    for s in stamps:
        (root / "work" / "r5-stamps" / s).write_text("")
    for name, pid in pidfiles:
        (piddir / name).write_text(str(pid))
    env = dict(os.environ, SUP_ROOT=str(root), SUP_PIDDIR=str(piddir),
               SUP_POLLS=str(polls), SUP_SLEEP="0", SUP_DRYRUN="1")
    r = subprocess.run(
        ["bash", os.path.join(os.path.dirname(bench.__file__),
                              "scripts", "supervise_r5_campaign.sh")],
        env=env, capture_output=True, text=True, timeout=60)
    log = root / "work" / "r5-supervisor.log"
    return r, log.read_text() if log.exists() else ""


_ALL_STAMPS = ("compact-ab", "bucket-ab", "grid-transformer",
               "grid-gru", "grid-lstm", "grid-200-emb128")


def test_supervisor_exits_when_all_stamped(tmp_path):
    r, log = _run_supervisor(tmp_path, stamps=_ALL_STAMPS)
    assert r.returncode == 0
    assert "all stages stamped" in log
    assert "arming watchdog" not in log


def test_supervisor_defers_to_live_campaign(tmp_path):
    # A pidfile pointing at a live process (ourselves) means the
    # campaign/bench/watchdog owns the tunnel — no relaunch.
    for name in ("bench.pid", "watchdog.pid", "r5_campaign.pid"):
        r, log = _run_supervisor(
            tmp_path, stamps=("compact-ab",),
            pidfiles=[(name, os.getpid())])
        assert "arming watchdog" not in log, name


def test_supervisor_arms_watchdog_when_everything_dead(tmp_path):
    # Stale pidfile (dead pid) + unstamped stages -> relaunch path.
    r, log = _run_supervisor(
        tmp_path, stamps=("compact-ab",),
        pidfiles=[("r5_campaign.pid", 999999999)])
    assert "arming watchdog" in log
    assert "DRYRUN: would arm watchdog" in log
