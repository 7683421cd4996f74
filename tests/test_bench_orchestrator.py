"""bench.py relay-hardening (VERDICT r3 weak #1 / ask #1).

The driver runs `python bench.py` at end of round; a dead relay tunnel
must yield ONE parseable JSON diagnostic at rc 0, never a traceback.
These tests drive the orchestrator's three terminal paths without a TPU.
"""

import importlib.util
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    return mod


def test_relay_alive_detects_listener_and_corpse(monkeypatch):
    from stitchax.utils import platform as plat

    # no listener on an ephemeral port -> dead
    monkeypatch.setattr(plat, "RELAY_PORTS", (1,))  # port 1: never listening
    assert not plat.relay_alive(timeout=0.2)

    # a real local listener -> alive
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    try:
        monkeypatch.setattr(plat, "RELAY_PORTS", (srv.getsockname()[1],))
        assert plat.relay_alive(timeout=0.5)
    finally:
        srv.close()


def _run_orchestrate(mod, capsys):
    mod.orchestrate()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"expected ONE JSON line, got: {out}"
    return json.loads(out[0])


def test_dead_relay_emits_structured_diagnostic(bench, monkeypatch, tmp_path,
                                                capsys):
    monkeypatch.setenv("STITCHAX_PLATFORM", "")  # TPU wanted
    monkeypatch.setattr(bench, "_relay_alive", lambda *a, **k: False)
    # hermetic last-measured record (in production this is the committed
    # results/last_bench.json written by the previous successful run)
    last = {"metric": "full_stitch_pairs_per_sec_per_chip_384x448 (tpu)",
            "value": 4.6, "unit": "pairs/s",
            "extra": {"align_pairs_per_sec_per_chip_512_b4": 18.4},
            "commit": "abc1234"}
    p = tmp_path / "last_bench.json"
    p.write_text(json.dumps(last))
    monkeypatch.setattr(bench, "LAST_BENCH_PATH", str(p))
    rec = _run_orchestrate(bench, capsys)
    assert rec["error"] == "tpu_relay_dead"
    assert rec["value"] == 0.0 and rec["unit"] == "pairs/s"
    assert "NOT MEASURED" in rec["metric"]
    # carries the last successfully measured numbers + provenance
    assert rec["last_measured"]["value"] > 0
    assert rec["last_measured"]["extra"]["align_pairs_per_sec_per_chip_512_b4"] > 0
    assert rec["commit"]


def test_dead_relay_diagnostic_without_any_last_bench(bench, monkeypatch,
                                                      tmp_path, capsys):
    """Fresh-VM case: no last_bench.json anywhere — still ONE JSON line."""
    monkeypatch.setenv("STITCHAX_PLATFORM", "")
    monkeypatch.setattr(bench, "_relay_alive", lambda *a, **k: False)
    monkeypatch.setattr(bench, "LAST_BENCH_PATH",
                        str(tmp_path / "nope.json"))
    rec = _run_orchestrate(bench, capsys)
    assert rec["error"] == "tpu_relay_dead"
    assert rec["last_measured"] is None
    assert rec["commit"]


def test_successful_child_json_is_forwarded_and_recorded(
        bench, monkeypatch, tmp_path, capsys):
    monkeypatch.setattr(bench, "_relay_alive", lambda *a, **k: True)
    monkeypatch.setattr(bench, "LAST_BENCH_PATH",
                        str(tmp_path / "last_bench.json"))
    payload = {"metric": "full_stitch_pairs_per_sec_per_chip_384x448 (tpu)",
               "value": 5.0, "unit": "pairs/s", "vs_baseline": 5.0,
               "extra": {"align_pairs_per_sec_per_chip_512_b4": 20.0}}

    class FakeProc:
        returncode = 0
        def communicate(self, timeout=None):
            return "compile log noise\n" + json.dumps(payload) + "\n", None
        def terminate(self):
            pass

    monkeypatch.setattr(bench.subprocess, "Popen",
                        lambda *a, **k: FakeProc())
    rec = _run_orchestrate(bench, capsys)
    assert rec == payload
    saved = json.loads((tmp_path / "last_bench.json").read_text())
    assert saved["value"] == 5.0 and saved["commit"]


def test_hung_child_yields_timeout_diagnostic_no_sigkill(
        bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_relay_alive", lambda *a, **k: True)
    monkeypatch.setenv("STITCHAX_BENCH_TIMEOUT", "1")
    events = []

    class HungProc:
        returncode = None
        def communicate(self, timeout=None):
            events.append("communicate")
            raise subprocess.TimeoutExpired("bench", timeout)
        def terminate(self):
            events.append("terminate")
        def kill(self):  # must never be called (CLAUDE.md: no kill -9)
            events.append("kill")

    monkeypatch.setattr(bench.subprocess, "Popen",
                        lambda *a, **k: HungProc())
    rec = _run_orchestrate(bench, capsys)
    assert rec["error"] == "bench_timeout"
    assert "kill" not in events and "terminate" in events


def test_crashed_child_yields_failure_diagnostic_with_tail(
        bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_relay_alive", lambda *a, **k: True)

    class DeadProc:
        returncode = 1
        def communicate(self, timeout=None):
            return "Traceback (most recent call last):\nBOOM\n", None
        def terminate(self):
            pass

    monkeypatch.setattr(bench.subprocess, "Popen",
                        lambda *a, **k: DeadProc())
    rec = _run_orchestrate(bench, capsys)
    assert rec["error"] == "bench_failed"
    assert "BOOM" in rec["detail"]
    assert rec["value"] == 0.0


def test_live_script_dead_relay_end_to_end(monkeypatch):
    """The committed entry point itself: rc 0 + one JSON line, fast."""
    env = dict(os.environ)
    env["STITCHAX_PLATFORM"] = ""  # ask for TPU
    # run from repo root; relay really is probed — if a relay happens to be
    # alive in this environment the child would start a real bench, so cap
    # the subprocess budget to keep the test bounded either way
    env["STITCHAX_BENCH_TIMEOUT"] = "5"
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=180,
                       cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-500:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert "value" in rec and "vs_baseline" in rec
