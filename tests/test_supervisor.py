"""Supervised-run watchdog: survive injected compile-drop stalls.

The failure mode being modeled: a dropped remote compile blocks the
client at zero CPU forever (NOTES_ROUND4.md); the reference's analogue
of recovery is SavesPolicy restart (common/pipeline/stage.hpp:156-192).
``run_supervised`` must detect the zero-CPU stall, kill the process
group, and resume — and a run that stalls on its first TWO attempts
must still complete (VERDICT round 4, item 2: "survives >= 2 injected
compile-drops").
"""

import os
import sys
import textwrap

from spades_for_blackbird_tpu.pipeline.supervisor import run_supervised

# a fake pipeline: reads an attempt counter from its state dir; on the
# first N attempts it "drops a compile" (blocks at zero CPU via
# os.read on an empty pipe); afterwards it writes the result and exits 0
FAKE = textwrap.dedent("""
    import os, sys, time
    state = sys.argv[1]
    drops = int(sys.argv[2])
    att_file = os.path.join(state, "attempts")
    n = int(open(att_file).read()) if os.path.exists(att_file) else 0
    open(att_file, "w").write(str(n + 1))
    if n < drops:
        r, w = os.pipe()          # zero-CPU block, uninterruptible by
        os.read(r, 1)             # SIGALRM-style in-process guards
    open(os.path.join(state, "result"), "w").write("contigs")
    sys.exit(0)
""")


def _run(tmp_path, drops, **kw):
    script = tmp_path / "fake_pipeline.py"
    script.write_text(FAKE)
    state = tmp_path / "state"
    state.mkdir()
    logs = []
    rc = run_supervised(
        lambda attempt: [sys.executable, str(script), str(state),
                         str(drops)],
        stall_s=2.0, poll_s=0.25, cooldown_s=0.1, max_attempts=6,
        log=logs.append, **kw)
    return rc, state, logs


def test_clean_run_no_restart(tmp_path):
    rc, state, logs = _run(tmp_path, drops=0)
    assert rc == 0
    assert (state / "result").read_text() == "contigs"
    assert (state / "attempts").read_text() == "1"


def test_survives_two_injected_drops(tmp_path):
    rc, state, logs = _run(tmp_path, drops=2)
    assert rc == 0
    assert (state / "result").read_text() == "contigs"
    assert (state / "attempts").read_text() == "3"
    assert sum("killing process group" in l for l in logs) == 2


def test_gives_up_after_max_attempts(tmp_path):
    rc, state, logs = _run(tmp_path, drops=99)
    assert rc != 0
    assert not (state / "result").exists()


def test_crash_is_retried(tmp_path):
    # a child that dies (XLA:CPU segfault flake / OOM-kill) is resumed
    script = tmp_path / "crashy.py"
    script.write_text(textwrap.dedent("""
        import os, sys
        state = sys.argv[1]
        att = os.path.join(state, "attempts")
        n = int(open(att).read()) if os.path.exists(att) else 0
        open(att, "w").write(str(n + 1))
        if n == 0:
            os.abort()
        open(os.path.join(state, "result"), "w").write("ok")
    """))
    state = tmp_path / "state"
    state.mkdir()
    rc = run_supervised(
        lambda a: [sys.executable, str(script), str(state)],
        stall_s=5.0, poll_s=0.25, cooldown_s=0.1, max_attempts=3,
        log=lambda s: None)
    assert rc == 0
    assert (state / "result").read_text() == "ok"


def test_env_rotation_from_attempt_three(tmp_path):
    script = tmp_path / "envdump.py"
    script.write_text(textwrap.dedent("""
        import os, sys
        state = sys.argv[1]
        att = os.path.join(state, "attempts")
        n = int(open(att).read()) if os.path.exists(att) else 0
        open(att, "w").write(str(n + 1))
        with open(os.path.join(state, f"env{n}"), "w") as f:
            f.write(os.environ.get("SFB_COUNT_CHUNK_LOG2", ""))
        sys.exit(0 if n >= 2 else 1)
    """))
    state = tmp_path / "state"
    state.mkdir()

    def env_for_attempt(attempt):
        return ({"SFB_COUNT_CHUNK_LOG2": 19} if attempt >= 3 else {})

    rc = run_supervised(
        lambda a: [sys.executable, str(script), str(state)],
        stall_s=5.0, poll_s=0.25, cooldown_s=0.1, max_attempts=4,
        env_for_attempt=env_for_attempt, log=lambda s: None)
    assert rc == 0
    assert (state / "env0").read_text() == ""
    assert (state / "env1").read_text() == ""
    assert (state / "env2").read_text() == "19"
