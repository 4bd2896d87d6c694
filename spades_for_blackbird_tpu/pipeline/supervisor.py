"""In-pipeline run supervision: survive dropped remote compiles.

The tunneled TPU pool intermittently drops compile requests, leaving the
client blocked at zero CPU *inside a C call* — no in-process signal can
interrupt that. The reference's answer to mid-run death is restart-based
recovery through SavesPolicy (common/pipeline/stage.hpp:156-192 +
stage.cpp:143-203 load-or-roll-back); this module is the TPU-native
analogue with the watchdog built in: the pipeline runs as a supervised
child process, a zero-CPU-progress stall is detected from /proc, the
child's whole process group is killed, the pool is given time to unwedge
(a killed client wedges it for minutes), and the run resumes from the
last stage checkpoint via ``--continue``.

Used by ``cli.main`` under ``--supervise``; also importable directly
(scale_bench, tests).
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time
from typing import Callable, Sequence


def _cpu_ticks(pid: int) -> int | None:
    """utime+stime of *pid* in clock ticks, or None if gone."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(") ", 1)[1].split()
        # fields after comm: index 11/12 are utime/stime (0-based here)
        return int(parts[11]) + int(parts[12])
    except (OSError, IndexError, ValueError):
        return None


def _tree_cpu_ticks(pid: int) -> int | None:
    """CPU ticks summed over *pid* and its direct children.

    The child may itself fork helpers (e.g. compile warmers); progress
    anywhere in the tree counts as progress.
    """
    total = _cpu_ticks(pid)
    if total is None:
        return None
    try:
        with open(f"/proc/{pid}/task/{pid}/children") as f:
            kids = [int(c) for c in f.read().split()]
    except OSError:
        kids = []
    for kid in kids:
        t = _cpu_ticks(kid)
        if t is not None:
            total += t
    return total


def run_supervised(build_cmd: Callable[[int], Sequence[str]],
                   *,
                   max_attempts: int = 8,
                   stall_s: float = 480.0,
                   poll_s: float = 10.0,
                   cooldown_s: float = 150.0,
                   env_for_attempt: Callable[[int], dict] | None = None,
                   log: Callable[[str], None] = print) -> int:
    """Run ``build_cmd(attempt)`` until it exits 0, restarting on stalls.

    attempt is 1-based. A child with no CPU progress anywhere in its
    process tree for ``stall_s`` seconds is SIGKILLed by process group;
    after ``cooldown_s`` (time for the remote pool to unwedge after a
    dead client) the next attempt launches. A child that exits nonzero
    is also retried (the XLA:CPU segfault flake and OOM-killed runs look
    identical to a crash from outside). Returns the final exit code: 0
    on success, the last child's code after ``max_attempts`` failures,
    or -1 if every attempt stalled.
    """
    rc = -1
    for attempt in range(1, max_attempts + 1):
        cmd = list(build_cmd(attempt))
        env = dict(os.environ)
        if env_for_attempt:
            env.update({k: str(v)
                        for k, v in env_for_attempt(attempt).items()})
        log(f"[supervise] attempt {attempt}/{max_attempts}: "
            f"{' '.join(cmd)}")
        proc = subprocess.Popen(cmd, env=env, start_new_session=True)
        last_ticks: int | None = None
        stalled_since = time.monotonic()
        stalled = False
        while True:
            ret = proc.poll()
            if ret is not None:
                rc = ret
                break
            time.sleep(poll_s)
            ticks = _tree_cpu_ticks(proc.pid)
            if ticks is None:
                continue  # racing with exit; poll() will see it
            if ticks != last_ticks:
                last_ticks = ticks
                stalled_since = time.monotonic()
            elif time.monotonic() - stalled_since >= stall_s:
                log(f"[supervise] attempt {attempt}: no CPU progress "
                    f"for {stall_s:.0f}s — killing process group "
                    f"{proc.pid}")
                try:
                    # ask for a faulthandler stack dump first (cli.py
                    # registers SIGUSR1): the stall site lands in the
                    # child's stderr before the group dies
                    os.kill(proc.pid, signal.SIGUSR1)
                    time.sleep(5)
                except OSError:
                    pass
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except OSError:
                    proc.kill()
                proc.wait()
                stalled = True
                rc = -1
                break
        if not stalled and rc == 0:
            log(f"[supervise] attempt {attempt}: success")
            return 0
        if attempt < max_attempts:
            why = "stalled" if stalled else f"exited rc={rc}"
            log(f"[supervise] attempt {attempt} {why}; cooling down "
                f"{cooldown_s:.0f}s before resume")
            time.sleep(cooldown_s)
    log(f"[supervise] giving up after {max_attempts} attempts (rc={rc})")
    return rc


def supervise_cli(argv: list[str], *, max_attempts: int = 8,
                  stall_s: float = 480.0, cooldown_s: float = 150.0,
                  poll_s: float = 10.0,
                  log: Callable[[str], None] = print) -> int:
    """Supervise ``cli.main(argv)`` (argv WITHOUT --supervise flags).

    Attempt 1 runs argv as given; later attempts add ``--continue`` (and
    drop ``--restart-from``) so the run resumes from the last stage
    checkpoint. From attempt 3 on, the k-mer count chunk shape rotates
    (SFB_COUNT_CHUNK_LOG2) — a dropped remote compile is keyed by shape,
    and resubmitting a stubbornly-dropped shape can hit the same fate;
    a fresh shape is a fresh request. Shapes already compiled are served
    from the persistent disk cache either way (utils/jaxcache.py).
    """
    def build_cmd(attempt: int) -> list[str]:
        args = list(argv)
        if attempt > 1:
            if "--restart-from" in args:
                i = args.index("--restart-from")
                del args[i:i + 2]
            if "--continue" not in args:
                args.append("--continue")
        return [sys.executable, "-m", "spades_for_blackbird_tpu.cli",
                *args]

    def env_for_attempt(attempt: int) -> dict:
        env: dict = {}
        if attempt >= 3 and "SFB_COUNT_CHUNK_LOG2" not in os.environ:
            # rotate 19, 18, 20, 19, 18, ...
            env["SFB_COUNT_CHUNK_LOG2"] = [19, 18, 20][(attempt - 3) % 3]
        if attempt >= 2 and "SFB_CAP_BUMP" not in os.environ:
            # graph-capacity bucket bump: a stage-graph (simplify /
            # condense) compile whose request the service dropped gets
            # re-requested under a different shape
            env["SFB_CAP_BUMP"] = [1, 2, 0, 3][(attempt - 2) % 4]
        return env

    return run_supervised(build_cmd, max_attempts=max_attempts,
                          stall_s=stall_s, poll_s=poll_s,
                          cooldown_s=cooldown_s,
                          env_for_attempt=env_for_attempt, log=log)
