"""Shared subprocess helpers for tests that need their own jax runtime
(single-device workers, CLI smoke tests). One definition so env setup,
timeouts, and failure reporting stay consistent across test files."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(platform_pin: bool = False):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    if platform_pin:
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    return env


def run_worker(script: str, *argv: str, timeout: int = 1200) -> dict:
    """Run an inline `python -c` worker; parse 'key v1 v2...' stdout
    lines into {key: [v1, v2, ...]}."""
    out = subprocess.run(
        [sys.executable, "-c", script, *argv],
        capture_output=True, text=True, env=_env(), timeout=timeout,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    return {line.split()[0]: line.split()[1:]
            for line in out.stdout.strip().splitlines() if " " in line}


def run_cli(script: str, args, cwd: str, timeout: int = 1200):
    """Run a repo-root CLI script as a real subprocess on one CPU
    device; returns the CompletedProcess (asserted exit 0)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True, text=True, env=_env(platform_pin=True),
        timeout=timeout, cwd=cwd,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-4000:])
    return out
