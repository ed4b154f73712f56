"""`vila-run` job launcher with retry semantics.

Capability parity: llava/cli/run.py:30-135 — run a command under a job
wrapper, retry failures up to `--max-retries` (default 3), retry timeouts
(exit code 124) indefinitely. SLURM srun is replaced by plain subprocess
(TPU pods schedule differently); the retry loop semantics are preserved.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

TIMEOUT_EXIT_CODE = 124


def run_with_retries(cmd, max_retries: int = 3, timeout: float = None) -> int:
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(cmd, timeout=timeout)
            code = proc.returncode
        except subprocess.TimeoutExpired:
            code = TIMEOUT_EXIT_CODE
        if code == 0:
            return 0
        if code == TIMEOUT_EXIT_CODE:
            # Timeouts retry forever (cli/run.py:117-131): the job made
            # progress and saved a checkpoint before the limit.
            print(f"[vila-run] timeout on attempt {attempt}; retrying...",
                  file=sys.stderr)
            continue
        if attempt > max_retries:
            print(f"[vila-run] failed after {max_retries} retries", file=sys.stderr)
            return code
        print(f"[vila-run] exit {code}; retry {attempt}/{max_retries}",
              file=sys.stderr)
        time.sleep(min(10 * attempt, 60))


def main():
    parser = argparse.ArgumentParser("vila-run")
    parser.add_argument("--max-retries", type=int, default=3)
    parser.add_argument("--timeout", type=float, default=None)
    parser.add_argument("cmd", nargs=argparse.REMAINDER)
    args = parser.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    sys.exit(run_with_retries(cmd, args.max_retries, args.timeout))


if __name__ == "__main__":
    main()
