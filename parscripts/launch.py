"""Dispatch per-submodule training commands (independent-jobs mode).

Replaces the external `parscript` dispatcher the reference relies on
(README.md:96). Runs each line of the command file through the shell,
optionally strided for multi-host fan-out. Prefer cell-parallel training
(see parscripts/README.md) unless you specifically need isolated jobs.
"""

import argparse
import subprocess
import sys
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("command_file", type=str)
    parser.add_argument("--stride", type=int, default=1)
    parser.add_argument("--offset", type=int, default=0)
    args = parser.parse_args()

    lines = [
        l for l in Path(args.command_file).read_text().splitlines()
        if l.strip() and not l.strip().startswith("#")
    ]
    for i in range(args.offset, len(lines), args.stride):
        print(f"[launch] job {i}/{len(lines)}: {lines[i]}", flush=True)
        result = subprocess.run(lines[i], shell=True)
        if result.returncode != 0:
            print(f"[launch] job {i} FAILED (exit {result.returncode})",
                  file=sys.stderr)
            sys.exit(result.returncode)


if __name__ == "__main__":
    main()
