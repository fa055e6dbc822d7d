#!/usr/bin/env python3
"""clang-format check for cpp/ (reference parity: format-check.py)."""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    files = [
        str(p)
        for pat in ("cpp/**/*.cpp", "cpp/**/*.hpp")
        for p in ROOT.glob(pat)
        if "build" not in p.parts
    ]
    try:
        proc = subprocess.run(
            ["clang-format", "--dry-run", "--Werror", *files],
            capture_output=True,
            text=True,
        )
    except FileNotFoundError:
        print("clang-format not installed; skipping", file=sys.stderr)
        return 0
    if proc.returncode:
        sys.stderr.write(proc.stderr)
        print("format check FAILED; run: clang-format -i " + " ".join(files))
        return 1
    print(f"format check ok ({len(files)} files)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
