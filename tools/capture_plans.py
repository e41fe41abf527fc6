"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py <tag> [suffix] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix default "before") for every
headline bench query (default) or the named subset.  Explain only — no jobs
run beyond the tiny metadata probes the query builders themselves issue, so
this is safe to run alongside other work and costs seconds.
"""

from __future__ import annotations

import io
import os
import subprocess
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import __spark_entry__ as entrymod
from hyperdx_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=repo_dir,
            capture_output=True, text=True, check=True).stdout.strip()
    except Exception:
        commit = "unknown"
    header = f"-- captured at commit {commit} ({suffix}), sf_dir={sf_dir}\n"
    spark = get_spark("capture-plans")
    for name in names:
        fn = getattr(entrymod, name)
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(header)
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
