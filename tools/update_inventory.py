"""Regenerate README.md's inventory line from the registry and the pytest
collection, so the counts can never drift from reality (r6 VERDICT item 6:
the hand-maintained line said 664 tests when the suite was 668).

Usage:  python tools/update_inventory.py
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_MARK = "<!-- inventory:auto -->"


def counts() -> tuple[int, int, int]:
    from olap_db_spark import registry

    qs = registry.all_queries()
    n_queries = len(qs)
    n_oracled = sum(1 for rq in qs.values() if rq.oracle is not None)
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True,
        text=True,
        cwd=Path(__file__).resolve().parents[1],
    )
    m = re.search(r"(\d+) tests? collected", out.stdout)
    if not m:
        raise SystemExit(f"could not parse pytest collection:\n{out.stdout[-2000:]}")
    # A partially broken suite still prints a count ("N tests collected,
    # 2 errors" + non-zero exit) — publishing that short count is the
    # exact drift this tool exists to prevent. Fail loudly instead.
    if out.returncode != 0 or re.search(r"\d+ errors?\b", out.stdout):
        raise SystemExit(
            f"pytest collection unhealthy (rc={out.returncode}):\n"
            f"{out.stdout[-2000:]}"
        )
    return n_queries, n_oracled, int(m.group(1))


def main() -> None:
    readme = Path(__file__).resolve().parents[1] / "README.md"
    n_queries, n_oracled, n_tests = counts()
    oracle_clause = (
        "every one oracle-checked"
        if n_oracled == n_queries
        else f"{n_oracled} oracle-checked"
    )
    line = (
        f"Final inventory: **{n_queries} queries, {oracle_clause}; "
        f"{n_tests} tests.** {_MARK}"
    )
    text = readme.read_text()
    pattern = re.compile(r"^Final inventory:.*$", re.MULTILINE)
    if not pattern.search(text):
        raise SystemExit("README.md has no 'Final inventory:' line to update")
    readme.write_text(pattern.sub(line, text, count=1))
    print(line)


if __name__ == "__main__":
    main()
