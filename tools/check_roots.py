"""Gate: no hardcoded filesystem-root literals in src/main outside
graft.Roots (Core.scala). Every persisted table/index/sink path must
build from Roots.scratch / Roots.repo so a deployment repoints one
env-overridable object (SPARK_GRAFT_REPO_ROOT / SPARK_GRAFT_SCRATCH)
instead of auditing 45 call sites.

Exit 0 iff the only occurrence of "/root/repo" under src/main is the
Roots default itself.
"""
import pathlib
import re
import sys

ALLOWED = re.compile(
    r'sys\.env\.getOrElse\("SPARK_GRAFT_REPO_ROOT",\s*"/root/repo"\)')


def main() -> int:
    bad = []
    for f in sorted(pathlib.Path("src/main").rglob("*.scala")):
        for i, line in enumerate(f.read_text().splitlines(), 1):
            if "/root/repo" in line and not ALLOWED.search(line):
                bad.append(f"{f}:{i}: {line.strip()}")
    for b in bad:
        print(f"HARDCODED root literal: {b}")
    print(f"== {len(bad)} stray root literals in src/main")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
