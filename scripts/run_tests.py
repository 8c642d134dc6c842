"""Run the test suite, riding out the known XLA:CPU SIGSEGV flake.

On this image jaxlib's XLA:CPU was AOT-compiled for a different CPU
(cpu_aot_loader machine-feature warnings at import), and long pytest
processes can flakily SIGSEGV inside ``backend_compile_and_load``; every
crashed test passes on rerun (see CLAUDE.md). This wrapper runs pytest,
detects a signal death, finds the test file that was executing from the
log tail, and resumes from that file in a fresh process — bounded retries,
aggregated summary.

    python scripts/run_tests.py            # full suite
    python scripts/run_tests.py -m "not slow"   # extra pytest args pass through
    python scripts/run_tests.py tests/test_ops.py tests/test_train.py
"""

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
MAX_RESUMES = 5


def test_files():
    return sorted(p.relative_to(REPO).as_posix()
                  for p in (REPO / "tests").glob("test_*.py"))


def last_test_file(output: str, files):
    """The last test file mentioned in pytest/faulthandler output."""
    hits = re.findall(r"tests/test_\w+\.py", output)
    for name in reversed(hits):
        if name in files:
            return name
    return None


def run(files, extra):
    cmd = [sys.executable, "-m", "pytest", "-q", *extra, *files]
    proc = subprocess.Popen(
        cmd, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    out_lines = []
    for line in proc.stdout:
        sys.stdout.write(line)
        sys.stdout.flush()
        out_lines.append(line)
    proc.wait()
    return proc.returncode, "".join(out_lines)


def main():
    argv = sys.argv[1:]
    picked = [a for a in argv if (REPO / a).exists()]
    extra = [a for a in argv if a not in picked]
    files = [Path(p).as_posix() for p in picked] or test_files()
    remaining = list(files)
    resumes = 0
    while remaining:
        rc, out = run(remaining, extra)
        if rc >= 0 and rc != 139:  # normal pytest exit (incl. failures)
            return rc
        # killed by a signal (rc<0 from Popen, or 139 via a shell layer):
        # resume from the file that was executing (it passes on rerun)
        resumes += 1
        if resumes > MAX_RESUMES:
            print(f"[run_tests] giving up after {MAX_RESUMES} resumes",
                  file=sys.stderr)
            return 139
        crashed = last_test_file(out, remaining)
        idx = remaining.index(crashed) if crashed in remaining else 0
        print(
            f"\n[run_tests] pytest died with rc={rc} (known XLA:CPU "
            f"SIGSEGV flake, see CLAUDE.md) during {crashed or 'unknown'}; "
            f"resuming from it in a fresh process "
            f"({resumes}/{MAX_RESUMES})",
            file=sys.stderr,
        )
        remaining = remaining[idx:]
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
