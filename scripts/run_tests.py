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


_PROGRESS_LINE = re.compile(r"^[.FEsxX]+(\s+\[\s*\d+%\])?$")


def crashed_segment_had_failures(output: str) -> bool:
    """True if -q progress lines in a crashed (hence unreported) pytest
    segment contain failure/error markers — those results would otherwise
    be silently lost by resuming past them."""
    return any(
        ("F" in line or "E" in line)
        for line in output.splitlines()
        if _PROGRESS_LINE.match(line.strip())
    )


def main():
    argv = sys.argv[1:]
    picked = [a for a in argv if (REPO / a).exists()]
    extra = [a for a in argv if a not in picked]
    files = [Path(p).as_posix() for p in picked] or test_files()
    remaining = list(files)
    resumes = 0
    lost_failures = False
    while remaining:
        rc, out = run(remaining, extra)
        if rc not in (-11, 139):  # not the XLA:CPU SIGSEGV flake:
            # normal pytest exits (incl. test failures) AND other signal
            # deaths (SIGKILL/OOM, SIGTERM, SIGINT) pass through — only
            # the documented segfault flake is worth auto-resuming.
            if rc < 0:
                print(f"[run_tests] pytest killed by signal {-rc}; not "
                      "the SIGSEGV flake — failing fast", file=sys.stderr)
                return 128 - rc
            return rc if not (rc == 0 and lost_failures) else 1
        resumes += 1
        if resumes > MAX_RESUMES:
            print(f"[run_tests] giving up after {MAX_RESUMES} resumes",
                  file=sys.stderr)
            return 139
        if crashed_segment_had_failures(out):
            # the crash threw away this segment's end-of-session failure
            # report; keep going for coverage but do NOT exit 0
            lost_failures = True
        crashed = last_test_file(out, remaining)
        if crashed in remaining:
            idx = remaining.index(crashed)
            where = f"during {crashed}; resuming from it"
        else:
            # The crash point could not be identified from the output; the
            # whole remaining segment reruns (already-passed files included)
            # — say so instead of silently restarting, and let MAX_RESUMES
            # bound the worst case (~45-60 min per full pass on this host).
            idx = 0
            where = (f"at an unidentified point; RERUNNING the whole "
                     f"remaining segment of {len(remaining)} files")
        print(
            f"\n[run_tests] pytest died with rc={rc} (known XLA:CPU "
            f"SIGSEGV flake, see CLAUDE.md) {where} in a fresh process "
            f"({resumes}/{MAX_RESUMES})",
            file=sys.stderr,
        )
        remaining = remaining[idx:]
    if lost_failures:
        print(
            "[run_tests] a crashed segment contained failure markers whose "
            "report was lost — rerun those files; exiting nonzero",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
