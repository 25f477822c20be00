"""Whole-stage-codegen sweep: execute EVERY registry query end-to-end at
a small SF and fail on any silent interpreted fallback.

Round 10 found a janino method-size fallback in text_js_divergence that
eight rounds of green walls never surfaced — the engine logged `ERROR
CodeGenerator: Failed to compile` to stderr, ran the stage interpreted
(a 2-10x per-row tax at scale), and produced correct values. This sweep
makes that class a hard gate (VERDICT r10 next #6): run all queries,
scan THIS PROCESS's captured JVM stderr for compile failures, exit 1 on
any hit.

Usage: python tools/codegen_sweep.py [sf_dir]   (default sf0.001)
Exit 0 = every stage compiled.
"""

from __future__ import annotations

import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAIL_PAT = re.compile(
    r"Failed to compile|CodeGenerator.*(?:Error|Exception)", re.IGNORECASE
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    # The JVM writes log4j output to fd 2 directly; redirect fd 2 to a
    # file BEFORE the session starts so every codegen message is caught
    # regardless of Python-level sys.stderr swaps.
    capture = tempfile.NamedTemporaryFile(
        mode="w+", suffix=".stderr", delete=False
    )
    saved_fd = os.dup(2)
    os.dup2(capture.fileno(), 2)
    try:
        import __spark_entry__ as entrymod
        from page_rank_mapreduce_java_spark import get_spark

        spark = get_spark(app_name="codegen_sweep")
        qs = entrymod.queries()
        t0 = time.time()
        errors = []
        for i, (name, fn) in enumerate(qs.items(), 1):
            try:
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:  # noqa: BLE001 - report, keep sweeping
                errors.append((name, repr(e)))
            spark.catalog.clearCache()
        elapsed = time.time() - t0
        # Stop the JVM BEFORE restoring fd 2: log4j buffers
        # asynchronously, and 'Failed to compile' lines flushed after
        # the capture read would be silently missed (ADVICE r11).
        spark.stop()
    finally:
        os.dup2(saved_fd, 2)
        os.close(saved_fd)

    capture.seek(0)
    stderr_text = capture.read()
    capture.close()
    os.unlink(capture.name)

    hits = [
        line
        for line in stderr_text.splitlines()
        if FAIL_PAT.search(line)
    ]
    print(f"codegen sweep: {len(qs)} queries in {elapsed:.0f}s at {sf_dir}")
    for name, err in errors:
        print(f"FAIL run {name}: {err}")
    for line in hits[:20]:
        print(f"FAIL codegen: {line.strip()[:200]}")
    if errors or hits:
        return 1
    print("ok  zero codegen compile failures, zero query errors")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
