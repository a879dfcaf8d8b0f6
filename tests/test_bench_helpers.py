"""bench.py artifact-pipeline helpers (r4): the r3 round artifact was
lost to a >2000-char JSON line with embedded ANSI bytes; these helpers
are what keeps that from recurring."""
import json
import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def test_err_s_strips_control_and_truncates():
    raw = ("INTERNAL: http://x/remote_compile: HTTP 500\n"
           "\x1b[2m2026-08-20T20:48:41Z\x1b[0m \x1b[33mWARN\x1b[0m "
           "compile-helper: landlock — env" + "x" * 500)
    s = bench.err_s(Exception(raw))
    assert len(s) <= 120
    assert "\n" not in s and "\x1b" not in s
    assert all(32 <= ord(ch) < 127 for ch in s)
    assert s.startswith("INTERNAL: http://x/remote_compile")
    # the sanitized string embeds cleanly in a one-line JSON artifact
    line = json.dumps({"e": s})
    assert "\n" not in line
    assert json.loads(line)["e"] == s


def test_with_retry_retries_transient_only():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("HTTP 500: tpu_compile_helper exit 1")
        return "ok"

    assert bench.with_retry(flaky, attempts=2, sleep_s=0.0) == "ok"
    assert len(calls) == 2

    def hard():
        calls.append(1)
        raise ValueError("shape mismatch (17,) vs (6,)")

    calls.clear()
    with pytest.raises(ValueError):
        bench.with_retry(hard, attempts=3, sleep_s=0.0)
    assert len(calls) == 1  # non-transient: no retry

    def dim500():
        # ADVICE r4: a literal "500" inside a deterministic shape error
        # must NOT look transient now that the pattern anchors "http 500"
        calls.append(1)
        raise ValueError("cannot reshape array of dimension 500 into (17,)")

    calls.clear()
    with pytest.raises(ValueError):
        bench.with_retry(dim500, attempts=3, sleep_s=0.0)
    assert len(calls) == 1

    def always_500():
        calls.append(1)
        raise RuntimeError("connection reset by peer")

    calls.clear()
    with pytest.raises(RuntimeError):
        bench.with_retry(always_500, attempts=3, sleep_s=0.0)
    assert len(calls) == 3  # transient: exhausts the budget
