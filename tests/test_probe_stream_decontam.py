"""Spark-free units of tools/probe_stream_decontam (ADVICE r17 #1/#2).

#1: the drain's parquet-sink tmp dir must be captured at its mkdtemp
call (capture_sink_dirs), not re-derived from df.inputFiles() — a
zero-row drain has no output files and leaked the mkdtemp'd
sink+checkpoint dir, and the old replace("file:", "") derivation
stripped ALL occurrences of "file:", not just the URI scheme prefix.

#2: the parent's per-child hard wall must exceed the child's own
internal worst case (2 drain stages x (1 warm + STEADY_RUNS timed)
run_to_parquet_sink calls at 120 s each, plus startup/export slack),
so a degraded-but-progressing child surfaces its own cleaner internal
TimeoutError instead of being killed mid-rep.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
for p in (str(REPO), str(REPO / "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

import probe_stream_decontam as probe  # noqa: E402


def test_capture_records_sink_prefix_dirs(tmp_path):
    made: list[str] = []
    with probe.capture_sink_dirs(made):
        d = tempfile.mkdtemp(
            prefix=probe.SINK_DIR_PREFIX, dir=str(tmp_path)
        )
    # captured even though nothing was ever written into it — the
    # zero-row-drain case the inputFiles() derivation leaked
    assert made == [d]
    assert Path(d).is_dir()


def test_capture_ignores_other_prefixes_and_restores_mkdtemp(tmp_path):
    real = tempfile.mkdtemp
    made: list[str] = []
    with probe.capture_sink_dirs(made):
        # the JSONL export dir is memoized across drains and must NOT
        # be swept per-drain
        tempfile.mkdtemp(prefix="polarify_docs_jsonl_", dir=str(tmp_path))
        tempfile.mkdtemp(dir=str(tmp_path))
    assert made == []
    assert tempfile.mkdtemp is real


def test_capture_restores_mkdtemp_on_error(tmp_path):
    real = tempfile.mkdtemp
    made: list[str] = []
    try:
        with probe.capture_sink_dirs(made):
            tempfile.mkdtemp(prefix=probe.SINK_DIR_PREFIX, dir=str(tmp_path))
            raise RuntimeError("drain blew up")
    except RuntimeError:
        pass
    # the dir is still reported to the caller for cleanup, and the
    # stdlib function is restored
    assert len(made) == 1
    assert tempfile.mkdtemp is real


def test_sink_prefix_matches_package_drain_helper():
    import inspect

    from polarify_spark.streaming.jobs import run_to_parquet_sink

    # the probe matches by prefix string; pin it to the package's
    # actual mkdtemp call so a rename can't silently disable capture
    src = inspect.getsource(run_to_parquet_sink)
    assert probe.SINK_DIR_PREFIX in src
    # the monkeypatch intercepts ATTRIBUTE access on the module — a
    # refactor to `from tempfile import mkdtemp` would bind the real
    # function before the patch and silently disable capture while the
    # prefix assertion above stayed green
    assert "tempfile.mkdtemp" in src


def test_child_timeout_exceeds_internal_worst_case():
    # 2 drain stages x (1 warm + STEADY_RUNS timed) calls, each bounded
    # by run_to_parquet_sink's internal wall — the parent must never
    # fire first on a child that is merely slow, not hung
    internal_worst = 2 * (1 + probe.STEADY_RUNS) * probe.DRAIN_TIMEOUT_S
    assert probe.CHILD_TIMEOUT_S > internal_worst
    assert probe.CHILD_TIMEOUT_S >= 1800  # floor matches probe_dedup_fill


def test_drain_timeout_matches_package_default():
    import inspect

    from polarify_spark.streaming.jobs import run_to_parquet_sink

    sig = inspect.signature(run_to_parquet_sink)
    assert sig.parameters["timeout_s"].default == probe.DRAIN_TIMEOUT_S
