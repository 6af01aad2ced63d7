"""Durable-artifact retention sweep (VERDICT r14 ask #2).

``materialize`` is write-once and never deletes; ``tools/prune_artifacts``
is the retention half. Three layers here: the pure policy (no Spark),
the end-to-end contract — three REAL committed generations of one family,
prune, the survivor still SERVES through ``read_artifact`` while pruned
keys read as absent — and the HadoopFS backend driven over ``file:``
paths (the py4j surface hdfs/s3a would use).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
for p in (str(REPO), str(REPO / "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

from prune_artifacts import (  # noqa: E402
    HadoopFS,
    LocalFS,
    main,
    plan_retention,
    plan_size_budget,
    prune_artifacts,
    scan_artifacts,
)

NOW = 1_700_000_000.0


def _mk_artifact(base: Path, name: str, committed: bool, mtime: float) -> Path:
    d = base / name
    d.mkdir(parents=True)
    (d / "part-00000.parquet").write_bytes(b"x")
    if committed:
        (d / "_SUCCESS").touch()
        (d / "_POLARIFY_COMMIT").touch()
    # age every file: grace decisions key on the newest FILE mtime under
    # the dir (never the dir's own mtime — frozen/synthetic, review r15)
    for f in d.rglob("*"):
        os.utime(f, (mtime, mtime))
    os.utime(d, (mtime, mtime))
    return d


def test_plan_retention_keeps_newest_per_family_and_applies_ttl():
    committed = [
        ("fam_a", "/x/fam_a-" + "1" * 16, NOW - 300),
        ("fam_a", "/x/fam_a-" + "2" * 16, NOW - 200),
        ("fam_a", "/x/fam_a-" + "3" * 16, NOW - 100),
        ("fam_b", "/x/fam_b-" + "4" * 16, NOW - 50),
    ]
    kept, deleted = plan_retention(committed, keep=2, ttl_seconds=None, now=NOW)
    assert kept == sorted(
        ["/x/fam_a-" + "2" * 16, "/x/fam_a-" + "3" * 16, "/x/fam_b-" + "4" * 16]
    )
    assert deleted == ["/x/fam_a-" + "1" * 16]
    # TTL drops even a family's newest once it expires
    kept, deleted = plan_retention(committed, keep=2, ttl_seconds=75, now=NOW)
    assert kept == ["/x/fam_b-" + "4" * 16]
    assert len(deleted) == 3
    # keep=0 + no TTL empties every family
    kept, deleted = plan_retention(committed, keep=0, ttl_seconds=None, now=NOW)
    assert kept == [] and len(deleted) == 4
    with pytest.raises(ValueError):
        plan_retention(committed, keep=-1, ttl_seconds=None, now=NOW)


def test_scan_classifies_committed_uncommitted_tmp_and_foreign(tmp_path):
    _mk_artifact(tmp_path, "sigs-" + "a" * 16, True, NOW - 10)
    _mk_artifact(tmp_path, "sigs-" + "b" * 16, False, NOW - 10)  # no marker
    # marker without _SUCCESS is NOT committed (the resurrect-shell case)
    shell = _mk_artifact(tmp_path, "sigs-" + "c" * 16, False, NOW - 10)
    (shell / "_POLARIFY_COMMIT").touch()
    _mk_artifact(tmp_path, "sigs-" + "d" * 16 + ".tmp-" + "e" * 32, False, NOW)
    (tmp_path / "unrelated_dir").mkdir()
    state = scan_artifacts(str(tmp_path))
    assert [f for f, _, _ in state["committed"]] == ["sigs"]
    assert {p.rsplit("/", 1)[-1] for p, _ in state["uncommitted"]} == {
        "sigs-" + "b" * 16,
        "sigs-" + "c" * 16,
    }
    assert len(state["tmp"]) == 1
    assert state["foreign"] == [str(tmp_path / "unrelated_dir")]


def test_prune_respects_grace_dry_run_and_foreign(tmp_path):
    keep_me = _mk_artifact(tmp_path, "fam-" + "1" * 16, True, NOW - 100)
    drop_me = _mk_artifact(tmp_path, "fam-" + "2" * 16, True, NOW - 200)
    old_unc = _mk_artifact(tmp_path, "fam-" + "3" * 16, False, NOW - 7200)
    new_unc = _mk_artifact(tmp_path, "fam-" + "4" * 16, False, NOW - 60)
    old_tmp = _mk_artifact(
        tmp_path, "fam-" + "5" * 16 + ".tmp-" + "f" * 32, False, NOW - 7200
    )
    foreign = tmp_path / "not_an_artifact"
    foreign.mkdir()
    # dry run deletes nothing but reports everything
    report = prune_artifacts(str(tmp_path), keep=1, dry_run=True, now=NOW)
    assert report["deleted"] == [str(drop_me)]
    assert report["reaped_uncommitted"] == [str(old_unc)]
    assert report["reaped_tmp"] == [str(old_tmp)]
    assert str(new_unc) in report["skipped_in_grace"]
    assert report["skipped_foreign"] == [str(foreign)]
    assert all(p.exists() for p in (keep_me, drop_me, old_unc, new_unc, old_tmp))
    # real run: the plan executes, grace + foreign survive
    report = prune_artifacts(str(tmp_path), keep=1, dry_run=False, now=NOW)
    assert not drop_me.exists() and not old_unc.exists() and not old_tmp.exists()
    assert keep_me.exists() and new_unc.exists() and foreign.exists()
    assert report["kept"] == [str(keep_me)]


def test_grace_keys_on_newest_file_not_dir_mtime(tmp_path):
    """Review r15: a parquet job streaming task files keeps the dir's
    own mtime frozen at job start — a writer running longer than the
    grace window must still be protected, via the newest nested FILE."""
    live = _mk_artifact(tmp_path, "fam-" + "1" * 16, False, NOW - 86400)
    task = live / "_temporary" / "0" / "task_0"
    task.mkdir(parents=True)
    fresh = task / "part-00000-attempt.parquet"
    fresh.write_bytes(b"y")
    os.utime(fresh, (NOW - 30, NOW - 30))
    os.utime(live, (NOW - 86400, NOW - 86400))  # dir itself looks ancient
    report = prune_artifacts(str(tmp_path), keep=1, now=NOW)
    assert report["reaped_uncommitted"] == []
    assert str(live) in report["skipped_in_grace"]
    assert live.exists()
    # an EMPTY dir (no files at all) has unknown age: never reaped
    shell = tmp_path / ("fam-" + "2" * 16)
    shell.mkdir()
    os.utime(shell, (NOW - 86400, NOW - 86400))
    report = prune_artifacts(str(tmp_path), keep=1, now=NOW)
    assert shell.exists() and str(shell) in report["skipped_in_grace"]


def test_delete_failure_is_per_path_and_reported(tmp_path):
    """Review r15: one failing delete must not abort the sweep or lose
    the report — the path moves to ``failed``, the rest are deleted."""
    a = _mk_artifact(tmp_path, "fam-" + "1" * 16, True, NOW - 300)
    b = _mk_artifact(tmp_path, "fam-" + "2" * 16, True, NOW - 200)
    _mk_artifact(tmp_path, "fam-" + "3" * 16, True, NOW - 100)

    class FlakyFS(LocalFS):
        def delete(self, path):
            if path == str(a):
                raise PermissionError(path)
            super().delete(path)

    report = prune_artifacts(str(tmp_path), keep=1, fs=FlakyFS(), now=NOW)
    assert report["failed"] == [str(a)]
    assert report["deleted"] == [str(b)]
    assert a.exists() and not b.exists()
    # a failed COMMITTED delete (marker intact, still servable) also
    # reads as still-live in `kept` — capacity reconciliation from the
    # report must see it (review r16)
    assert str(a) in report["kept"]
    # a target that VANISHES mid-sweep (racing sweep already removed it)
    # is success, not failure
    class VanishFS(LocalFS):
        def delete(self, path):
            import shutil
            shutil.rmtree(path)
            raise FileNotFoundError(path)  # as a racing rmtree would

    c = _mk_artifact(tmp_path, "fam-" + "4" * 16, True, NOW - 400)
    report = prune_artifacts(str(tmp_path), keep=2, fs=VanishFS(), now=NOW)
    assert report["failed"] == [] and str(c) in report["deleted"]


def test_marker_name_comes_from_the_memo_protocol():
    """Review r15: the sweep's committed-ness test must share _memo's
    constant — a protocol rename that left a stale literal here would
    classify every committed artifact as reapable."""
    import prune_artifacts as pa
    from polarify_spark.operators._memo import COMMIT_MARKER

    assert pa._COMMIT_MARKER is COMMIT_MARKER


def test_cli_prints_one_json_report_line(tmp_path, capsys):
    _mk_artifact(tmp_path, "fam-" + "1" * 16, True, NOW)
    rc = main(["--dir", str(tmp_path), "--keep", "1", "--dry-run"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    report = json.loads(out[-1])
    assert report["dry_run"] is True and len(report["kept"]) == 1


def test_three_generations_prune_survivor_still_serves(spark, tmp_path):
    """VERDICT r14 ask #2's acceptance shape: publish three real durable
    generations of one family through ``materialize``, prune to the
    newest, and prove the survivor still serves via ``read_artifact``
    (committed, marker-gated) while the pruned keys read as absent."""
    from pyspark.sql import functions as F

    from polarify_spark.operators._memo import (
        ARTIFACTS_DIR_CONF,
        artifact_key,
        materialize,
        read_artifact,
    )

    base = tmp_path / "artifacts"
    spark.conf.set(ARTIFACTS_DIR_CONF, str(base))
    try:
        gens = [
            spark.range(10).select(
                F.col("id"), (F.col("id") * F.lit(i + 1)).alias("v")
            )
            for i in range(3)
        ]
        frames = [materialize(df, "prunefam", key_df=df) for df in gens]
        assert [f.count() for f in frames] == [10, 10, 10]
        keys = [artifact_key(df) for df in gens]
        assert len(set(keys)) == 3  # three distinct generations
        # stamp commit order: gen 2 newest
        t0 = time.time() - 1000
        for i, k in enumerate(keys):
            marker = base / f"prunefam-{k}" / "_POLARIFY_COMMIT"
            assert marker.exists()
            os.utime(marker, (t0 + i * 10, t0 + i * 10))
        report = prune_artifacts(str(base), keep=1)
        assert report["kept"] == [str(base / f"prunefam-{keys[2]}")]
        assert sorted(report["deleted"]) == sorted(
            str(base / f"prunefam-{k}") for k in keys[:2]
        )
        # survivor serves: committed read-back with the right rows
        served = read_artifact(gens[2], "prunefam")
        assert served is not None
        rows = {(r["id"], r["v"]) for r in served.collect()}
        assert rows == {(i, i * 3) for i in range(10)}
        # pruned keys are genuinely absent, not half-deleted
        assert read_artifact(gens[0], "prunefam") is None
        assert read_artifact(gens[1], "prunefam") is None
    finally:
        spark.conf.unset(ARTIFACTS_DIR_CONF)


def test_sweep_never_reaps_a_live_spark_write(spark, tmp_path):
    """The grace window's REAL-write validation (review r15 follow-up):
    the fabricated-dir tests assume a running parquet job keeps some
    file under the target fresh — prove it against an actual in-flight
    ``df.write.parquet`` racing repeated sweeps. A slow Arrow stage
    (per-batch sleep) holds the write open while the sweep runs with a
    grace far smaller than the job's runtime; the uncommitted dir must
    survive every pass and the write must complete normally."""
    import threading
    import time as _time

    from pyspark.sql import functions as F

    base = tmp_path / "artifacts"
    base.mkdir()
    target = base / ("livefam-" + "a" * 16)

    def slow(it):
        for batch in it:
            _time.sleep(0.8)
            yield batch

    # 12 single-row tasks on local[4] = 3 waves x ~0.8 s: the job (and
    # the uncommitted dir) outlives the 3 s grace below, so a regression
    # back to dir-mtime aging WOULD reap it mid-write — only the
    # newest-FILE age (refreshed every wave, and `inf` before the first
    # task file lands) keeps it in grace the whole time.
    df = (
        spark.range(12)
        .repartition(12)
        .mapInPandas(slow, schema="id long")
        .withColumn("v", F.col("id") * 2)
    )
    err: "list[BaseException]" = []

    def write():
        try:
            df.write.mode("overwrite").parquet(str(target))
        except BaseException as exc:  # surfaced in the main thread
            err.append(exc)

    t = threading.Thread(target=write)
    t.start()
    try:
        reaped = []
        deadline = _time.time() + 60
        while t.is_alive() and _time.time() < deadline:
            report = prune_artifacts(str(base), keep=1, grace_seconds=3.0)
            reaped += report["reaped_uncommitted"] + report["failed"]
            _time.sleep(0.2)
    finally:
        t.join(timeout=120)
    assert not err, err
    assert reaped == [], reaped
    # the finished (still uncommitted — no marker) dir reads back intact
    assert spark.read.parquet(str(target)).count() == 12


def test_hadoop_fs_backend_matches_local_policy(spark, tmp_path):
    """The HadoopFS seam (the hdfs/s3a deployment arm) over ``file:``
    paths produces the same scan + prune outcome as LocalFS."""
    _mk_artifact(tmp_path, "fam-" + "1" * 16, True, NOW - 100)
    _mk_artifact(tmp_path, "fam-" + "2" * 16, True, NOW - 200)
    _mk_artifact(tmp_path, "fam-" + "3" * 16, False, NOW - 7200)
    fs = HadoopFS(spark, str(tmp_path))
    state = scan_artifacts(str(tmp_path), fs=fs)
    assert len(state["committed"]) == 2 and len(state["uncommitted"]) == 1
    # mtimes agree with the local view to the second
    local = {
        p.rsplit("/", 1)[-1]: m
        for _, p, m in scan_artifacts(str(tmp_path), fs=LocalFS())["committed"]
    }
    for _, p, m in state["committed"]:
        assert abs(m - local[p.rsplit("/", 1)[-1]]) < 2.0
    report = prune_artifacts(str(tmp_path), keep=1, fs=fs, now=NOW)
    assert len(report["deleted"]) == 1 and len(report["reaped_uncommitted"]) == 1
    assert not (tmp_path / ("fam-" + "2" * 16)).exists()
    assert (tmp_path / ("fam-" + "1" * 16)).exists()


def _sized_artifact(
    base: Path, name: str, committed: bool, mtime: float, nbytes: int
) -> Path:
    d = _mk_artifact(base, name, committed, mtime)
    (d / "part-00000.parquet").write_bytes(b"x" * nbytes)
    for f in d.rglob("*"):
        os.utime(f, (mtime, mtime))
    os.utime(d, (mtime, mtime))
    return d


def test_plan_size_budget_policy_is_pure_and_per_family():
    """VERDICT r15 ask #4: per-family byte budget over the keep/TTL
    survivors — newest-first cumulative, oldest evicted beyond the cap,
    families independent, hard cap even on a family's newest."""
    committed = [
        ("fam", "/x/fam-" + "1" * 16, NOW - 300),
        ("fam", "/x/fam-" + "2" * 16, NOW - 200),
        ("fam", "/x/fam-" + "3" * 16, NOW - 100),
        ("solo", "/x/solo-" + "4" * 16, NOW - 50),
    ]
    kept_in = sorted(p for _, p, _ in committed)
    sizes = {p: 100 for _, p, _ in committed}
    sizes["/x/solo-" + "4" * 16] = 500
    kept, evicted = plan_size_budget(committed, kept_in, 250, sizes)
    # fam: newest two fit (200 <= 250), oldest evicted; solo: its ONLY
    # generation alone exceeds the cap -> evicted (hard cap, documented)
    assert kept == sorted(["/x/fam-" + "2" * 16, "/x/fam-" + "3" * 16])
    assert evicted == sorted(["/x/fam-" + "1" * 16, "/x/solo-" + "4" * 16])
    # entries already outside `kept` (rank/TTL deletions) are ignored
    kept, evicted = plan_size_budget(committed, kept_in[:1], 10**9, sizes)
    assert kept == kept_in[:1] and evicted == []
    # zero budget empties every family; negative rejects
    kept, evicted = plan_size_budget(committed, kept_in, 0, sizes)
    assert kept == [] and len(evicted) == 4
    with pytest.raises(ValueError):
        plan_size_budget(committed, kept_in, -1, sizes)


def test_plan_size_budget_contiguous_prefix_not_knapsack():
    """ADVICE r16 #1: evicted entries' bytes still count toward the
    running family total — once any generation busts the budget, every
    older one goes. Sizes newest-first [10, 1000, 10] under budget 100
    keep ONLY the newest, even though the oldest would fit on its own."""
    committed = [
        ("fam", "/x/fam-" + "1" * 16, NOW - 300),  # oldest, 10 bytes
        ("fam", "/x/fam-" + "2" * 16, NOW - 200),  # middle, 1000 bytes
        ("fam", "/x/fam-" + "3" * 16, NOW - 100),  # newest, 10 bytes
    ]
    kept_in = sorted(p for _, p, _ in committed)
    sizes = {
        "/x/fam-" + "1" * 16: 10,
        "/x/fam-" + "2" * 16: 1000,
        "/x/fam-" + "3" * 16: 10,
    }
    kept, evicted = plan_size_budget(committed, kept_in, 100, sizes)
    assert kept == ["/x/fam-" + "3" * 16]
    assert evicted == sorted(["/x/fam-" + "1" * 16, "/x/fam-" + "2" * 16])


def test_max_bytes_failed_eviction_reports_kept_over_budget(tmp_path):
    """ADVICE r16 #2: a committed artifact whose byte-budget eviction
    FAILS but which stays fully servable lands in both `failed` and
    `kept` — so the per-family kept bytes may exceed `max_bytes` until
    a retry sweep converges. `kept` is ground truth, not the plan."""
    g_old = _sized_artifact(tmp_path, "fam-" + "1" * 16, True, NOW - 300, 100)
    g_new = _sized_artifact(tmp_path, "fam-" + "2" * 16, True, NOW - 200, 100)

    class StickyFS(LocalFS):
        def delete(self, path):
            if path == str(g_old):
                raise PermissionError(path)  # before anything is removed
            super().delete(path)

    report = prune_artifacts(
        str(tmp_path), keep=10, fs=StickyFS(), now=NOW, max_bytes=150
    )
    assert report["failed"] == [str(g_old)]
    assert str(g_old) in report["kept"] and str(g_new) in report["kept"]
    assert g_old.exists() and g_new.exists()
    # the documented over-budget window: both 100-byte generations
    # survive under a 150-byte family budget
    kept_bytes = sum(
        f.stat().st_size
        for p in report["kept"]
        for f in Path(p).rglob("*")
        if f.is_file()
    )
    assert kept_bytes > report["max_bytes"]


def test_prune_max_bytes_end_to_end(tmp_path):
    g1 = _sized_artifact(tmp_path, "fam-" + "1" * 16, True, NOW - 300, 100)
    g2 = _sized_artifact(tmp_path, "fam-" + "2" * 16, True, NOW - 200, 100)
    g3 = _sized_artifact(tmp_path, "fam-" + "3" * 16, True, NOW - 100, 100)
    solo = _sized_artifact(tmp_path, "solo-" + "4" * 16, True, NOW - 50, 500)
    # dry run: plan only, nothing deleted
    report = prune_artifacts(
        str(tmp_path), keep=10, dry_run=True, now=NOW, max_bytes=250
    )
    assert report["max_bytes"] == 250
    assert report["evicted_over_budget"] == sorted([str(g1), str(solo)])
    assert report["deleted"] == sorted([str(g1), str(solo)])
    assert all(p.exists() for p in (g1, g2, g3, solo))
    # real run: evictions execute, survivors intact
    report = prune_artifacts(
        str(tmp_path), keep=10, dry_run=False, now=NOW, max_bytes=250
    )
    assert not g1.exists() and not solo.exists()
    assert g2.exists() and g3.exists()
    assert report["kept"] == sorted([str(g2), str(g3)])
    # without a budget the report says so and measures nothing
    report = prune_artifacts(str(tmp_path), keep=10, now=NOW)
    assert report["max_bytes"] is None
    assert report["evicted_over_budget"] == []
    # an invalid budget fails FAST — before any scan or size probe
    class NoTouchFS(LocalFS):
        def list_dirs(self, base):
            raise AssertionError("scanned before validating max_bytes")

    with pytest.raises(ValueError):
        prune_artifacts(str(tmp_path), keep=10, now=NOW, max_bytes=-1,
                        fs=NoTouchFS())


def test_cli_max_bytes_flag(tmp_path, capsys):
    _sized_artifact(tmp_path, "fam-" + "1" * 16, True, NOW - 200, 100)
    _sized_artifact(tmp_path, "fam-" + "2" * 16, True, NOW - 100, 100)
    rc = main(
        ["--dir", str(tmp_path), "--keep", "5", "--max-bytes", "150",
         "--dry-run"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["max_bytes"] == 150
    assert len(report["evicted_over_budget"]) == 1
    assert report["evicted_over_budget"][0].endswith("fam-" + "1" * 16)


def test_local_delete_unlinks_marker_before_rmtree(tmp_path, monkeypatch):
    """Advice r15: a partial rmtree must not leave a servable
    marker+_SUCCESS pair over missing part files — the marker goes
    first (single unlink, closes the reader gate atomically)."""
    import prune_artifacts as pa

    art = _mk_artifact(tmp_path, "fam-" + "1" * 16, True, NOW - 100)

    def boom(path):
        raise PermissionError(path)

    monkeypatch.setattr(pa.shutil, "rmtree", boom)
    with pytest.raises(PermissionError):
        LocalFS().delete(str(art))
    assert not (art / "_POLARIFY_COMMIT").exists()  # gate closed first
    assert (art / "_SUCCESS").exists() and art.exists()
    # the half-deleted dir now scans as UNCOMMITTED, never served
    state = scan_artifacts(str(tmp_path))
    assert state["committed"] == []
    assert [p for p, _ in state["uncommitted"]] == [str(art)]


def test_exists_probe_failure_reads_as_failed_not_abort(tmp_path):
    """Advice r15: fs.exists inside the per-path handler can itself
    throw (transient FS/py4j error) — indeterminate is conservative
    'failed', and the sweep still completes over the other paths."""
    a = _mk_artifact(tmp_path, "fam-" + "1" * 16, True, NOW - 300)
    b = _mk_artifact(tmp_path, "fam-" + "2" * 16, True, NOW - 200)
    _mk_artifact(tmp_path, "fam-" + "3" * 16, True, NOW - 100)

    class DoubleFaultFS(LocalFS):
        def delete(self, path):
            if path == str(a):
                raise PermissionError(path)
            super().delete(path)

        def exists(self, path):
            if path == str(a):
                raise RuntimeError("transient backend fault")
            return super().exists(path)

    report = prune_artifacts(str(tmp_path), keep=1, fs=DoubleFaultFS(), now=NOW)
    assert report["failed"] == [str(a)]
    assert report["deleted"] == [str(b)]
    assert a.exists() and not b.exists()
    assert str(a) in report["kept"]  # marker intact -> still live


def test_hadoop_delete_surfaces_false_return(spark, tmp_path):
    """Advice r15: several Hadoop filesystems signal delete failure by
    returning FALSE without throwing — that must land in `failed`, not
    be silently counted as deleted."""
    _mk_artifact(tmp_path, "fam-" + "1" * 16, True, NOW - 300)
    keep = _mk_artifact(tmp_path, "fam-" + "2" * 16, True, NOW - 100)
    fs = HadoopFS(spark, str(tmp_path))

    class FalseDeleteJFS:
        def __init__(self, real):
            self._real = real

        def delete(self, path, recursive):
            return False  # the no-throw failure mode

        def __getattr__(self, name):
            return getattr(self._real, name)

    fs._fs = FalseDeleteJFS(fs._fs)
    with pytest.raises(IOError):
        fs.delete(str(tmp_path / ("fam-" + "1" * 16)))
    # paths come back as file: URIs from the Hadoop listing
    report = prune_artifacts(str(tmp_path), keep=1, fs=fs, now=NOW)
    assert [p.rsplit("/", 1)[-1] for p in report["failed"]] == [
        "fam-" + "1" * 16
    ]
    assert report["deleted"] == []
    assert (tmp_path / ("fam-" + "1" * 16)).exists() and keep.exists()
    # nothing was removed (false BEFORE the marker went), so the failed
    # artifact is still committed+servable and reads as live in kept
    assert sorted(p.rsplit("/", 1)[-1] for p in report["kept"]) == [
        "fam-" + "1" * 16,
        "fam-" + "2" * 16,
    ]


def test_hadoop_size_matches_local(spark, tmp_path):
    d = _mk_artifact(tmp_path, "fam-" + "9" * 16, True, NOW)
    (d / "part-00000.parquet").write_bytes(b"x" * 1234)
    fs = HadoopFS(spark, str(tmp_path))
    assert fs.size(str(d)) == LocalFS().size(str(d)) == 1234


def test_connect_like_session_gets_friendly_not_provider_error(tmp_path):
    """Advice r15: pyspark Connect's sparkContext property raises
    PySparkNotImplementedError (not AttributeError), which hasattr
    propagates — the probe must still land on the friendly redirect."""

    class FakeConnectSession:
        @property
        def sparkContext(self):
            raise RuntimeError(
                "[NOT_IMPLEMENTED] sparkContext is not implemented."
            )

    with pytest.raises(NotImplementedError, match="locally mounted"):
        HadoopFS(FakeConnectSession(), str(tmp_path))


def test_plan_size_budget_properties():
    """Property pins for the budget policy (hypothesis): the output
    partitions the input survivors; per family the kept set is the
    longest newest-commit-first prefix whose byte total fits (so kept
    bytes never exceed the budget and eviction is a monotone oldest
    suffix); and a larger budget never keeps less."""
    from hypothesis import given, settings, strategies as st

    fams = st.sampled_from(["a", "b", "c"])
    entry = st.tuples(
        fams,
        st.integers(0, 9999),  # path discriminator
        st.floats(0, 1e6, allow_nan=False),  # mtime
        st.integers(0, 1000),  # size
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(entry, max_size=24, unique_by=lambda e: e[1]),
           st.integers(0, 3000))
    def check(entries, budget):
        committed = [
            (f, f"/x/{f}-{i:016d}", m) for f, i, m, _ in entries
        ]
        sizes = {f"/x/{f}-{i:016d}": s for f, i, _, s in entries}
        kept_in = sorted(sizes)
        kept, evicted = plan_size_budget(committed, kept_in, budget, sizes)
        # partition of the input, no invention, no loss
        assert sorted(kept + evicted) == kept_in
        by_fam = {}
        for f, p, m in committed:
            by_fam.setdefault(f, []).append((m, p))
        for f, fam_entries in by_fam.items():
            fam_entries.sort(key=lambda e: (-e[0], e[1]))
            fam_kept = [p for _, p in fam_entries if p in set(kept)]
            # kept is exactly the maximal fitting newest-first prefix
            total, prefix = 0, []
            for _, p in fam_entries:
                total += sizes[p]
                if total > budget:
                    break
                prefix.append(p)
            assert fam_kept == prefix
            assert sum(sizes[p] for p in fam_kept) <= budget
        # monotone in the budget
        kept2, _ = plan_size_budget(committed, kept_in, budget + 500, sizes)
        assert set(kept) <= set(kept2)

    check()
