"""Round-7 parquet_io hardening (r6 verdict "Next round" #2/#3/#5 +
r6 ADVICE items): crash-safe kv stamping with torn-tail recovery,
single-footer-parse stamping, typed-writer remote-scheme refusal and
manifest reconcile, and executor-side merge-family file sizing."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tmp_parquet_merge_spark.sources.parquet_io import (
    _dataset_bytes,
    _file_sizes,
    _reconcile_typed_output,
    attach_kv_metadata,
    compact_incremental,
    write_parquet_typed,
)


def _write_table(path, n=100):
    pq.write_table(
        pa.table({"a": list(range(n)), "b": [f"s{i}" for i in range(n)]}),
        path,
    )


# ---------------------------------------------------------------------------
# attach_kv_metadata: torn-tail recovery + recoverable append
# ---------------------------------------------------------------------------


def test_kv_stamp_heals_torn_tail(spark, tmp_path):
    """A file whose previous stamp was killed mid-append (torn trailing
    footer, unreadable) is healed by the next stamp instead of failing
    the retry — the r6 advisor's unrecoverable-file scenario."""
    d = tmp_path / "data"
    d.mkdir()
    f = str(d / "part-0.parquet")
    _write_table(f)
    clean = open(f, "rb").read()
    # torn append: a partial footer blob without the trailing magic
    with open(f, "ab") as fh:
        fh.write(b"\x15\x02\x19torn-footer-bytesPAR")
    with pytest.raises(Exception):
        pq.read_metadata(f)
    n = attach_kv_metadata(spark, str(d), {"engine": "round7"})
    assert n == 1
    md = pq.read_metadata(f)
    assert md.metadata[b"engine"] == b"round7"
    assert md.num_rows == 100
    # the healed-then-stamped file is the clean bytes + one footer
    assert open(f, "rb").read()[: len(clean)] == clean


def test_kv_stamp_heals_tail_torn_after_prior_stamp(spark, tmp_path):
    """Torn garbage after an earlier SUCCESSFUL stamp truncates back to
    the stamped footer (newest parseable candidate), not the original."""
    d = tmp_path / "data"
    d.mkdir()
    f = str(d / "part-0.parquet")
    _write_table(f)
    assert attach_kv_metadata(spark, str(d), {"k1": "v1"}) == 1
    with open(f, "ab") as fh:
        fh.write(b"garbage-no-magic-here\x00\x00")
    assert attach_kv_metadata(spark, str(d), {"k2": "v2"}) == 1
    md = pq.read_metadata(f)
    assert md.metadata[b"k1"] == b"v1"  # survived the heal
    assert md.metadata[b"k2"] == b"v2"
    assert md.num_rows == 100


def test_kv_stamp_unrecoverable_tail_raises(spark, tmp_path):
    """A file with no parseable footer anywhere in its tail fails
    loudly rather than being silently stamped or truncated to noise."""
    d = tmp_path / "data"
    d.mkdir()
    f = str(d / "part-0.parquet")
    # not a parquet file at all: no valid footer candidates
    open(f, "wb").write(b"PAR1" + b"\x00" * 64)
    with pytest.raises(Exception, match="recoverable|[Pp]arquet"):
        attach_kv_metadata(spark, str(d), {"k": "v"})


def test_kv_stamp_spark_readable_after_heal(spark, tmp_path):
    """End-to-end: heal + stamp, then Spark reads the file fine."""
    d = tmp_path / "data"
    d.mkdir()
    spark.range(50).selectExpr("id", "id * 2 as v").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d))
    files = glob.glob(str(d / "*.parquet"))
    assert files
    with open(files[0], "ab") as fh:
        fh.write(b"\xde\xad")
    attach_kv_metadata(spark, str(d), {"stamp": "yes"})
    assert spark.read.parquet(str(d)).count() == 50


# ---------------------------------------------------------------------------
# write_parquet_typed: remote guard + manifest reconcile
# ---------------------------------------------------------------------------


def test_typed_write_refuses_remote_scheme(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="local/shared-FS"):
        write_parquet_typed(df, "s3a://bucket/out")


def test_typed_write_sweeps_planted_inprogress(spark, tmp_path):
    """Foreign .part-*.inprogress temps (a CRASHED prior job's debris)
    must survive an APPEND's reconcile — an unscoped temp sweep there
    would unlink a live concurrent writer's open temp, failing its
    whole job under local mode's task.maxFailures=1.  An OVERWRITE
    declares exclusive directory ownership and sweeps them."""
    out = str(tmp_path / "out")
    write_parquet_typed(spark.range(10).selectExpr("id"), out)
    stale = os.path.join(out, ".part-deadbeefdead-0123.inprogress")
    open(stale, "wb").write(b"partial")
    files = write_parquet_typed(
        spark.range(5).selectExpr("id"), out, mode="append"
    )
    assert os.path.exists(stale)  # append: foreign temp untouched
    assert files  # new files written
    assert spark.read.parquet(out).count() == 15
    write_parquet_typed(spark.range(3).selectExpr("id"), out, mode="overwrite")
    assert not os.path.exists(stale)  # overwrite: debris cleared
    assert spark.read.parquet(out).count() == 3


def _run_id_of(part_path: str) -> str:
    # part names are part-<run_id>-<uuid>.parquet
    return os.path.basename(part_path).split("-")[1]


def test_reconcile_removes_orphans_matches_manifest(spark, tmp_path):
    """Plant an orphan part file (the speculative double-commit
    scenario — same run id, since duplicate attempts run the same
    closure) and show the reconciled directory — and therefore the
    read — matches the manifest exactly (r6 verdict #3 done-criterion)."""
    out = str(tmp_path / "out")
    manifest = write_parquet_typed(
        spark.range(20).selectExpr("id", "cast(id as double) as x"), out
    )
    run_id = _run_id_of(manifest[0])
    # orphan: a duplicate attempt's file, valid parquet, not in manifest
    orphan = os.path.join(out, f"part-{run_id}-0123456789abcdef.parquet")
    _write_table(orphan, n=7)
    inprog = os.path.join(out, f".part-{run_id}-feedface.inprogress")
    open(inprog, "wb").write(b"x")
    removed = _reconcile_typed_output(out, manifest, [], run_id)
    assert orphan in removed and inprog in removed
    on_disk = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert on_disk == sorted(manifest)
    assert spark.read.parquet(out).count() == 20


def test_reconcile_keeps_preexisting_append_files(tmp_path):
    out = str(tmp_path / "out")
    os.makedirs(out)
    pre = os.path.join(out, "part-aaaaaaaaaaaa-preexisting.parquet")
    new = os.path.join(out, "part-bbbbbbbbbbbb-new.parquet")
    orphan = os.path.join(out, "part-bbbbbbbbbbbb-orphan.parquet")
    for f in (pre, new, orphan):
        _write_table(f, n=3)
    removed = _reconcile_typed_output(out, [new], [pre], "bbbbbbbbbbbb")
    assert removed == [orphan]
    assert os.path.exists(pre) and os.path.exists(new)


def test_reconcile_never_deletes_concurrent_runs_parts(spark, tmp_path):
    """Concurrent-append safety: a part committed by ANOTHER
    write_parquet_typed run — landing after this run's pre-write
    snapshot, so in neither `written` nor `existing` — must survive
    the sweep.  An unscoped part-*.parquet glob here is silent data
    loss for the concurrent writer."""
    out = str(tmp_path / "out")
    manifest = write_parquet_typed(spark.range(10).selectExpr("id"), out)
    run_id = _run_id_of(manifest[0])
    foreign = os.path.join(
        out, "part-ffffffffffff-cccccccccccccccccccccccccccccccc.parquet"
    )
    _write_table(foreign, n=4)
    removed = _reconcile_typed_output(out, manifest, [], run_id)
    assert removed == []
    assert os.path.exists(foreign)


def test_concurrent_typed_appends_keep_both_writers_parts(spark, tmp_path):
    """Two write_parquet_typed appends racing on the same directory:
    each writer's reconcile runs while the other's parts may already
    have landed (they are in neither its manifest nor its pre-write
    snapshot), and with the run-id-scoped sweep BOTH writers' rows
    must survive.  Spark schedules concurrent jobs from separate
    threads, so this drives the real interleaving, not a simulation."""
    import threading

    out = str(tmp_path / "out")
    write_parquet_typed(spark.range(5).selectExpr("id"), out)  # seed dir
    errs = []

    def append(lo):
        try:
            write_parquet_typed(
                spark.range(lo, lo + 100).selectExpr("id").repartition(4),
                out,
                mode="append",
            )
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [threading.Thread(target=append, args=(lo,)) for lo in (1000, 2000)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    want = sorted(
        list(range(5)) + list(range(1000, 1100)) + list(range(2000, 2100))
    )
    assert got == want


def test_kv_stamp_heals_arbitrary_torn_tails_property(spark, tmp_path):
    """Property: for ANY junk tail appended to a valid file (including
    junk containing PAR1 decoys), the stamp either heals to the exact
    original bytes + one new footer, or refuses loudly — never a
    silent corrupt stamp.  Deterministic seed sweep (hypothesis's
    per-example fixtures don't mix with the session-scoped spark
    fixture, so this is a plain parametrized loop)."""
    import random

    d = tmp_path / "data"
    d.mkdir()
    f = str(d / "part-0.parquet")
    _write_table(f)
    clean = open(f, "rb").read()
    rng = random.Random(7)
    for trial in range(12):
        junk_len = rng.randrange(1, 4096)
        junk = bytes(rng.randrange(256) for _ in range(junk_len))
        if trial % 3 == 0:
            # adversarial: embed PAR1 decoys in the junk
            pos = rng.randrange(len(junk) + 1)
            junk = junk[:pos] + b"PAR1" + junk[pos:]
        open(f, "wb").write(clean + junk)
        n = attach_kv_metadata(spark, str(d), {"trial": str(trial)})
        assert n == 1
        md = pq.read_metadata(f)
        assert md.num_rows == 100
        assert md.metadata[b"trial"] == str(trial).encode()
        assert open(f, "rb").read()[: len(clean)] == clean


# ---------------------------------------------------------------------------
# session_conf: locked set→act→restore windows (r6 verdict "wrong" #3)
# ---------------------------------------------------------------------------


def test_session_conf_restores_and_serializes(spark):
    import threading
    import time

    from tmp_parquet_merge_spark.sources.parquet_io import session_conf

    knob = "spark.sql.parquet.columnarReaderBatchSize"
    orig = spark.conf.get(knob)
    seen = []

    def other():
        with session_conf(spark, **{knob: "512"}):
            seen.append(spark.conf.get(knob))

    with session_conf(spark, **{knob: "256"}):
        assert spark.conf.get(knob) == "256"
        th = threading.Thread(target=other)
        th.start()
        time.sleep(0.3)
        # the second window must be blocked on the lock — our setting
        # cannot have been overwritten mid-window
        assert spark.conf.get(knob) == "256"
    th.join()
    assert seen == ["512"]
    assert spark.conf.get(knob) == orig


def test_session_conf_restores_on_exception(spark):
    from tmp_parquet_merge_spark.sources.parquet_io import session_conf

    knob = "spark.sql.parquet.columnarReaderBatchSize"
    orig = spark.conf.get(knob)
    with pytest.raises(RuntimeError):
        with session_conf(spark, **{knob: "128"}):
            raise RuntimeError("boom")
    assert spark.conf.get(knob) == orig


def test_session_conf_unsets_previously_unset_key(spark):
    """A key that was UNSET before the window must be unset again
    after it — 'restore the prior effective values' means unsetting,
    not leaving the window's value to leak into every later query —
    and entering the window on a default-less key must not raise."""
    from tmp_parquet_merge_spark.sources.parquet_io import session_conf

    knob = "spark.sql.optimizer.excludedRules"
    assert spark.conf.get(knob, None) is None, "suite precondition"
    rule = "org.apache.spark.sql.catalyst.optimizer.ConstantFolding"
    with session_conf(spark, **{knob: rule}):
        assert spark.conf.get(knob, None) == rule
    assert spark.conf.get(knob, None) is None
    # exception path too
    with pytest.raises(RuntimeError):
        with session_conf(spark, **{knob: rule}):
            raise RuntimeError("boom")
    assert spark.conf.get(knob, None) is None


# ---------------------------------------------------------------------------
# merge-family sizing: executor-side stats past the threshold
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def many_files_dir(tmp_path_factory):
    """10k-file fixture (r6 verdict #2 done-criterion) — one real
    parquet file hard-linked 10k times, so creation is O(seconds)."""
    d = tmp_path_factory.mktemp("manyfiles")
    seed = str(d / "part-00000.parquet")
    _write_table(seed, n=10)
    for i in range(1, 10_000):
        os.link(seed, str(d / f"part-{i:05d}.parquet"))
    return str(d)


def test_dataset_bytes_10k_files_no_driver_stat_loop(
    spark, many_files_dir, monkeypatch
):
    """Sizing a 10k-file dataset must not stat files on the driver —
    the 1e6-file design point would stall the driver for minutes."""
    files = sorted(glob.glob(os.path.join(many_files_dir, "*.parquet")))
    assert len(files) == 10_000
    per_file = os.path.getsize(files[0])

    calls = []
    real_getsize = os.path.getsize

    def counting_getsize(p):
        p = str(p)
        if p.startswith(many_files_dir):
            calls.append(p)
        return real_getsize(p)

    # driver-side only: executor python workers are separate processes
    monkeypatch.setattr(os.path, "getsize", counting_getsize)
    total = _dataset_bytes(spark, files)
    assert total == per_file * 10_000
    assert calls == [], (
        f"driver stat loop: {len(calls)} driver-side getsize calls "
        "for an over-threshold dataset"
    )


def test_file_sizes_10k_files_distributed(spark, many_files_dir, monkeypatch):
    files = sorted(glob.glob(os.path.join(many_files_dir, "*.parquet")))
    per_file = os.path.getsize(files[0])

    calls = []
    real_getsize = os.path.getsize

    def counting_getsize(p):
        p = str(p)
        if p.startswith(many_files_dir):
            calls.append(p)
        return real_getsize(p)

    monkeypatch.setattr(os.path, "getsize", counting_getsize)
    pairs = _file_sizes(spark, files)
    assert len(pairs) == 10_000
    assert all(b == per_file for _, b in pairs)
    assert {f for f, _ in pairs} == set(files)
    assert calls == []


def test_file_sizes_small_input_stays_serial(spark, tmp_path):
    """Under the threshold the serial path is used (no Spark job —
    the 64-file compaction benches must not regress)."""
    files = []
    for i in range(3):
        f = str(tmp_path / f"f{i}.parquet")
        _write_table(f, n=5)
        files.append(f)
    pairs = _file_sizes(spark, files)
    assert [f for f, _ in pairs] == files
    assert all(b == os.path.getsize(f) for f, b in pairs)


def test_compact_incremental_over_threshold(spark, tmp_path):
    """compact_incremental end-to-end just past the distributed-stat
    threshold: manifest covers every input, rows conserved."""
    d = tmp_path / "tbl"
    d.mkdir()
    seed = str(d / "part-00000.parquet")
    _write_table(seed, n=10)
    for i in range(1, 300):
        os.link(seed, str(d / f"part-{i:05d}.parquet"))
    out = str(tmp_path / "compacted")
    manifest = compact_incremental(
        spark, str(d), out, small_file_bytes=1024 * 1024
    )
    rows = manifest.collect()
    actions = {r.action for r in rows}
    assert "compacted" in actions and "written" in actions
    n_compacted = sum(1 for r in rows if r.action == "compacted")
    assert n_compacted == 300
    assert spark.read.parquet(out).count() == 3000
