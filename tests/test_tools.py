"""CLI twins: the reference's tools print metadata AND values
(cpp/tools/parquet/parquet_reader.cc:44-57 — --only-metadata=false is
the default value-dump path).  Run the CLIs in-process against the
session fixture (get_spark getOrCreate reuses it) and assert on stdout.
"""

import json


def test_parquet_reader_prints_values(spark, sf_dir, capsys):
    from tools.parquet_reader import main

    assert main([sf_dir + "/region.parquet"]) == 0
    out = capsys.readouterr().out
    # metadata half
    assert "num_rows: 5" in out
    assert "num_row_groups:" in out
    # value half: every region name appears in the dump
    for name in ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"):
        assert name in out


def test_parquet_reader_only_metadata_suppresses_values(spark, sf_dir, capsys):
    from tools.parquet_reader import main

    assert main(["--only-metadata", sf_dir + "/region.parquet"]) == 0
    out = capsys.readouterr().out
    assert "num_rows: 5" in out
    assert "AFRICA" not in out


def test_parquet_reader_json_and_column_selection(spark, sf_dir, capsys):
    from tools.parquet_reader import main

    assert main(["--json", "--columns=1", sf_dir + "/region.parquet"]) == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("{") and "r_name" in l]
    assert len(lines) == 5
    parsed = {json.loads(l)["r_name"] for l in lines}
    assert parsed == {"AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"}
    assert "r_regionkey" not in json.loads(lines[0])


def test_parquet_scan_tool_counts_rows(spark, sf_dir, capsys):
    from tools.parquet_scan import main

    assert main([sf_dir + "/region.parquet"]) == 0
    out = capsys.readouterr().out
    assert "5" in out


def test_parquet_merge_cli_merge_and_incremental(spark, sf_dir, tmp_path, capsys):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import parquet_merge

    from tmp_parquet_merge_spark.sources import parquet_io

    # classic merge mode
    out = str(tmp_path / "merged")
    rc = parquet_merge.main(
        [f"--target-size-mb=64", out, f"{sf_dir}/nation.parquet",
         f"{sf_dir}/region.parquet"]
    )
    captured = capsys.readouterr().out
    assert rc == 0 and "rows merged into" in captured

    # kv stamping + INT96 through the CLI (the reference tool pairing:
    # parquet_reader.cc:46-47 kv dump / reader_writer.h:48-49 INT96)
    from pyspark.sql import functions as F

    ltz_in = str(tmp_path / "ltz_in")
    spark.range(50).select(
        F.col("id"), F.timestamp_seconds(F.col("id")).alias("ts")
    ).write.parquet(ltz_in)  # TimestampType (LTZ) — the INT96-eligible kind
    out_kv = str(tmp_path / "merged_kv")
    # pin a non-INT96 session default so the flag's effect is what the
    # assertion observes (Spark's own default here IS INT96)
    ts_key = "spark.sql.parquet.outputTimestampType"
    spark.conf.set(ts_key, "TIMESTAMP_MICROS")
    try:
        rc = parquet_merge.main(
            ["--kv=engine=spark-graft", "--kv=round=6", "--int96-timestamps",
             out_kv, ltz_in]
        )
    finally:
        spark.conf.set(ts_key, "INT96")
    assert rc == 0 and "rows merged into" in capsys.readouterr().out
    import pyarrow.parquet as pq
    f = parquet_io._expand_parquet_paths(spark, out_kv)[0]
    md = pq.ParquetFile(f).metadata
    kv = {k.decode(): v.decode() for k, v in (md.metadata or {}).items()}
    assert kv.get("engine") == "spark-graft" and kv.get("round") == "6"
    phys = {
        md.row_group(0).column(i).path_in_schema:
            md.row_group(0).column(i).physical_type
        for i in range(md.row_group(0).num_columns)
    }
    assert phys["ts"] == "INT96"

    # flags are rejected where they cannot apply atomically
    rc = parquet_merge.main(
        ["--incremental", "--kv=a=b", str(tmp_path / "x"), out_kv]
    )
    assert rc == 1
    rc = parquet_merge.main(["--kv==oops", str(tmp_path / "x"), out_kv])
    assert rc == 1

    # incremental maintenance mode
    mixed = str(tmp_path / "mixed")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    parquet_io.write_parquet(li.repartition(2), mixed)
    parquet_io.write_parquet(li.limit(200).repartition(8), mixed, mode="append")
    rc = parquet_merge.main(
        ["--incremental", "--small-file-mb=1", "--target-size-mb=1",
         str(tmp_path / "inc_out"), mixed]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    # at sf0.001 everything is <1 MiB so all 10 compact; the manifest
    # line always reports the three action buckets
    assert "kept" in captured and "compacted" in captured and "written" in captured


def test_make_scaled_dir_preserves_referential_integrity(
    spark, sf_dir, tmp_path
):
    """The K-fold replica keeps FK edges valid (every replicated
    lineitem row still joins its replicated order), holds the 25/5
    nation/region dims fixed (TPC-H semantics), and decorrelates the
    document corpus (no cross-replica exact dups)."""
    from tools.make_scaled_dir import FIXED_DIMS, KEY_SHIFTS, replicate

    k = 3
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li_k = replicate(li, "lineitem", k)
    ord_k = replicate(orders, "orders", k)
    assert li_k.count() == k * li.count()
    # every replicated lineitem still finds its order
    dangling = li_k.join(
        ord_k, li_k.l_orderkey == ord_k.o_orderkey, "left_anti"
    ).count()
    assert dangling == 0
    # documents: replicas are not exact duplicates of each other
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    doc_k = replicate(docs, "documents", k)
    n_distinct_texts = doc_k.select("text").distinct().count()
    assert n_distinct_texts > docs.count()  # rotation decorrelated them
    assert FIXED_DIMS == ("region", "nation")
    assert set(KEY_SHIFTS) | set(FIXED_DIMS) == {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    }


def test_fold_evidence_cwd_independent(tmp_path):
    """The evidence glob is anchored to the repo root: run from any
    other cwd it must still find every CORRECTNESS file — a silently
    empty ledger pasted into queries.py would wipe the evidence
    table."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "/root/repo/tools/fold_evidence.py"],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0
    assert "_HASH_GREEN_BY_ROUND" in r.stdout
    # the folded ledger is populated, not empty
    assert r.stdout.count('"q_') > 100
    # the only never-evidenced entries are the thirteen r7 oracle
    # conversions: their rows-only driver evidence certifies a
    # contract that no longer exists (fold_evidence's oracle-status
    # rule drops it), and each sits in the pinned r7 window for a
    # fresh hash-compared run.  Anything OUTSIDE this set appearing
    # here means evidence was silently lost.
    converted = {
        "q_roundtrip",
        "q_typed_roundtrip",
        "q_scan_batch_size",
        "q_schema_dump",
        "q_rowgroup_read",
        "q_merge_schema_evolution",
        "q_pagerank",
        "q_dedup_editdist_lsh",
        "q_dedup_cluster_lsh",
        "q_dedup_minhash",
        "q_contamination_lsh",
        "q_frame_sample",
        "q_multimodal_features",
    }
    (never_line,) = [
        ln for ln in r.stdout.splitlines() if "never driver-evidenced" in ln
    ]
    assert f"never driver-evidenced ({len(converted)})" in never_line
    # exact-set compare on the parsed names — substring containment
    # would let 'q_roundtrip' be satisfied by 'q_typed_roundtrip' and
    # miss a swapped-out member entirely
    import re

    never_names = set(re.findall(r"'(q_\w+)'", never_line))
    assert never_names == converted, never_names ^ converted


def test_bench_rejects_unknown_query_names():
    """A typo'd probe must exit non-zero before any Spark work, not
    report a plausible 0-query success."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "/root/repo/bench.py", "/tmp", "q_not_a_query"],
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert r.returncode == 2
    assert "unknown query name" in r.stderr


def test_check_oracle_guards_args():
    import pytest

    from tools.check_oracle import main as co_main, norm_cell

    import sys as _sys

    argv = _sys.argv
    try:
        _sys.argv = ["check_oracle.py", "q_not_a_dir_nor_query"]
        with pytest.raises(SystemExit):
            co_main()
    finally:
        _sys.argv = argv
    # -0.0 must normalize identically to 0.0 (sign-of-zero differences
    # between Spark's and DuckDB's accumulation order are not value
    # mismatches)
    assert norm_cell(-0.0) == norm_cell(0.0) == "0"
    assert norm_cell([-0.0, 1.5]) == norm_cell([0.0, 1.5])
