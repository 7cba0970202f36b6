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
