"""CLI subcommands (the pc-cli mirror) — each drives the real library path."""

import json

from agile_lakehouse_spark.cli import main


def _run(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    return json.loads(out)


def test_cli_convert_and_partition_and_merge(spark, sf_dir, tmp_path, capsys):
    from agile_lakehouse_spark.sources.catalog import points_view

    src = str(tmp_path / "pts_in")
    points_view(spark, sf_dir).write.parquet(src)
    n_src = spark.read.parquet(src).count()

    conv = str(tmp_path / "converted")
    r = _run(capsys, ["convert", "-i", src, "-o", conv, "--importance", "--compression", "zstd"])
    assert r["rows"] == n_src
    assert "i" in spark.read.parquet(conv).columns

    part = str(tmp_path / "layout")
    r = _run(capsys, ["partition", "-i", conv, "-o", part, "--mode", "grid", "--delta", "200"])
    assert r["rows"] == n_src

    merged = str(tmp_path / "merged")
    r = _run(capsys, ["merge", conv, part, merged, "--target-files", "2"])
    assert r["rows"] == 2 * n_src


def test_cli_benchmark_runs(sf_dir, capsys, monkeypatch):
    r = _run(capsys, ["benchmark", sf_dir, "--runs", "1"])
    assert r["runs"] == 1
    assert set(r["queries"]) >= {"w_s_rect", "w_m_circle", "w_knn_1000", "w_sampling"}
