"""End-to-end CLI flow: backup → list → describe → dry-run → restore →
validate → show-offset-mapping, all file-backed."""

from __future__ import annotations

import json

import pytest

from kafka_backup_spark.__main__ import main

CFG = """
mode: backup
backup_id: bk-cli
source:
  cluster_id: cli-src
backup:
  inject_headers: true
restore:
  window_start_ms: 1704067200000
  inject_headers: true
"""


@pytest.fixture(scope="module")
def cfg_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "cfg.yaml"
    p.write_text(CFG)
    return str(p)


@pytest.fixture(scope="module")
def store_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli") / "store")


def run(capsys, argv) -> dict:
    rc = main(argv)
    assert rc == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_backup(spark, capsys, cfg_path, store_dir, sf_dir):
    out = run(capsys, [
        "backup", "--config", cfg_path, "--store", store_dir,
        "--source-parquet", f"{sf_dir}/events.parquet",
    ])
    assert out["backup_id"] == "bk-cli"
    assert out["segments"] > 0


def test_cli_list_describe_dryrun(spark, capsys, cfg_path, store_dir):
    listed = run(capsys, ["list", "--store", store_dir])
    assert listed["backups"][0]["backup_id"] == "bk-cli"
    assert listed["backups"][0]["total_records"] > 0

    desc = run(capsys, ["describe", "--store", store_dir, "--backup-id", "bk-cli"])
    assert any(r["topic"] is None for r in desc["describe"])  # global rollup level

    est = run(capsys, ["dry-run", "--config", cfg_path, "--store", store_dir])
    assert len(est["estimate"]) > 0


def test_cli_restore_and_validate(spark, capsys, cfg_path, store_dir, tmp_path):
    out_dir = str(tmp_path / "restored")
    res = run(capsys, [
        "restore", "--config", cfg_path, "--store", store_dir, "--out", out_dir,
    ])
    assert res["restored_records"] > 0

    val = run(capsys, ["validate", "--store", store_dir, "--backup-id", "bk-cli"])
    assert val["summary"]["overall"] == "passed"
    assert all(s["status"] == "valid" for s in val["segments"])

    mapping = run(capsys, [
        "show-offset-mapping", "--store", store_dir, "--target-parquet", out_dir,
    ])
    assert len(mapping["ranges"]) > 0
