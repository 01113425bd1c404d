import json

import pytest

from doc_ocr_spark.core.template_loader import load_templates_dir, resolve_templates


def test_sorted_glob_order_and_validation(tmp_path):
    (tmp_path / "b_second.json").write_text(
        json.dumps({"name": "b", "match_rules": {}, "fields": {}})
    )
    (tmp_path / "a_first.json").write_text(
        json.dumps({"name": "a", "match_rules": {}, "fields": {}})
    )
    tpls = load_templates_dir(str(tmp_path))
    assert [t["name"] for t in tpls] == ["a", "b"]


def test_malformed_template_rejected(tmp_path):
    (tmp_path / "bad.json").write_text(json.dumps({"name": "x"}))
    with pytest.raises(ValueError, match="missing keys"):
        load_templates_dir(str(tmp_path))


def test_resolve_defaults_to_builtins():
    names = [t["name"] for t in resolve_templates(None)]
    assert names == sorted(names) and "invoice_en" in names


def test_job_refuses_append_without_resume(spark, tmp_path):
    from doc_ocr_spark.datagen import write_corpus_parquet
    from doc_ocr_spark.job import run_extraction

    src = str(tmp_path / "p.parquet")
    write_corpus_parquet(src, 30)
    out = str(tmp_path / "out")
    run_extraction(spark, src, out, n_buckets=4)
    with pytest.raises(ValueError, match="resume"):
        run_extraction(spark, src, out, n_buckets=4)
