"""Staging-root and cache-key discipline (VERDICT r03 'What's wrong #1'
+ ADVICE r03 cache-key items)."""

import os
import time

import pytest

from doc_ocr_spark import staging


def test_stage_root_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STAGE_DIR", str(tmp_path / "stage"))
    root = staging.stage_root()
    assert root == str(tmp_path / "stage")
    assert os.path.isdir(root)


def test_stage_root_default_is_per_user(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_STAGE_DIR", raising=False)
    monkeypatch.delenv("XDG_CACHE_HOME", raising=False)
    root = staging.stage_root()
    # per-user suffix: another local user cannot pre-plant the path
    assert str(os.getuid()) in os.path.basename(root)


def test_content_key_changes_with_any_part():
    base = staging.content_key("a", 1, 0.5)
    assert staging.content_key("a", 1, 0.6) != base
    assert staging.content_key("b", 1, 0.5) != base
    assert staging.content_key("a", 1, 0.5) == base  # deterministic


def test_file_fingerprint_tracks_content_not_mtime(tmp_path):
    f = tmp_path / "data.bin"
    f.write_bytes(b"hello world" * 100)
    fp1 = staging.file_fingerprint(str(f))
    # same bytes, new mtime -> same fingerprint (object-store copy case)
    os.utime(f, (time.time() + 100, time.time() + 100))
    assert staging.file_fingerprint(str(f)) == fp1
    # changed bytes, even same size -> different fingerprint
    f.write_bytes(b"hellO world" * 100)
    assert staging.file_fingerprint(str(f)) != fp1


def test_file_fingerprint_directory_sums_data_files(tmp_path):
    d = tmp_path / "tbl.parquet"
    d.mkdir()
    (d / "part-0").write_bytes(b"aaa")
    (d / "_SUCCESS").write_bytes(b"")  # hidden/meta files ignored
    fp1 = staging.file_fingerprint(str(d))
    (d / "part-1").write_bytes(b"bbb")
    assert staging.file_fingerprint(str(d)) != fp1


def test_file_fingerprint_recurses_into_partition_subdirs(tmp_path):
    """ADVICE r04: a partitioned layout (bucket=N/ subdirs) must fold
    its NESTED data files — and the partition-dir names themselves —
    into the key, or a changed corpus silently hits a stale table."""
    d = tmp_path / "tbl.parquet"
    (d / "bucket=0").mkdir(parents=True)
    (d / "bucket=0" / "part-0").write_bytes(b"aaa")
    fp1 = staging.file_fingerprint(str(d))
    # changed bytes inside a subdir -> different key
    (d / "bucket=0" / "part-0").write_bytes(b"bbb")
    fp2 = staging.file_fingerprint(str(d))
    assert fp2 != fp1
    # partition VALUES are data: renaming the subdir alone changes the key
    (d / "bucket=0").rename(d / "bucket=1")
    assert staging.file_fingerprint(str(d)) != fp2
    # hidden/meta subdirs are still ignored
    fp3 = staging.file_fingerprint(str(d))
    (d / "_delta_log").mkdir()
    (d / "_delta_log" / "0.json").write_bytes(b"meta")
    assert staging.file_fingerprint(str(d)) == fp3


def test_file_fingerprint_missing_file_raises(tmp_path):
    """ADVICE r04: OSError must PROPAGATE — a content-independent
    ':absent' token would make the key stable across corpus changes."""
    with pytest.raises(OSError):
        staging.file_fingerprint(str(tmp_path / "nope.parquet"))


def test_stage_root_tmp_fallback_is_private_and_owner_checked(
    tmp_path, monkeypatch
):
    """ADVICE r04: the uid suffix alone is no defense — the fallback
    must be created 0o700 and a dir owned by another user refused."""
    import tempfile as _tf

    monkeypatch.delenv("SPARK_GRAFT_STAGE_DIR", raising=False)
    monkeypatch.delenv("XDG_CACHE_HOME", raising=False)
    monkeypatch.setattr(_tf, "gettempdir", lambda: str(tmp_path))
    root = staging.stage_root()
    assert root == str(tmp_path / f"doc_ocr_spark_stage_{os.getuid()}")
    assert (os.stat(root).st_mode & 0o777) == 0o700
    # pre-planted shape: the path key says uid X, the dir is owned by
    # someone else (simulated by patching getuid AFTER this user
    # created the dir) -> refuse, do not silently reuse
    real_uid = os.getuid()
    os.makedirs(tmp_path / f"doc_ocr_spark_stage_{real_uid + 1}")
    monkeypatch.setattr(os, "getuid", lambda: real_uid + 1)
    with pytest.raises(RuntimeError, match="owned by another user"):
        staging.stage_root()


def test_ensure_staged_builds_once_and_publishes_atomically(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STAGE_DIR", str(tmp_path))
    calls = []

    def build(tmp):
        calls.append(tmp)
        os.makedirs(tmp)
        with open(os.path.join(tmp, "x"), "w") as f:
            f.write("1")

    p1 = staging.ensure_staged("grp", "k1", build)
    p2 = staging.ensure_staged("grp", "k1", build)
    assert p1 == p2 and len(calls) == 1
    assert ".tmp-" in calls[0] and os.path.isfile(os.path.join(p1, "x"))


def test_ensure_staged_sweeps_stale_tmp(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STAGE_DIR", str(tmp_path))
    grp = tmp_path / "grp"
    grp.mkdir()
    stale = grp / "old.parquet.tmp-dead"
    stale.mkdir()
    old = time.time() - 7200
    os.utime(stale, (old, old))
    fresh = grp / "new.parquet.tmp-live"
    fresh.mkdir()

    def build(tmp):
        os.makedirs(tmp)

    staging.ensure_staged("grp", "k2", build)
    assert not stale.exists(), "stale .tmp- leftover must be swept"
    assert fresh.exists(), "in-flight .tmp- must be left alone"


def test_no_hardcoded_tmp_in_operator_modules():
    """VERDICT r03 item 3 'done' criterion: operator modules must not
    hard-code /tmp (driver-local — invisible to executors on a real
    cluster).  Staging goes through doc_ocr_spark.staging."""
    import doc_ocr_spark

    pkg_dir = os.path.dirname(doc_ocr_spark.__file__)
    offenders = []
    for sub in ("operators", "streaming", "sources"):
        d = os.path.join(pkg_dir, sub)
        for name in sorted(os.listdir(d)):
            if not name.endswith(".py"):
                continue
            with open(os.path.join(d, name)) as f:
                for i, line in enumerate(f, 1):
                    code = line.split("#", 1)[0]
                    if '"/tmp' in code or "'/tmp" in code:
                        offenders.append(f"{sub}/{name}:{i}")
    assert not offenders, f"hard-coded /tmp paths: {offenders}"


def test_signals_and_pairs_keys_fold_upstream_constants(monkeypatch):
    """ADVICE r03: changing an upstream constant must invalidate the
    staged table without a manual VERSION bump.  Exercised on the real
    key-builders by monkeypatching a constant and asserting the staged
    path moves."""
    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("testdata absent")
    from doc_ocr_spark.operators import dedup, sampling

    class _NoBuild:
        """ensure_staged stub: capture the key, never build."""

        def __init__(self):
            self.keys = []

        def __call__(self, group, key, build, suffix=".parquet"):
            self.keys.append((group, key))
            return f"/dev/null/{group}/{key}"

    cap = _NoBuild()
    monkeypatch.setattr(staging, "ensure_staged", cap)
    dedup.minhash_pairs_path(None, sf)
    monkeypatch.setattr(dedup, "JACCARD_THRESHOLD", 0.77)
    dedup.minhash_pairs_path(None, sf)
    assert cap.keys[0] != cap.keys[1], "threshold change must change key"

    sampling.curation_signals_path(None, sf)
    monkeypatch.setattr(sampling, "CONTAM_MIN", 99)
    sampling.curation_signals_path(None, sf)
    assert cap.keys[2] != cap.keys[3], "contam change must change key"


def test_ensure_staged_concurrent_builders_one_table(tmp_path, monkeypatch):
    """Two builders racing on the same key: exactly one build wins the
    rename, the loser cleans its tmp, readers see a complete table."""
    import threading

    monkeypatch.setenv("SPARK_GRAFT_STAGE_DIR", str(tmp_path))
    barrier = threading.Barrier(2)
    built = []

    def build(tmp):
        barrier.wait(timeout=10)
        os.makedirs(tmp)
        with open(os.path.join(tmp, "data"), "w") as f:
            f.write("x" * 100)
        built.append(tmp)

    paths = [None, None]

    def worker(i):
        paths[i] = staging.ensure_staged("race", "k", build)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join(timeout=30) for t in ts]
    assert paths[0] == paths[1] and paths[0] is not None
    assert len(built) == 2  # both built; one publish won
    assert os.path.isfile(os.path.join(paths[0], "data"))
    # loser's tmp removed, no stray .tmp- dirs remain
    leftovers = [e for e in os.listdir(os.path.dirname(paths[0])) if ".tmp-" in e]
    assert leftovers == [], leftovers


def test_stage_dir_override_used_end_to_end(spark, tmp_path, monkeypatch):
    """The cluster story: with SPARK_GRAFT_STAGE_DIR pointed at shared
    storage, a staged-table consumer must build and read ONLY under the
    override (no driver-local fallback paths in the executed plan)."""
    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("testdata absent")
    monkeypatch.setenv("SPARK_GRAFT_STAGE_DIR", str(tmp_path / "shared"))
    from doc_ocr_spark.operators.sampling import corpus_curation, curation_signals_path

    p = curation_signals_path(spark, sf)
    assert p.startswith(str(tmp_path / "shared"))
    assert os.path.isdir(p)
    out = corpus_curation(spark, sf)
    assert out.count() > 0
    # inputFiles: the decision join must read the override-rooted
    # signals table (plus the documents scan) and nothing driver-local
    files = out.inputFiles()
    assert any(str(tmp_path / "shared") in f for f in files), files
    assert all(
        str(tmp_path / "shared") in f or "/testdata/" in f for f in files
    ), files


def test_curation_near_duplicate_reason_keeps_cluster_keeper(
    spark, tmp_path, monkeypatch
):
    """Round-5 cascade semantics on a constructed corpus: an EXACT-dup
    loser drops as 'duplicate', a minhash-cluster loser (perturbed
    near-copy) drops as 'near_duplicate', and the cluster KEEPER (min
    doc_id) is never dropped by either dedup rule — exact dedup alone
    would have kept every near-copy."""
    monkeypatch.setenv("SPARK_GRAFT_STAGE_DIR", str(tmp_path / "stage"))
    from doc_ocr_spark.operators.sampling import corpus_curation

    base = "the quick brown fox jumps over one lazy dog near the old river bank today"
    rows = []
    # doc_id < BENCH_DOCS(20) is the benchmark slice; distinct vocab so
    # nothing downstream trips 'contaminated'
    for i in range(20):
        rows.append((i, f"benchmark filler number {i} with entirely separate words", "en", "bench.example", 40))
    rows.append((20, base, "en", "site-a", len(base)))                     # near-dup KEEPER
    rows.append((21, base.replace("today", "tonight"), "en", "site-a", len(base)))  # near-dup loser
    rows.append((22, "the completely different unique document with its own words here", "en", "site-b", 60))
    rows.append((23, rows[-1][1], "en", "site-b", 60))                     # exact-dup loser of 22
    d = tmp_path / "sfdir"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))

    got = {r.doc_id: r.reason for r in corpus_curation(spark, str(d)).collect()}
    assert got[23] == "duplicate", got
    assert got[21] == "near_duplicate", got
    assert got[20] not in ("duplicate", "near_duplicate"), got
    assert got[22] not in ("duplicate", "near_duplicate"), got
