"""Smoke tests for the driver contract (__spark_entry__)."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"user_id", "event_hour", "n_trips"}


def test_queries_run_at_sf0001(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_oracle_keys_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles).issubset(set(qs))


def test_coverage_doc_query_count_matches_registry():
    """VERDICT r14 task 5: COVERAGE.md's headline query count went
    stale (said 183 while the registry held 191). The count line is
    now format-pinned (`N queries total in \\`queries()\\``) and this
    test fails the suite whenever the registry grows without the doc
    — the 'generated line' enforcement."""
    import re

    text = open("/root/repo/COVERAGE.md").read()
    m = re.search(r"(\d+) queries total in `queries\(\)`", text)
    assert m, "COVERAGE.md lost its pinned count line"
    assert int(m.group(1)) == len(entrymod.queries()), (
        f"COVERAGE.md says {m.group(1)} queries; registry has "
        f"{len(entrymod.queries())} — update the doc in the same "
        "commit that touches the registry")


def test_index_cache_rejects_symlinked_base(tmp_path, monkeypatch):
    """ADVICE r10: the per-user cache ownership check must lstat —
    a pre-created SYMLINK at the base path (pointing anywhere, even a
    directory this uid owns) must be rejected, or another user could
    redirect index I/O to a location they chose."""
    import getpass
    import tempfile

    import pytest

    victim = tmp_path / "victim"
    victim.mkdir()
    fake_tmp = tmp_path / "tmp"
    fake_tmp.mkdir()
    base = fake_tmp / f"ndpspark-index-{getpass.getuser()}"
    base.symlink_to(victim)
    monkeypatch.setattr(tempfile, "tempdir", str(fake_tmp))
    with pytest.raises(RuntimeError, match="not a directory"):
        entrymod._index_dir("/root/testdata/sf0.001", "documents", "t")
    # and a REAL directory at the same path is accepted
    base.unlink()
    base.mkdir(mode=0o700)
    assert entrymod._index_dir(
        "/root/testdata/sf0.001", "documents", "t").startswith(str(base))
