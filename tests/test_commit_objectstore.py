"""Object-store commit backend: pointer-swap publishes (no directory
rename), backend-transparent reads, crash/resume, and garbage reclaim.

The reference publishes its model as an in-memory scipy matrix (no commit
story: similaripy/similarity.py returns the result directly); the commit
protocol is engine infrastructure the north rule adds (checkpoint-resumable
build with per-partition lineage). ``ObjectStoreCommitProtocol`` realizes
the same interface with S3/GCS-compatible semantics: immutable versioned
prefixes + atomic pointer swap, the Iceberg metadata-pointer design.
"""

from __future__ import annotations

import json
import os

import pytest

from similaripy_spark.fulltext.commit import (
    LocalFSCommitProtocol,
    ObjectStoreCommitProtocol,
    pointer_path,
    vacuum_versions,
)
from similaripy_spark.fulltext.index_build import (
    IndexBuilder,
    read_doc_stats,
    read_meta,
    read_segments,
    read_term_stats,
)
from similaripy_spark.fulltext.wand import segment_topk
from similaripy_spark.sources.pages import generate_pages, generate_queries_pandas

N_DOCS, VOCAB = 800, 900


def _build(spark, d, commit, **kw):
    pages = generate_pages(spark, N_DOCS, vocab_size=VOCAB)
    b = IndexBuilder(d, shard_size=256, n_groups=3, commit=commit)
    b.build(pages, **kw)
    return b


def _query_pdf(spark, d):
    q = spark.createDataFrame(generate_queries_pandas(40, vocab_size=VOCAB))
    n_shards = read_meta(d)["n_shards"]
    return (
        segment_topk(read_segments(spark, d), q, k=10,
                     shard_ids=list(range(n_shards)))
        .orderBy("query_id", "rank")
        .toPandas()
    )


def test_objectstore_build_parity_with_localfs(spark, tmp_path):
    """Same corpus through both backends ⇒ identical query results, and the
    pointer-committed index contains NO renamed directories — every data
    prefix is immutable and pointer-referenced."""
    d_os, d_fs = str(tmp_path / "os"), str(tmp_path / "fs")
    _build(spark, d_os, ObjectStoreCommitProtocol())
    _build(spark, d_fs, LocalFSCommitProtocol())

    r_os, r_fs = _query_pdf(spark, d_os), _query_pdf(spark, d_fs)
    assert r_os.equals(r_fs)

    # physical layout really is pointer-swap: segments/ holds only pointers
    seg = os.path.join(d_os, "segments")
    entries = sorted(os.listdir(seg))
    assert entries and all(e.endswith(".ptr.json") for e in entries)
    for e in entries:
        loc = json.load(open(os.path.join(seg, e)))["location"]
        assert "_versions" in loc and os.path.isdir(loc)
    # stats tables resolve through their pointers too
    assert read_term_stats(spark, d_os).count() == \
        read_term_stats(spark, d_fs).count()
    assert read_doc_stats(spark, d_os).count() == N_DOCS


def test_objectstore_crash_resume(spark, tmp_path):
    """Crash after one committed group: resume publishes only the missing
    groups (lineage is authoritative), and the finished index matches a
    clean one-shot build."""
    d = str(tmp_path / "crash")
    commit = ObjectStoreCommitProtocol()
    with pytest.raises(RuntimeError, match="injected failure"):
        _build(spark, d, commit, fail_after_groups=1)
    b = IndexBuilder(d, shard_size=256, n_groups=3, commit=commit)
    done_before = b.committed_groups()
    assert len(done_before) == 1
    b.build(generate_pages(spark, N_DOCS, vocab_size=VOCAB))
    assert b.committed_groups() == {0, 1, 2}

    d_ref = str(tmp_path / "ref")
    _build(spark, d_ref, ObjectStoreCommitProtocol())
    assert _query_pdf(spark, d).equals(_query_pdf(spark, d_ref))


def test_objectstore_rebuild_and_vacuum(spark, tmp_path):
    """A full rebuild swaps pointers to new prefixes; the superseded
    prefixes survive until vacuum (so concurrent readers of the old version
    never see a hole), then vacuum reclaims exactly the unreferenced ones
    and reads still work."""
    d = str(tmp_path / "rb")
    commit = ObjectStoreCommitProtocol()
    _build(spark, d, commit)
    before = _query_pdf(spark, d)

    _build(spark, d, commit, resume=False)  # rebuild: new version prefixes
    removed = vacuum_versions(d)
    assert removed > 0  # the superseded build's prefixes
    after = _query_pdf(spark, d)
    assert before.equals(after)
    assert vacuum_versions(d) == 0  # idempotent


def test_torn_pointer_reads_as_uncommitted(tmp_path):
    """A torn pointer object (crashed conditional PUT) must read as 'not
    committed', never as an error."""
    commit = ObjectStoreCommitProtocol()
    final = str(tmp_path / "art")
    staged = commit.stage_path(final)
    os.makedirs(staged, exist_ok=True)
    with open(pointer_path(final), "w") as f:
        f.write('{"locat')  # torn write
    assert commit.resolve(final) == final  # falls back: no committed version
    commit.commit_dir(staged, final)
    assert commit.resolve(final) == staged
