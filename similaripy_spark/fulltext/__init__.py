"""Fulltext index engine: SPIMI-style sharded postings build
(``index_build.IndexBuilder``), BM25-family weighting (``weights``),
exact top-k retrieval with three physical strategies (``wand``), and the
public serve surface (``retrieve``):

* ``open_index(spark, index_dir)`` → :class:`IndexHandle` — the load-once
  query-server path (meta + idf-annotated segments + routing state loaded
  once, ``.topk()`` per batch);
* ``topk(spark, index_dir, queries)`` — one-shot convenience.
"""

from similaripy_spark.fulltext.retrieve import (  # noqa: F401
    IndexHandle,
    open_index,
    topk,
)
