"""Cross-store takedown: apply one document-removal batch to every
persisted index that references the doc ids — the GDPR/DMCA flow a
training-data pipeline actually runs (reference semantics:
`delete(ks)`, amplab/spark-indexedrdd IndexedRDD.scala:120-123,
propagated to each at-rest index derived from the corpus).

Each store keeps its own family-appropriate delete mechanics — the
postings store's meta-committed tombstones with exact stat deltas
(retrieval.delete_postings_docs), the IVF vector store's
meta-committed tombstones (ivf.delete_ivf_ids), the signature store's
ledger tombstones (dedup.delete_signature_docs), and the compressed
ANN serving tiers' meta-committed tombstones (pq.delete_ivfpq_ids,
quant.delete_binary_ids — WITHOUT these, a takedown that removed the
raw vector would leave the deleted id servable from its codes or
sketch) — and this module just sequences them under ONE batch tag so
an operator can re-run a partially-failed takedown and every
already-committed store replays as a no-op while the rest catch up.

There is deliberately NO cross-store transaction: the stores are
independent single-writer artifacts (often owned by different jobs),
and a takedown's contract is eventual — "re-run until all True/False"
— not atomic. The per-store commit protocols guarantee each store is
individually never torn; `takedown_docs` returns the per-store applied
map so callers can verify completion."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def takedown_docs(
    spark: SparkSession,
    ids,
    batch_tag: str,
    postings_path: "str | None" = None,
    signature_path: "str | None" = None,
    ivf_path: "str | None" = None,
    ivfpq_path: "str | None" = None,
    binary_path: "str | None" = None,
    signature_id_col: str = "doc_id",
    ivf_id_col: str = "vec_id",
) -> "dict[str, bool]":
    """Apply one takedown batch to each given store; returns
    {store_kind: applied} where False means the tag was already
    committed there (replay no-op — the signature ledger has no replay
    memory, so its overwrite-exact re-apply reports True).

    ``ids`` is an iterable or a one-column DataFrame of doc ids; when
    a store keys by a different id (``ivf_id_col``), the same values
    are cast into that store's id space — pipelines that share one id
    across documents/embeddings (TESTDATA.md does) take down both
    sides with one call. A DataFrame of ids is planned once per store
    (each store's delete re-reads it), so pass a checkpointed/cached
    frame for very large batches."""
    from spark_indexedrdd_spark.functions import dedup as _dedup
    from spark_indexedrdd_spark.functions import ivf as _ivf
    from spark_indexedrdd_spark.functions import pq as _pq
    from spark_indexedrdd_spark.functions import quant as _quant
    from spark_indexedrdd_spark.functions import retrieval as _ret

    if not isinstance(ids, DataFrame):
        ids = list(ids)  # a generator must survive the second store
    out: "dict[str, bool]" = {}
    if postings_path is not None:
        out["postings"] = _ret.delete_postings_docs(
            spark, postings_path, ids, batch_tag
        )
    if signature_path is not None:
        _dedup.delete_signature_docs(
            spark, signature_path, ids, batch_tag, id_col=signature_id_col
        )
        out["signatures"] = True
    if ivf_path is not None:
        out["ivf"] = _ivf.delete_ivf_ids(
            spark, ivf_path, ids, batch_tag, id_col=ivf_id_col
        )
    if ivfpq_path is not None:
        out["ivfpq"] = _pq.delete_ivfpq_ids(
            spark, ivfpq_path, ids, batch_tag, id_col=ivf_id_col
        )
    if binary_path is not None:
        out["binary"] = _quant.delete_binary_ids(
            spark, binary_path, ids, batch_tag, id_col=ivf_id_col
        )
    return out
