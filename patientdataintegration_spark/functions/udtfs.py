"""Python UDTFs (Spark 4 user-defined TABLE functions) — the one
API surface of the modern PySpark function stack the engine did not
yet exercise: a per-row function that RETURNS A RELATION, consumed
via LATERAL join.

The reference's per-row micro-pipeline (`dataset_classes_v1.py`
`__getitem__`: one input row -> several derived records) is exactly
this shape; `ChunkTextUDTF` demonstrates it on the documents table
with semantics IDENTICAL to the native-Column q81 chunking operator
(window 64 tokens, stride 48), so the UDTF lane inherits q81's
hash-exact DuckDB oracle.

Performance stance: a UDTF is Python-row-path (Arrow-batched when
`useArrow` is on, but still per-row Python) — the SLOW lane. It is
registered as API-surface proof; the production chunker remains the
native expression in `textops` (q81). The plan test pins that the
native version stays whole-stage-codegen while this one shows the
BatchEvalPythonUDTF node."""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="doc_id: bigint, chunk_id: bigint, chunk_text: string, n_chunk_tokens: bigint")
class ChunkTextUDTF:
    """Sliding-window chunking, bit-compatible with q81: tokens =
    lower(trim(text)) split on single spaces (empty tokens kept —
    string_split parity); chunk c covers tokens [c*48, c*48+64);
    chunk count = floor((max(n-16,1)-1)/48)+1."""

    def eval(self, doc_id: int, text: str):  # noqa: D102
        if text is None:
            # split(NULL) propagates NULL in SQL: the native q81
            # chunker and the DuckDB oracle emit ZERO rows for a NULL
            # document — matching that here keeps the q182 lane
            # hash-stable on corpora with NULL texts.
            return
        tokens = text.strip(" ").lower().split(" ")  # strip SPACES only: SQL TRIM parity
        n = len(tokens)
        n_chunks = (max(n - 16, 1) - 1) // 48 + 1
        for cid in range(n_chunks):
            piece = tokens[cid * 48 : cid * 48 + 64]
            yield doc_id, cid, " ".join(piece), len(piece)


def register_udtfs(spark) -> None:
    """Register every engine UDTF for SQL/LATERAL use."""
    spark.udtf.register("chunk_text", ChunkTextUDTF)
