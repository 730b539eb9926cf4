"""Typed stored-field document store with fetch-time decode.

The reference stores config-typed fields in Bleve documents and
decodes them on fetch (``internal/server/handler.go:104-138``
``getDocId``): TextField → string, NumericField → float64,
BooleanField → bool, DateTimeField → RFC3339 string. This module is
the Spark-side equivalent: documents validated against an
:class:`..configs.IndexConfig` land in a typed parquet table (string →
STRING, number → DOUBLE, bool → BOOLEAN, timestamp → TIMESTAMP) and
are decoded back to the reference's JSON shape on fetch — including
the number/bool round-trip the transcripts schema alone never
exercises.

Writes are append-only with a monotonically increasing ``seq``;
reads are merge-on-read last-write-wins per doc_id (the same LSM
discipline as :class:`..streaming.StreamingIndex`), so the store
scales as an ordinary partitioned parquet/Iceberg table.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .configs import IndexConfig
from .validate import validate_document

_SPARK_TYPES = {
    "string": "STRING",
    "number": "DOUBLE",
    "bool": "BOOLEAN",
    "timestamp": "TIMESTAMP",
}

RFC3339 = "%Y-%m-%dT%H:%M:%SZ"


class DocStore:
    """One config-typed document table rooted at ``root``."""

    def __init__(self, spark: SparkSession, cfg: IndexConfig, root: str):
        self.spark = spark
        self.cfg = cfg
        self.root = root
        self.data_dir = os.path.join(root, "docs")
        os.makedirs(self.data_dir, exist_ok=True)
        self._seq = len(os.listdir(self.data_dir))

    # -- write ------------------------------------------------------------

    def schema_ddl(self) -> str:
        cols = ", ".join(f"`{f.name}` {_SPARK_TYPES[f.type]}" for f in self.cfg.fields)
        return f"doc_id STRING, _seq LONG, {cols}"

    def _encode(self, doc: dict) -> dict:
        """JSON shape → typed row values (validate first, like reference
        AddDocument → validate.Validate)."""
        validate_document(self.cfg, doc)
        out = {}
        for f in self.cfg.fields:
            v = doc[f.name]
            if f.type == "number":
                v = float(v)
            elif f.type == "timestamp":
                v = datetime.strptime(v, RFC3339).replace(tzinfo=timezone.utc)
            out[f.name] = v
        return out

    def put_all(self, docs: dict[str, dict]) -> None:
        """Upsert a batch of {doc_id: document} (LWW via append + seq)."""
        self._seq += 1
        seq = self._seq
        rows = []
        for doc_id, doc in sorted(docs.items()):
            enc = self._encode(doc)
            rows.append((doc_id, seq, *[enc[f.name] for f in self.cfg.fields]))
        df = self.spark.createDataFrame(rows, self.schema_ddl())
        df.write.mode("append").parquet(self.data_dir)

    # -- read -------------------------------------------------------------

    def _current(self) -> DataFrame:
        d = self.spark.read.parquet(self.data_dir)
        w = Window.partitionBy("doc_id").orderBy(F.desc("_seq"))
        return (
            d.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_seq")
        )

    def fetch_df(self, doc_ids: list[str] | None = None) -> DataFrame:
        """Decoded stored fields as a DataFrame — the getDocId response
        shape, in-plan: numbers stay DOUBLE, bools BOOLEAN, timestamps
        are formatted RFC3339 (UTC) exactly like Go ``time.RFC3339``."""
        cur = self._current()
        if doc_ids is not None:
            cur = cur.where(F.col("doc_id").isin(doc_ids))
        cols = [F.col("doc_id")]
        for f in self.cfg.fields:
            if f.type == "timestamp":
                cols.append(
                    F.date_format(
                        F.col(f.name).cast("timestamp_ltz"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
                    ).alias(f.name)
                )
            else:
                cols.append(F.col(f.name))
        return cur.select(*cols).orderBy("doc_id")

    def get(self, doc_id: str) -> dict | None:
        """Point fetch, decoded to the reference's JSON field map."""
        rows = self.fetch_df([doc_id]).collect()
        if not rows:
            return None
        r = rows[0].asDict()
        r.pop("doc_id")
        return r
