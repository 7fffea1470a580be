"""Web-crawl archive ingestion — WARC records into relational rows.

The front door of a crawl-derived training corpus: Common-Crawl-style
WARC archives (``sources/warc.py``) become the engine's document rows
here, after which the whole curation stack (dedup, quality, lang-id,
decontamination, PII scrub — operators/curation.py, text.py, dedup.py)
applies unchanged.

- :func:`warc_records` — ``(archive_id, rec_type, uri, date,
  content_type, n_bytes, payload)``: one zero-shuffle ``mapInPandas``
  pass; archives never leave the task that read them, only records
  flow on.
- :func:`warc_documents` — the text-document projection: response
  records decoded as UTF-8 ``(archive_id, uri, n_bytes, text)``,
  feeding the documents-shaped operators directly.

Scale shape: at 100 TB the archive table is (archive_id, payload
binary) from parquet/binaryFile; extraction is embarrassingly parallel
per archive; everything downstream is the already-audited curation
tier.  The gate query ``warc_extract`` roundtrips the sf documents
table through encode_warc (record-gzipped) -> warc_documents and
hash-matches the table itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def warc_records(
    archives: DataFrame,
    *,
    id_col: str = "archive_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Explode WARC archives (plain or record-gzipped) into one row per
    record."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pandas_sigproc_spark.sources.warc import decode_warc

        for pdf in batches:
            rows = {
                "archive_id": [],
                "rec_type": [],
                "uri": [],
                "date": [],
                "content_type": [],
                "n_bytes": [],
                "payload": [],
            }
            for aid, blob in zip(pdf[id_col], pdf[payload_col]):
                for rec in decode_warc(bytes(blob)):
                    rows["archive_id"].append(int(aid))
                    rows["rec_type"].append(rec["type"])
                    rows["uri"].append(rec["uri"])
                    rows["date"].append(rec["date"])
                    rows["content_type"].append(rec["content_type"])
                    rows["n_bytes"].append(len(rec["payload"]))
                    rows["payload"].append(rec["payload"])
            yield pd.DataFrame(rows)

    return archives.select(id_col, payload_col).mapInPandas(
        run,
        "archive_id long, rec_type string, uri string, date string,"
        " content_type string, n_bytes long, payload binary",
    )


def warc_documents(
    archives: DataFrame,
    *,
    id_col: str = "archive_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Response records as text documents: ``(archive_id, uri, n_bytes,
    text)`` — the decode is a JVM-side binary->string cast (UTF-8), not
    Python."""
    recs = warc_records(archives, id_col=id_col, payload_col=payload_col)
    return recs.filter(F.col("rec_type") == "response").select(
        "archive_id",
        "uri",
        "n_bytes",
        F.col("payload").cast("string").alias("text"),
    )


__all__ = ["warc_records", "warc_documents"]
