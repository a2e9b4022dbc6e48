"""Multimodal column plumbing (SURVEY §2.4): opaque binary payloads with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is stubbed
(`decode_image` raises ``NotImplementedError``; `extract_features` computes
real, deterministic byte-level features) — but the Spark-side plumbing is
the production shape: binary column in, ``mapInPandas`` with an explicit
output schema, Arrow batches end-to-end, per-partition processing with no
driver involvement, so it scales with executors × partitions.

The testdata has no binary column; payloads are materialized as the UTF-8
encoding of ``documents.text``, which keeps the operator oracle-checkable
(octet_length/md5 are byte-exact in DuckDB).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, n_bytes int, content_md5 string, is_ascii boolean"


def decode_image(payload: bytes) -> object:
    """Decode an image payload. Codec libraries are not available in this
    environment; the Spark plumbing around this stub is real and tested."""
    raise NotImplementedError("image codecs not available in this environment")


def with_binary_payload(documents: DataFrame) -> DataFrame:
    """Attach the opaque binary column (UTF-8 bytes of text)."""
    return documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


def extract_features(documents: DataFrame) -> DataFrame:
    """binary payload → typed metadata via Arrow-batched mapInPandas.

    The batch function is a nested closure so cloudpickle ships it by
    value — executors need no import path to this package (the engine may
    be driven from any cwd, and a real cluster's workers never have the
    driver's sys.path).
    """

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        # One Arrow batch in, one out: vectorized byte-level features.
        for pdf in batches:
            payloads = pdf["payload"]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "content_md5": payloads.map(
                        lambda b: _hashlib.md5(b).hexdigest()
                    ),
                    "is_ascii": payloads.map(lambda b: all(x < 128 for x in b)),
                }
            )

    return with_binary_payload(documents).mapInPandas(
        feature_batches, schema=FEATURE_SCHEMA
    )
