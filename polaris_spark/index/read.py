"""Index readback utilities: decode segment tables back to logical rows."""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd

from .codec import decode_ints

TF_SCHEMA = "doc_id bigint, term string, tf bigint, dl bigint"


def postings_to_tf(spark, index_dir: str):
    """(doc_id, term, tf, dl) rows decoded from the postings segments —
    the logical inverse of the build's encode kernel (used by roundtrip
    checks and as the engine-side of the tokenize-tf correctness gate)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_doc, out_term, out_tf, out_dl = [], [], [], []
            for row in pdf.itertuples(index=False):
                docs = decode_ints(bytes(row.doc_ids), delta=True)
                tfs = decode_ints(bytes(row.tfs))
                dls = decode_ints(bytes(row.dls))
                out_doc.append(docs)
                out_tf.append(tfs)
                out_dl.append(dls)
                out_term.append(np.repeat(row.term, len(docs)))
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(out_doc),
                    "term": np.concatenate(out_term),
                    "tf": np.concatenate(out_tf).astype(np.int64),
                    "dl": np.concatenate(out_dl).astype(np.int64),
                }
            )

    posts = spark.read.parquet(os.path.join(index_dir, "postings"))
    return posts.select("term", "doc_ids", "tfs", "dls").mapInPandas(
        decode_batches, TF_SCHEMA
    )
