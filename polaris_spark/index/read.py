"""Index readback utilities: decode segment tables back to logical rows."""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd

from .codec import decode_ints, decode_positions

TF_SCHEMA = "doc_id bigint, term string, tf bigint, dl bigint"
TF_SCHEMA_POS = TF_SCHEMA + ", pos array<int>"


def postings_to_tf(spark, index_dir: str, with_pos: bool = False,
                   chunks: list[int] | None = None):
    """(doc_id, term, tf, dl[, pos]) rows decoded from the postings segments
    — the logical inverse of the build's encode kernel (used by roundtrip
    checks, compaction, and as the engine-side of the tokenize-tf
    correctness gate). ``with_pos=True`` additionally decodes per-posting
    position arrays (requires a positions=True index). ``chunks`` restricts
    the decode to those chunk partitions (dir-pruned at file listing) —
    compaction passes the PUBLISHED set so a dead unpublished generation is
    never folded into the merged index."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_doc, out_term, out_tf, out_dl = [], [], [], []
            out_pos: list = []
            for row in pdf.itertuples(index=False):
                docs = decode_ints(bytes(row.doc_ids), delta=True)
                tfs = decode_ints(bytes(row.tfs))
                dls = decode_ints(bytes(row.dls))
                out_doc.append(docs)
                out_tf.append(tfs)
                out_dl.append(dls)
                out_term.append(np.repeat(row.term, len(docs)))
                if with_pos:
                    if getattr(row, "pos", None) is None:
                        raise ValueError(
                            "with_pos requires an index built with positions=True"
                        )
                    out_pos.extend(
                        [int(x) for x in p]
                        for p in decode_positions(bytes(row.pos), tfs)
                    )
            out = {
                "doc_id": np.concatenate(out_doc),
                "term": np.concatenate(out_term),
                "tf": np.concatenate(out_tf).astype(np.int64),
                "dl": np.concatenate(out_dl).astype(np.int64),
            }
            if with_pos:
                out["pos"] = out_pos
            yield pd.DataFrame(out)

    posts = spark.read.parquet(os.path.join(index_dir, "postings"))
    if chunks is not None and "chunk" in posts.columns:
        from pyspark.sql import functions as F

        posts = posts.where(F.col("chunk").isin([int(c) for c in chunks]))
    cols = ["term", "doc_ids", "tfs", "dls"]
    if with_pos:
        cols.append("pos")
    return posts.select(*cols).mapInPandas(
        decode_batches, TF_SCHEMA_POS if with_pos else TF_SCHEMA
    )
