"""The sanctioned Python escape hatches, demonstrated (SURVEY §2.10 /
pyspark_guide "UDFs are the slow path").

Policy in this engine: data-touching Python is allowed ONLY through
Arrow-batched surfaces, and only where no built-in expresses the
semantics. The hot paths everywhere else are JVM expressions. This
module demonstrates the two remaining Arrow surfaces not already used
by the codec/grouped/stateful operators (`mapInPandas`,
`applyInPandas`, `applyInPandasWithState`):

- a scalar ``@pandas_udf`` (vectorized numpy per Arrow batch), and
- a Python UDTF (``@udtf``, Spark 4) — a table function usable from
  both the DataFrame API and ``spark.sql`` LATERAL position.

Each ships with an equivalence test against a pure-JVM formulation —
the proof that the built-in path stays available and value-identical,
so reaching for Python remains a choice, not a trap.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf(T.DoubleType())
def byte_entropy_pdf(texts: pd.Series) -> pd.Series:
    """Shannon entropy (bits/byte) of each value's UTF-8 bytes —
    vectorized numpy over the whole Arrow batch (one Python call per
    ~10k rows, not per row). The JVM twin for the equivalence test is
    the nats-domain char-entropy fold in
    plans/analytics_queries.char_entropy_quality; this byte-domain
    variant is what a compression-ratio quality gate uses."""
    import numpy as np

    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if b.size == 0:
            out.append(0.0)
            continue
        counts = np.bincount(b, minlength=256).astype(np.float64)
        p = counts[counts > 0] / b.size
        out.append(float(-(p * np.log2(p)).sum()))
    # nullable dtype: None must reach Spark as NULL, not NaN — plain
    # float64 coerces None→NaN, which Spark treats as a VALUE (ADVICE
    # r6; same discipline as image_average_hash's Int64).
    return pd.Series(pd.array(out, dtype="Float64"))


@udtf(returnType="sent_idx: long, sentence: string, n_tokens: long")
class SentenceSplitter:
    """Python UDTF (Spark 4): one input text row → one row per
    sentence, with its index and whitespace token count. The UDTF
    surface matters because it composes in LATERAL position from pure
    SQL — the table-function analog of the scalar escape hatch.

    Sentence boundary = '.', '!' or '?' followed by whitespace/end —
    deliberately the same splittable-by-regex contract as the JVM twin
    (explode(split(...))) used in the equivalence test.
    """

    def eval(self, text: str):
        import re

        if text is None:
            return
        for i, raw in enumerate(re.split(r"(?<=[.!?])\s+", text)):
            s = raw.strip()
            if s:
                yield i, s, len([w for w in s.split(" ") if w])


BYTE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_chars", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)


def utf8_byte_stats_arrow(df, id_col: str = "doc_id", text_col: str = "text"):
    """``mapInArrow`` demo (r7): the RAW Arrow RecordBatch surface —
    batches enter and leave as ``pyarrow.RecordBatch`` with ZERO
    pandas conversion, and the per-batch work is pyarrow.compute
    kernels (C++-vectorized), not Python loops. Completes the Python
    escape-hatch matrix next to ``mapInPandas`` / ``applyInPandas`` /
    ``applyInPandasWithState`` / scalar ``pandas_udf`` / ``udtf``:
    this is the surface to pick when the payload is already Arrow-
    native (tensors, large binary) and the pandas round-trip is pure
    overhead.

    Computes per-row char count (``utf8_length``) and UTF-8 byte count
    (``binary_length`` after a binary cast); nulls propagate through
    the kernels exactly as the JVM twin (``length`` /
    ``octet_length``) propagates them — asserted by the equivalence
    test. Demo surface only: the production queries keep these
    expressions JVM-side.
    """
    import pyarrow as pa

    def run(batches):
        import pyarrow.compute as pc

        for batch in batches:
            texts = batch.column(text_col)
            out = pa.RecordBatch.from_arrays(
                [
                    batch.column(id_col),
                    pc.cast(pc.utf8_length(texts), pa.int32()),
                    pc.cast(
                        pc.binary_length(pc.cast(texts, pa.binary())), pa.int32()
                    ),
                ],
                names=["doc_id", "n_chars", "n_bytes"],
            )
            yield out

    return df.select(id_col, text_col).mapInArrow(run, BYTE_STATS_SCHEMA)
