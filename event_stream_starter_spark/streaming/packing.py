"""Streaming sequence packing: the x_pack_sequences prefix sum as keyed
state (training-data ingest that packs docs into fixed token budgets as
they arrive, instead of re-scanning the corpus per run).

The batch form is a window prefix-sum per source; the streaming form
carries ONE number per source — tokens packed so far — as GroupState,
so each micro-batch extends the packed layout in O(batch) with no
history re-scan (the HLL-rollup / incremental-minhash pattern applied
to packing). Reference analog: the since_id cursor of the X poller
(worker/jobs/x_kol_poll.py:120-143) — monotonic intake per key with
cursor state.

ORDERING CONTRACT: assignments equal the batch query iff docs arrive in
doc_id order per source (batches sorted internally; monotonic across
batches) — the append-only ingest contract every incremental packer
needs. A doc arriving behind the cursor would get a later position than
the batch recompute; the state cannot reorder already-emitted history.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators import textan

# Canonical tokens-per-packed-sequence budget; queries/textdata.py's
# batch x_pack_sequences imports THIS constant (single source — the
# streaming packer's contract is bit-equality with the batch layout).
PACK_BUDGET = 512

STATE_SCHEMA = StructType([StructField("cum", LongType())])

OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("ntok", LongType()),
        StructField("seq_id", LongType()),
        StructField("seq_offset", LongType()),
        StructField("seq_end", LongType()),
    ]
)


def _pack_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (cum,) = state.get if state.exists else (0,)
    rows = pd.concat(list(pdfs)).sort_values("doc_id")
    ntok = rows["ntok"].astype("int64")
    cum_prev = int(cum) + ntok.cumsum().shift(fill_value=0).astype("int64")
    out = pd.DataFrame(
        {
            "doc_id": rows["doc_id"].astype("int64"),
            "source": key[0],
            "ntok": ntok,
            "seq_id": cum_prev // PACK_BUDGET,
            "seq_offset": cum_prev % PACK_BUDGET,
            "seq_end": (cum_prev + ntok.clip(lower=1) - 1) // PACK_BUDGET,
        }
    )
    state.update((int(cum) + int(ntok.sum()),))
    yield out


def packing_stream(docs: DataFrame) -> DataFrame:
    """Streaming packed-layout assignments for a documents stream.

    Token counting stays a JVM column expression; only the per-source
    cursor arithmetic (a cumsum over the sorted batch) runs in the
    Arrow-batched state function. State is 8 bytes per source — the
    smallest possible stateful operator.
    """
    ntok = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)).otherwise(
        F.size(textan.tokens(F.col("text")))
    )
    prepared: Any = docs.select(
        "doc_id", "source", ntok.cast("long").alias("ntok")
    )
    return prepared.groupBy("source").applyInPandasWithState(
        _pack_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
