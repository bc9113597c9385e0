"""Custom stateful streaming operators: per-host running ingest totals
and a bounded-memory streaming frequent-items summary.

``applyInPandasWithState`` is Structured Streaming's arbitrary-state hook —
the engine's genuinely stateful custom operators (the brief's
"applyInPandasWithState for custom stateful operators"). State for the
totals operator is the per-host running (pages, bytes, batches) triple,
persisted in the checkpoint: kill the query, restart with the same
checkpoint dir, and the totals continue from the committed state instead
of recounting (the streaming mirror of the batch path's snapshot/anti-join
resume).

Each micro-batch emits one row per host seen IN THAT BATCH with its
running totals so far — an append-mode changelog of the running aggregate
(watermark-free: state never expires; bounded by host cardinality, which
at crawl scale is ~10^7 hosts x ~32 B — trivially executor-resident).

The frequent-items operator (``streaming_heavy_hitters``) is the
streaming face of ``operators/heavyhitters.py``: per group key it keeps a
Misra-Gries table of at most ``m`` counters in checkpointed state — O(m)
state per group FOREVER, regardless of how many distinct tokens the
stream ever carries (an exact streaming count would grow state with the
vocabulary: unbounded on a crawl). Each batch emits the group's current
summary as a changelog: every retained token with its lower-bound count,
the exact running token total, and the batch ordinal. The MG guarantee
transfers: after any prefix of the stream, every token with frequency
> n_total/(m+1) over that prefix is PRESENT in the emitted summary
(retained counts are lower bounds — a downstream exact recount promotes
candidates to exact counts, exactly like the batch operator's pass 2)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "pages long, bytes long, batches long"
OUTPUT_SCHEMA = "host string, pages long, bytes long, batches long"


def _update_host_totals(key, pdfs, state: GroupState):
    pages, nbytes, batches = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        pages += len(pdf)
        nbytes += int(pdf["n_bytes"].sum())
    batches += 1
    state.update((pages, nbytes, batches))
    yield pd.DataFrame(
        {"host": [key[0]], "pages": [pages], "bytes": [nbytes], "batches": [batches]}
    )


def host_running_totals(pages_stream: DataFrame) -> DataFrame:
    """pages stream -> per-host running totals changelog (stateful)."""
    keyed = pages_stream.select(
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.coalesce(F.octet_length("html"), F.lit(0)).alias("n_bytes"),
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _update_host_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MG_STATE_SCHEMA = "tokens array<string>, counts array<long>, n_total long, batches long"
MG_OUTPUT_SCHEMA = ("grp string, token string, count_lb long, "
                    "n_total long, batch_ord long")


def _mg_update_fn(m: int):
    """Factory closing over the counter budget (the state hook's function
    signature carries no extra args)."""

    def update(key, pdfs, state: GroupState):
        if state.exists:
            toks, counts, n_total, batches = state.get
            table = dict(zip(toks, counts))
        else:
            table, n_total, batches = {}, 0, 0
        for pdf in pdfs:
            for arr in pdf["toks"]:
                for tok in arr:
                    n_total += 1
                    c = table.get(tok)
                    if c is not None:
                        table[tok] = c + 1
                    elif len(table) < m:
                        table[tok] = 1
                    else:
                        dead = [t for t, v in table.items() if v == 1]
                        for t in table:
                            table[t] -= 1
                        for t in dead:
                            del table[t]
        batches += 1
        state.update(
            (list(table), [int(v) for v in table.values()], n_total, batches)
        )
        yield pd.DataFrame(
            {
                "grp": [key[0]] * len(table),
                "token": list(table),
                "count_lb": [int(v) for v in table.values()],
                "n_total": [n_total] * len(table),
                "batch_ord": [batches] * len(table),
            }
        )

    return update


def streaming_heavy_hitters(tokens_stream: DataFrame, m: int = 32,
                            group_col: str = "grp",
                            tokens_col: str = "toks") -> DataFrame:
    """(group, token array) stream -> per-group Misra-Gries summary
    changelog (stateful, O(m) checkpointed state per group). Emits the
    whole retained table each batch: at most ``m`` rows per group per
    batch, with exact running n_total and the batch ordinal so readers
    can select the latest summary per group."""
    keyed = tokens_stream.select(
        F.col(group_col).alias("grp"), F.col(tokens_col).alias("toks")
    )
    return keyed.groupBy("grp").applyInPandasWithState(
        _mg_update_fn(m),
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_host_totals_stream(spark, input_dir: str, output_dir: str,
                             checkpoint_dir: str, max_files_per_trigger: int = 8):
    """File source -> stateful running totals -> parquet changelog sink."""
    from .extract_stream import read_pages_stream

    out = host_running_totals(read_pages_stream(spark, input_dir, max_files_per_trigger))
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
