"""Streaming sketch maintenance: corpus statistics that never re-scan.

Keeps a HyperLogLog register table (operators/sketches.py) current over
an unbounded page stream: each micro-batch folds its own registers into
the committed state via union+max. Because max-merge is COMMUTATIVE and
IDEMPOTENT, a crash-replayed batch (foreachBatch redelivery) re-merges
to the identical state — this sketch needs no batch ledger at all,
unlike the count-sum DDSketch (dd_merge) or the corpus appends, which
pair with the commit-or-skip ledger in streaming/ingest.py.

State size is ``groups x 256`` rows forever; estimates come from
``hll_estimate`` over the committed registers at read time — the
"how many distinct hosts/urls have we ever seen" dashboard number at
O(1) cost per refresh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketches import hll_estimate, hll_merge_registers, hll_registers
from ..sources.iceberg_lite import IcebergLiteTable


class HllIngest:
    """foreachBatch sink maintaining a grouped HLL register table."""

    def __init__(self, root: str, group_col: str, key_col: str):
        self.table = IcebergLiteTable(root)
        self.group_col, self.key_col = group_col, key_col

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        delta = hll_registers(batch, self.group_col, self.key_col)
        stored = self.table.read(spark) if self.table.exists() else None
        merged = hll_merge_registers(stored, delta).persist()
        merged.count()  # materialize before the old snapshot is replaced
        self.table.overwrite(merged, properties={"batch_id": str(batch_id)})
        merged.unpersist()

    def estimates(self, spark: SparkSession) -> DataFrame | None:
        if not self.table.exists():
            return None
        return hll_estimate(self.table.read(spark))


def start_hll_ingest(pages: DataFrame, root: str, checkpoint: str,
                     group_col: str, key_col: str):
    """Wire a streaming DataFrame into the register maintenance."""
    ingest = HllIngest(root, group_col, key_col)
    return (
        pages.writeStream.foreachBatch(
            lambda df, bid: ingest.process_batch(df, bid)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
