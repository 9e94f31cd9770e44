"""Streaming per-key rate-limit (quota) gate — admission control at the
well.

The production shape for ingest quotas at 100 TB: each micro-batch of
events receives an admit/throttle verdict AT ARRIVAL against a per-key
quota (here: ``quota`` events per (user_id, day)), instead of landing
everything and sampling in batch.  One Structured Streaming query:
``foreachBatch`` unions the new arrivals with the bounded admitted-set
state (≤ quota rows per key — the state NEVER holds throttled events),
re-ranks each touched key by the deterministic admission order
``(ts, event_id)``, and commits two snapshot tables — admitted-set state
and the decision ledger — batch-id-guarded (checkpoint re-delivery is
exactly-once).

Arrival-order robustness (the certified property): the admitted set per
key only ever moves toward the (ts, event_id)-minimal ``quota`` events,
so under ANY arrival order the gate converges to the batch truth —
``ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY ts, event_id)
<= quota`` — with LATE DEMOTION: an admitted event is revised to
throttled when enough earlier-keyed events for its (user, day) arrive
late (the production reality of unordered ingest; under ordered replay
demotions are provably empty).  A demoted event can never be
re-admitted — the admitted set is monotone — so decisions are stable
once their key's earlier events have all arrived.

Δ-shape per batch: only keys touched by the batch are re-ranked (one
semi-join against the state), state stays ≤ quota rows per key, and the
decision ledger is append + targeted revision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def run_streaming_rate_gate(
    spark: SparkSession,
    sf_dir: str,
    base_path: str,
    quota: int = 2,
    n_chunks: int = 4,
    arrival_rank: list[int] | None = None,
) -> DataFrame:
    """Replay ``events`` as ``n_chunks`` event-id-range JSON arrivals
    through the quota gate (``arrival_rank`` shuffles delivery order);
    returns the decision table ``(event_id, user_id, d, is_admitted)``
    covering every event."""
    from bakery_big_data_spark.sources.snapshots import (
        last_commit_meta,
        read_snapshot,
        table_exists,
        write_snapshot,
    )
    from bakery_big_data_spark.sources.tables import load_table
    from bakery_big_data_spark.streaming.dedup_gate import (
        write_ordered_json_chunks,
    )
    from bakery_big_data_spark.streaming.ingest import (
        JSON_OPTIONS,
        read_json_stream,
    )

    src = f"{base_path}/stream_src"
    ckpt = f"{base_path}/ckpt"
    adm_path = f"{base_path}/admitted_state"
    dec_path = f"{base_path}/decisions"

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id"
    )
    write_ordered_json_chunks(
        events, src, "event_id", n_chunks, arrival_rank,
        json_options=JSON_OPTIONS,
    )

    def _applied(path: str, bi: int) -> bool:
        meta = last_commit_meta(path)
        return meta is not None and meta.get("batch", -1) >= bi

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        bi = int(batch_id)
        if all(_applied(p, bi) for p in (adm_path, dec_path)):
            return  # checkpoint re-delivery of a fully-applied batch
        new = batch_df.select(
            "event_id", "ts", "user_id", F.to_date("ts").alias("d")
        ).localCheckpoint()

        state = (
            read_snapshot(spark, adm_path)
            if table_exists(adm_path)
            else None
        )
        touched = new.select("user_id", "d").distinct()
        if state is not None:
            # Δ-shape: only re-rank the keys this batch touches.
            old_touched = state.join(touched, ["user_id", "d"], "left_semi")
            untouched = state.join(touched, ["user_id", "d"], "left_anti")
            combined = old_touched.unionByName(new)
        else:
            untouched = None
            combined = new
        w = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
        ranked = combined.withColumn("_rk", F.row_number().over(w))
        admitted_now = ranked.filter(F.col("_rk") <= quota).drop("_rk")
        new_state = (
            admitted_now.unionByName(untouched)
            if untouched is not None
            else admitted_now
        )

        if not _applied(adm_path, bi):
            write_snapshot(new_state, adm_path, meta={"batch": bi})
        if not _applied(dec_path, bi):
            adm_ids = admitted_now.select("event_id")
            dec_new = new.select("event_id", "user_id", "d").join(
                adm_ids.withColumn("_adm", F.lit(True)), "event_id", "left"
            ).select(
                "event_id",
                "user_id",
                "d",
                F.coalesce(F.col("_adm"), F.lit(False)).alias("is_admitted"),
            )
            if table_exists(dec_path):
                prev = read_snapshot(spark, dec_path)
                # late demotion: a previously-admitted event of a touched
                # key that lost its slot to earlier-keyed late arrivals is
                # revised to throttled; never re-admitted (monotone set).
                prev_touched = prev.join(
                    touched, ["user_id", "d"], "left_semi"
                )
                prev_rest = prev.join(touched, ["user_id", "d"], "left_anti")
                revised = prev_touched.drop("is_admitted").join(
                    adm_ids.withColumn("_adm", F.lit(True)), "event_id", "left"
                ).select(
                    "event_id",
                    "user_id",
                    "d",
                    F.coalesce(F.col("_adm"), F.lit(False)).alias(
                        "is_admitted"
                    ),
                )
                out = prev_rest.unionByName(revised).unionByName(dec_new)
            else:
                out = dec_new
            write_snapshot(out, dec_path, meta={"batch": bi})

    q = (
        read_json_stream(
            spark,
            src,
            schema_ddl="event_id LONG, ts TIMESTAMP, user_id LONG",
            max_files_per_trigger=1,
        )
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .queryName("rate_limit_gate")
        .start()
    )
    q.awaitTermination()
    return read_snapshot(spark, dec_path)
