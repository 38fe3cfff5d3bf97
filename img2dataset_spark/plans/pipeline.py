"""Config -> lazy DataFrame plan ("the physical plan is one DataFrame").

This is the Spark-native restatement of the reference's whole lifecycle
(/root/reference/img2dataset/main.py:119-274, SURVEY §3): the reference's
object graph distributor(downloader(reader -> fetch -> resize -> writer))
collapses to

    read -> select/rename -> shard id -> key -> fetch UDF -> hash verify
         -> transform UDF -> status columns -> (meta sink, payload sink,
            stats agg)

with Catalyst doing analysis/optimization and the Spark scheduler
replacing the distributor + retrier.

Status semantics (downloader.py:260-322):
  fetch error            -> status=failed_to_download, error_message set
  hash verify mismatch   -> status=failed_to_download, "hash mismatch"
  transform/filter error -> status=failed_to_resize, error_message set
  otherwise              -> status=success
Rejected rows are KEPT (payload nulled) — the true filter applies only
to payload sinks (SURVEY §2.2 note on P5-P7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from img2dataset_spark.config import PipelineConfig
from img2dataset_spark.functions.exif import make_exif_udf
from img2dataset_spark.functions.fetch import make_fetch_udf
from img2dataset_spark.functions.hashing import hash_column, hash_mismatch
from img2dataset_spark.functions.image import make_transform_udf
from img2dataset_spark.operators.sharding import with_key, with_shard_id
from img2dataset_spark.sources.reader import load

HASH_MISMATCH_ERROR = "hash mismatch"

META_FIXED_COLUMNS = [
    "key",
    "status",
    "error_message",
    "width",
    "height",
    "original_width",
    "original_height",
]


def build_pipeline(
    spark: SparkSession,
    config: PipelineConfig,
    input_df: DataFrame | None = None,
    start_shard_id: int = 0,
) -> DataFrame:
    """Lower a PipelineConfig to a lazy DataFrame.

    Returns a DataFrame with: input columns (canonical names, verify-hash
    column dropped per downloader.py:240-245) + key, status,
    error_message, width, height, original_width, original_height
    [+ exif] [+ hash col] [+ <encode_format> binary payload] + shard_id.
    """
    extra_cols = list(config.save_additional_columns or [])
    if config.bbox_col is not None and config.bbox_col not in extra_cols:
        # T9: the bbox column rides along as an additional column
        extra_cols.append(config.bbox_col)
    if input_df is None:
        df = load(
            spark,
            config.url_list,
            input_format=config.input_format,
            url_col=config.url_col,
            caption_col=config.caption_col,
            verify_hash=config.verify_hash,
            save_additional_columns=extra_cols or None,
        )
    else:
        df = input_df

    input_cols = list(df.columns)

    # [spark] pre-fetch canonical-URL dedup: one row survives per
    # canonical URL (functions/url.py rule set).  Runs BEFORE sharding
    # so shard geometry is computed over the deduplicated set.  One
    # shuffle on the canonical key; the survivor is deterministic —
    # smallest raw url, ties (byte-identical urls with different
    # payloads in other columns) broken by a hash of the whole row —
    # so reruns and partition recomputation pick the same rows.
    # NULL-url rows are EXEMPT (kept as-is): the reference fetches and
    # stats-reports every input row, and the window's null-equality
    # would otherwise keep a single survivor from all of them.  They
    # still share one window partition (row-numbered then all kept) —
    # fine while NULL urls are rare noise; a NULL-heavy feed should be
    # filtered explicitly upstream.
    if config.dedup_urls:
        from pyspark.sql import Window as _W

        from img2dataset_spark.functions.url import canonical_url

        tie = F.xxhash64(*[F.col(c).cast("string") for c in input_cols])
        w = _W.partitionBy("_canon_url").orderBy(F.col("url"), tie)
        df = (
            df.withColumn("_canon_url", canonical_url(F.col("url")))
            .withColumn("_url_rn", F.row_number().over(w))
            .filter(F.col("url").isNull() | (F.col("_url_rn") == 1))
            .drop("_canon_url", "_url_rn")
        )

    # R1 sharding + T12 keys.  Ordered mode = exact reference semantics
    # (contiguous shards in url order); unordered = shuffle-free.
    order_col = "url" if config.ordered_sharding else None
    df = with_shard_id(
        df,
        config.number_sample_per_shard,
        order_col=order_col,
        start_shard_id=start_shard_id,
    )
    if config.ordered_sharding:
        df = with_key(
            df,
            config.number_sample_per_shard,
            oom_shard_count=config.oom_shard_count,
        )
    else:
        # shuffle-light path: row index within shard via a window keyed on
        # shard_id (parallel across shards).  A source partition can hold
        # far more than number_sample_per_shard rows (file-split driven),
        # so sub-split it: the k-th chunk of N rows in partition p becomes
        # shard p + k*P (P = source partition count, so ids never collide
        # across partitions).  Without this, with_key's pmod(_row_idx, N)
        # wraps and rows N apart in the same partition get the SAME key —
        # silent overwrites in the files sink, duplicate tar members.
        # P is stable here: df is scan+withColumn only (no shuffle before
        # the window), so the planned partition count equals the runtime
        # spark_partition_id domain.
        from pyspark.sql import Window

        num_src_parts = df.rdd.getNumPartitions()
        w = Window.partitionBy("shard_id").orderBy("url")
        df = df.withColumn("_row_idx", F.row_number().over(w).cast("long") - 1)
        # start_shard_id offsets extend-mode resumes here too — without it
        # a rerun restarts at shard 0 and silently overwrites earlier
        # output files.
        df = df.withColumn(
            "shard_id",
            (
                F.col("shard_id")
                + F.lit(num_src_parts)
                * F.floor(F.col("_row_idx") / config.number_sample_per_shard)
                + F.lit(start_shard_id)
            ).cast("long"),
        )
        df = with_key(
            df,
            config.number_sample_per_shard,
            oom_shard_count=config.oom_shard_count,
        )

    # S9/S10/P3 fetch
    fetch = make_fetch_udf(
        timeout=config.timeout,
        retries=config.retries,
        user_agent_token=config.user_agent_token,
        disallowed_header_directives=config.disallowed_header_directives,
        ignore_ssl_certificate=config.ignore_ssl_certificate,
        thread_count=config.thread_count,
        mock=config.fetch_mode == "mock",
    )
    df = df.withColumn("_fetch", fetch(F.col("url")))

    # P4 hash verification on the raw fetched bytes (JVM built-ins)
    if config.verify_hash is not None:
        _, alg = config.verify_hash
        df = df.withColumn(
            "_hash_ok",
            F.when(
                F.col("_fetch.data").isNotNull(),
                ~hash_mismatch(F.col("_fetch.data"), F.col(alg), alg),
            ).otherwise(F.lit(None).cast("boolean")),
        )
    else:
        df = df.withColumn("_hash_ok", F.lit(True))

    # T1-T9 transform (decode -> P5-P7 filters -> resize -> blur -> encode,
    # fused into one Arrow-batched UDF)
    transform = make_transform_udf(
        resize_mode=config.resize_mode,
        image_size=config.image_size,
        resize_only_if_bigger=config.resize_only_if_bigger,
        min_image_size=config.min_image_size,
        max_image_area=config.max_image_area,
        max_aspect_ratio=config.max_aspect_ratio,
        encode_format=config.encode_format,
        encode_quality=config.encode_quality,
        disable_all_reencoding=config.disable_all_reencoding,
        skip_reencode=config.skip_reencode,
        mock=config.fetch_mode == "mock",
        with_blur=config.bbox_col is not None,
        upscale_interpolation=config.upscale_interpolation,
        downscale_interpolation=config.downscale_interpolation,
    )
    transform_args = [F.col("_fetch.data")]
    if config.bbox_col is not None:
        transform_args.append(F.col(config.bbox_col))
    df = df.withColumn(
        "_tr",
        F.when(
            F.col("_fetch.data").isNotNull() & F.col("_hash_ok"),
            transform(*transform_args),
        ),
    )

    # Status / error taxonomy
    df = df.withColumn(
        "status",
        F.when(F.col("_fetch.error").isNotNull(), F.lit("failed_to_download"))
        .when(~F.col("_hash_ok"), F.lit("failed_to_download"))
        .when(F.col("_tr.error").isNotNull(), F.lit("failed_to_resize"))
        .otherwise(F.lit("success")),
    ).withColumn(
        "error_message",
        F.when(F.col("_fetch.error").isNotNull(), F.col("_fetch.error"))
        .when(~F.col("_hash_ok"), F.lit(HASH_MISMATCH_ERROR))
        .otherwise(F.col("_tr.error")),
    )

    ok = F.col("status") == "success"

    # T13 dimensions
    for c in ("width", "height", "original_width", "original_height"):
        df = df.withColumn(c, F.when(ok, F.col(f"_tr.{c}")).cast("int"))

    # T10 exif
    if config.extract_exif:
        df = df.withColumn(
            "exif",
            F.when(ok, make_exif_udf()(F.col("_fetch.data"))).otherwise(F.lit(None)),
        )

    # T11 computed hash of ORIGINAL bytes (downloader.py:338-340); nulled
    # when the row failed (F3: mismatching row has null hash)
    hash_cols: list[str] = []
    for alg in dict.fromkeys(
        ([config.verify_hash[1]] if config.verify_hash else [])
        + ([config.compute_hash] if config.compute_hash else [])
    ):
        df = df.withColumn(
            alg,
            F.when(
                F.col("status") != "failed_to_download",
                hash_column(F.col("_fetch.data"), alg),
            ),
        )
        hash_cols.append(alg)

    # perceptual hash of the STORED payload (post-transform bytes — the
    # image downstream dedup actually compares); Arrow UDF returns NULL
    # for undecodable payloads, so mock-fetch rows carry NULL honestly
    if config.compute_phash:
        from img2dataset_spark.functions.phash import make_phash_udf

        df = df.withColumn(
            "phash", F.when(ok, make_phash_udf()(F.col("_tr.data")))
        )
        hash_cols.append("phash")

    # payload column named after the encode format (writer.py:69)
    df = df.withColumn(config.encode_format, F.when(ok, F.col("_tr.data")))

    # P2: drop the *expected* verify-hash input column (it was consumed) —
    # the computed column of the same algorithm name replaces it.
    out_input_cols = [c for c in input_cols if c != "url"]
    if config.verify_hash is not None and config.verify_hash[1] in out_input_cols:
        out_input_cols.remove(config.verify_hash[1])

    # T14 caption normalization: None -> "" (writer.py:82,123,193,277)
    if "caption" in df.columns:
        df = df.withColumn("caption", F.coalesce(F.col("caption"), F.lit("")))

    select_cols = (
        ["url"]
        + out_input_cols
        + META_FIXED_COLUMNS
        + (["exif"] if config.extract_exif else [])
        + hash_cols
        + [config.encode_format, "shard_id"]
    )
    return df.select(*select_cols)


def metadata_columns(df: DataFrame, config: PipelineConfig) -> DataFrame:
    """W6: the metadata projection (payload column excluded)."""
    return df.drop(config.encode_format)


def download(
    config: PipelineConfig,
    spark: SparkSession | None = None,
    input_df: DataFrame | None = None,
):
    """Reference-compatible entry point (main.py:73): build the plan and
    execute all sinks.  Returns the per-shard stats as a list of Rows."""
    from img2dataset_spark.plans.incremental import resolve_incremental
    from img2dataset_spark.sinks.shard_writer import write_output

    if spark is None:
        from img2dataset_spark.session import get_spark

        spark = get_spark()

    done_shards, start_shard_id = resolve_incremental(spark, config)
    df = build_pipeline(spark, config, input_df=input_df, start_shard_id=start_shard_id)

    def _minus_done(frame, done: set[int]):
        if not done:
            return frame
        # J1: broadcast anti-join against already-completed shards
        done_df = spark.createDataFrame([(int(s),) for s in done], "shard_id long")
        return frame.join(F.broadcast(done_df), "shard_id", "left_anti")

    # R4: Spark task retries (spark.task.maxFailures) handle transient
    # task failures; this outer loop adds the reference's SHARD-granular
    # end-of-job retry (distributor.py:10-21,36-38) — on a job abort,
    # re-run only the shards whose stats sidecar never landed.
    from img2dataset_spark.plans.incremental import existing_shard_ids

    def _run_with_retry(frame) -> list:
        attempts = 0
        remaining_df = _minus_done(frame, done_shards)
        while True:
            try:
                return list(write_output(remaining_df, config))
            except Exception:
                attempts += 1
                if attempts > config.max_shard_retry:
                    raise
                remaining_df = _minus_done(
                    frame, existing_shard_ids(config.output_folder)
                )

    if config.subjob_size is None:
        return _run_with_retry(df)

    # R2: subjob batching (distributor.py:45-58).  The reference submits
    # the shard list in batches of subjob_size, one Spark job per batch,
    # to bound in-flight work.  Spark-first restatement: process the
    # shard-id space in contiguous WAVES of subjob_size shards, each wave
    # its own action with its own incremental commit + retry scope.  The
    # wave filter sits right after the (cheap) shard-index computation and
    # BEFORE the fetch/transform UDFs, so per-wave cost is one input scan
    # plus the expensive work for only that wave's rows — at 100 TB this
    # bounds executor/fetch/shuffle state per job and makes a killed run
    # resumable at wave granularity (done-shard skip composes per wave).
    # Wave discovery collects the DISTINCT shard-id buckets (shard_id div
    # subjob_size) from a fetch-free projection of the same plan
    # (Catalyst prunes the UDF columns out of that scan; the collect is
    # bucket-count-sized).  Iterating buckets instead of the [min, max]
    # span means a SPARSE shard-id space (caller-supplied input_df, a
    # future numbering scheme) costs one wave per NON-EMPTY bucket —
    # no empty waves each paying a full input scan.  Each wave also
    # emits a '_wavestats.json' rollup sidecar (shard count, rows,
    # failures, wall) so a long run is monitorable mid-flight — see
    # sinks.shard_writer.write_wave_sidecar and
    # streaming.progress.wave_stats_stream.
    import time as _time

    from img2dataset_spark.sinks.shard_writer import write_wave_sidecar

    bucket_rows = (
        df.select(
            F.floor(F.col("shard_id") / config.subjob_size).cast("long").alias("b")
        )
        .distinct()
        .collect()
    )
    buckets = sorted(int(r["b"]) for r in bucket_rows if r["b"] is not None)
    stats: list = []
    for b in buckets:
        lo = b * config.subjob_size
        t0 = _time.time()
        wave = df.filter(
            (F.col("shard_id") >= lo) & (F.col("shard_id") < lo + config.subjob_size)
        )
        wave_stats = _run_with_retry(wave)
        stats.extend(wave_stats)
        write_wave_sidecar(
            config.output_folder,
            wave_id=b,
            lo_shard=lo,
            hi_shard=lo + config.subjob_size - 1,
            shard_stats=wave_stats,
            start_time=t0,
            end_time=_time.time(),
        )
    return stats
