package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextFns

/** The EXACTLY-ONCE micro-batch frame shared by the three incremental
  * ingest pipelines (image/audio m12/m13, text m14, embedding m15). The
  * pipelines differ in their modality stages — signature vs MinHash vs
  * IVF-PQ probe — but the delivery contract is ONE design, and it lives
  * here so a fix applies once instead of three times (the `allowEmpty`
  * drift rule and the per-batch file-coalescing fix each had to be
  * hand-applied to all three copies before this existed):
  *
  *   - every output LANDS under an `ingest_batch=<id>` partition written
  *     with DYNAMIC partition overwrite ([[land]]) — a replayed
  *     micro-batch (kill/restart inside foreachBatch) overwrites its own
  *     partitions instead of appending duplicates;
  *   - every read a batch depends on is filtered to STRICTLY EARLIER
  *     batches ([[strictlyEarlier]]) — a replayed batch never sees its
  *     own crashed attempt, which is what makes the recompute
  *     deterministic and the overwrite idempotent;
  *   - reads survive an empty or crash-partial output directory
  *     ([[readOrEmpty]] — explicit schema, `_temporary` invisible);
  *   - the stream wrapper ([[fileStream]]) replays an interrupted batch
  *     under the SAME id (offsets are logged before foreachBatch runs),
  *     closing the loop with the two rules above;
  *   - per-batch index/state THUNKS are re-resolved every micro-batch by
  *     the pipelines (so compactions/rebuilds take effect live), and the
  *     dedup frame ([[withRepresentative]] + [[rejectReason]]) tolerates
  *     the resulting overlap windows by aggregating pair sources with
  *     min() before deciding.
  */
object Frame {

  /** Read `dir` with an explicit schema, or an empty relation when the
    * directory does not exist yet — incremental reads must survive the
    * first batch (nothing landed) and crash-partial outputs (only
    * `_temporary`, which parquet reads ignore).
    */
  def readOrEmpty(spark: SparkSession, dir: String, schema: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  /** The landed rows batch `belowBatch` is allowed to SEE: strictly
    * earlier batches only. The strict inequality is the exactly-once
    * linchpin — a replayed batch reading `<= id` would consume its own
    * crashed attempt and diverge from the first run.
    */
  def strictlyEarlier(spark: SparkSession, dir: String, schema: String,
      belowBatch: Long): DataFrame =
    readOrEmpty(spark, dir, schema).filter(col("ingest_batch") < belowBatch)

  /** Land one batch output under `ingest_batch=batchId` (+`extraParts`)
    * with dynamic partition overwrite — the idempotent-replay write.
    * `coalesceTo`: per-batch partitions written at shuffle width land
    * dozens of tiny files, and every later batch's corpus read pays
    * per-file overhead for ALL of them — file count, not row count, is
    * the accumulating term in a long-running loop. Pass None only when
    * the input's width is already controlled (e.g. a shard repartition).
    */
  def land(df: DataFrame, outDir: String, sub: String, batchId: Long,
      extraParts: Seq[String] = Nil, coalesceTo: Option[Int] = None): Unit =
    coalesceTo.fold(df)(df.coalesce)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(("ingest_batch" +: extraParts): _*)
      .parquet(s"$outDir/$sub")

  /** The streaming wrapper every pipeline shares: a parquet file stream,
    * one file per micro-batch (deterministic batch boundaries), driven
    * through `body(batch, batchId)`. The checkpoint replays an
    * interrupted batch under the same id; [[land]]'s partition overwrite
    * makes that replay exactly-once.
    */
  def fileStream(spark: SparkSession, srcDir: String, schema: String,
      checkpoint: String)(body: (DataFrame, Long) => Unit): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(body)
      .start()

  /** Attach each row's intra-batch component REPRESENTATIVE: left-join
    * the connected-components relation (id, cluster) on `idCol`, rep =
    * the component's min id, or the row's own id when it paired with
    * nothing. Rows with `idCol == rep` are the batch's representatives —
    * the only rows that probe the corpus.
    */
  def withRepresentative(df: DataFrame, idCol: String, comp: DataFrame): DataFrame =
    df.join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("rep", coalesce(col("cluster"), col(idCol)))

  /** The shared three-way admit decision, as a column over a frame that
    * carries (`idCol`, rep, corpus_dup_of): a non-representative is a
    * batch_dup of its rep; a representative whose probe hit the corpus
    * is a corpus_dup of the (min) match; everything else admits (NULL).
    */
  def rejectReason(idCol: String): Column =
    when(col(idCol) =!= col("rep"),
      concat(lit("batch_dup:"), col("rep").cast("string")))
      .when(col("corpus_dup_of").isNotNull,
        concat(lit("corpus_dup:"), col("corpus_dup_of").cast("string")))
      .otherwise(lit(null).cast("string"))

  /** The m11-contract export shard of a row: deterministic
    * md5(id) mod nShards — stable across engines, replays, and cluster
    * sizes (a hash-shuffle partition id would be none of those).
    */
  def shardOf(idCol: String, nShards: Int): Column =
    pmod(TextFns.md5Hash32(col(idCol).cast("string")), lit(nShards.toLong))

  /** Drop a managed table AND any orphaned warehouse directory (a fresh
    * in-memory catalog may not know a table whose directory survives
    * from an earlier JVM — CTAS refuses such a location).
    */
  def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.delete(wh, true)
  }
}
