package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2 #75 — streaming CORPUS INGEST: the front-end a continuously-fed
  * training-data pipeline runs on arriving documents — quality gate,
  * content fingerprint, watermark-bounded exact dedup — as one
  * Structured Streaming pipeline whose per-document decisions are
  * EXACTLY the batch operators' (the spec proves the kept fingerprint
  * set equals batch exact-dedup's distinct set, and the quality gate
  * admits exactly the batch qualityFilter's docs).
  *
  * Scale shape: the gate and fingerprint are map-only (codegen'd
  * built-ins over each micro-batch); dedup state is the watermark
  * horizon's fingerprints only — bounded, unlike a plain dropDuplicates
  * whose state grows with the corpus. Arrival time is stamped at the
  * source (processing time), which is what a real ingest tier does when
  * documents carry no event time.
  */
object DocIngest {

  /** documents schema as the file source sees it. */
  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a documents parquet directory, stamped
    * with an arrival timestamp for watermarking. */
  def readDocStream(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream
      .schema(docsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
      .withColumn("ingest_ts", current_timestamp())

  /** The ingest decision pipeline. Normalization + fingerprint are the
    * EXACT batch dedup_exact contract (Dedup.exactCanonical's hash);
    * the quality predicate is the EXACT batch qualityFilter cut. */
  def cleaned(docs: DataFrame, minWords: Int = 20, minQuality: Double = 0.3,
              watermark: String = "10 minutes"): DataFrame = {
    val words = size(split(trim(col("text")), "\\s+"))
    val stop = size(regexp_extract_all(lower(col("text")),
      lit("\\b(?:the|and|is|of|to)\\b"), lit(0)))
    val quality =
      round(least(words / lit(50.0), lit(1.0)) * 0.5 + (stop / words) * 0.5, 4)
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    docs
      .withColumn("n_words", words.cast("long"))
      .withColumn("quality", quality)
      .filter(col("n_words") >= minWords && col("quality") >= minQuality)
      .withColumn("h", sha2(norm.cast("binary"), 256))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("h")
      .select("doc_id", "h", "n_words", "quality")
  }

  /** Streaming DECONTAMINATION: arriving documents checked against the
    * (static, small) benchmark gram set — the stream-static twin of the
    * batch decontaminate operator. Emits (doc_id, n_hit_grams) per
    * contaminated arriving doc.
    *
    * STATELESS by construction, so append mode needs no watermark: the
    * benchmark grams collapse to a single broadcast array row
    * (stream-static inner join), and each arriving doc counts its
    * distinct-gram overlap with one `array_intersect` — no streaming
    * aggregation, no state store. Same distinct-gram-count semantics as
    * the batch operator (wordShingles is per-doc distinct). */
  def contaminated(docs: DataFrame, bench: DataFrame, n: Int = 4): DataFrame = {
    import graft.functions.{TextShingles, WordShinglesExpr}
    val benchArr = bench.select(
      explode(WordShinglesExpr.wordShingles(
        TextShingles.words(col("text")), n)).as("gram")).distinct()
      .agg(collect_set("gram").as("bench_grams"))
    docs
      .select(col("doc_id"),
        WordShinglesExpr.wordShingles(
          TextShingles.words(col("text")), n).as("grams"))
      .join(broadcast(benchArr), lit(true), "inner")
      .select(col("doc_id"),
        size(array_intersect(col("grams"), col("bench_grams")))
          .as("n_hit_grams"))
      .filter(col("n_hit_grams") > 0)
  }
}
