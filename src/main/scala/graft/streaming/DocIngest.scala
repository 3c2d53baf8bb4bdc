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

  /** Streaming QUALITY/COMPLIANCE gate: PII scrub + Gopher repetition
    * signals + charset/mojibake counts per arriving document — the
    * checks a compliance pass runs AT INGEST, not after the corpus
    * ships. Decisions are EXACTLY the batch operators'
    * ([[graft.operators.TextAnalysis.piiScrubFrom]] / `repetitionFrom`
    * / `charsetGateFrom` — spec-proven equal per doc).
    *
    * STATELESS map-only, so append mode needs no watermark or state
    * store. The one non-map-only piece of the batch twin — the per-doc
    * modal word count, which batch computes via explode + two hash aggs
    * — is replaced here by a per-ROW fold: the modal count of a word
    * list is the longest run in its sorted form, an O(n log n)
    * `aggregate(array_sort(words), …)` — same value, zero exchanges,
    * which is exactly what a per-arrival gate wants. */
  def gated(docs: DataFrame, topWordMax: Double = 0.20,
            dup2Max: Double = 0.18, dup3Max: Double = 0.16): DataFrame = {
    import graft.operators.TextAnalysis.{EmailRe, Ipv4Re}
    val nEmails = regexp_count(col("text"), lit(EmailRe)).cast("long")
    val nIps = regexp_count(col("text"), lit(Ipv4Re)).cast("long")
    val scrubbed = regexp_replace(
      regexp_replace(col("text"), EmailRe, "<EMAIL>"), Ipv4Re, "<IP>")
    // longest run in the sorted word list == modal word count
    val topC = expr(
      """aggregate(array_sort(w),
           named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),
           (a, x) -> named_struct(
             'prev', x,
             'run',  if(a.prev is not null and x = a.prev, a.run + 1, 1L),
             'best', greatest(a.best,
               if(a.prev is not null and x = a.prev, a.run + 1, 1L))),
           a -> a.best)""")
    def dupFrac(g: String) =
      when(size(col(g)) > 0,
        round(lit(1.0) - size(array_distinct(col(g)))
          / size(col(g)).cast("double"), 4))
        .otherwise(lit(0.0))
    docs
      .withColumn("w", graft.functions.TextShingles.words(col("text")))
      .withColumn("g2", when(size(col("w")) >= 2, expr(
        "transform(sequence(1, size(w) - 1), i -> concat(w[i-1], ' ', w[i]))"))
        .otherwise(expr("array()").cast("array<string>")))
      .withColumn("g3", when(size(col("w")) >= 3, expr(
        "transform(sequence(2, size(w) - 1), i -> concat(w[i-2], ' ', w[i-1], ' ', w[i]))"))
        .otherwise(expr("array()").cast("array<string>")))
      .select(col("doc_id"),
        nEmails.as("n_emails"), nIps.as("n_ips"),
        sha2(scrubbed.cast("binary"), 256).as("scrubbed_sha"),
        (nEmails + nIps > 0).as("had_pii"),
        size(col("w")).cast("long").as("n_words"),
        round(topC / size(col("w")).cast("double"), 4).as("top_word_frac"),
        dupFrac("g2").as("dup2_frac"), dupFrac("g3").as("dup3_frac"),
        regexp_count(col("text"), lit("�")).cast("long")
          .as("n_replacement"),
        regexp_count(col("text"),
          lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]")).cast("long")
          .as("n_control"),
        // entropy gate: same 4-dp value and band as the batch
        // char_entropy operator (map-only codegen'd expression — the
        // stateless shape survives unchanged)
        round(graft.functions.CharEntropyF.charEntropy(col("text")), 4)
          .as("char_entropy"))
      .withColumn("repetitive",
        col("top_word_frac") > topWordMax || col("dup2_frac") > dup2Max ||
          col("dup3_frac") > dup3Max)
      .withColumn("charset_ok",
        col("n_replacement") === 0 && col("n_control") === 0)
      .withColumn("entropy_ok",
        col("char_entropy") >= 3.0 && col("char_entropy") <= 5.0)
      // stable output order: the pre-entropy layout first (sinks and
      // specs address it positionally), the entropy pair appended
      .select("doc_id", "n_emails", "n_ips", "scrubbed_sha", "had_pii",
        "n_words", "top_word_frac", "dup2_frac", "dup3_frac",
        "n_replacement", "n_control", "repetitive", "charset_ok",
        "char_entropy", "entropy_ok")
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

  /** Streaming GOPHER QUALITY gate (§2 #235's twin): the published
    * document-level rule battery (Rae et al. 2021 App. A.1.1) decided
    * per arriving document. The decisions are EXACTLY the batch
    * operator's — [[graft.operators.Curation.gopherMetrics]] runs
    * UNCHANGED on the stream because the battery is stateless map-only
    * per-row array folds (the batch form only adds a display sort), so
    * append mode needs no watermark or state store. */
  def gopherGated(docs: DataFrame): DataFrame =
    graft.operators.Curation.gopherMetrics(docs.select("doc_id", "text"))
}
