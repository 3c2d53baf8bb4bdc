package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** BLOB ↔ Base64 and multimodal (media) column handling.
  *
  * Reference semantics: Codeunit 60000 - Config. XML Exchange.al:1135
  * `ConvertBLOBToBase64String`, :1280 `ConvertBLOBToString` (Excel mode),
  * :1144 `ExportMediaSet` / :1171 `ExportMedia` / :1256
  * `ImportMediaSetFromFile` — the extension's headline "Export BLOB"
  * feature (PageExt60000-Page8625.al:8).
  *
  * Spark-first: base64/unbase64 are codegen'd built-ins over `binary`
  * columns. Media decode is genuinely imperative, so it runs as a typed
  * `Dataset.mapPartitions` (the Scala analog of `mapInPandas`: batch-shaped,
  * executor-side, schema known) behind the [[MediaDecoder]] seam — the
  * decoder here is a DETERMINISTIC STUB (no image/audio libs in this
  * environment); swapping in a real codec touches nothing but the stub.
  */
object Blob {

  /** §2 #9 — binary ↔ Base64 round-trip. `ok` proves decode∘encode = id.
    * Uses [[graft.functions.Base64NoWrap]] (canonical RFC 4648, codegen'd)
    * — Spark's built-in `base64` MIME-wraps lines, which no other engine
    * in the exchange does. */
  def blobBase64(spark: SparkSession, sfDir: String): DataFrame = {
    val bin = col("text").cast("binary")
    val b64 = graft.functions.Codec.base64NoWrap(bin)
    Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        b64.as("b64"),
        (decode(unbase64(b64), "UTF-8") === col("text")).as("ok"))
      .orderBy("doc_id")
  }

  /** One decoded media record. Width/height/frames are the stub's
    * deterministic fakes (derived from byte length, so the oracle can
    * assert them); a real decoder would read the container header. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, sha_hex: String,
                       mime: String, width: Int, height: Int, frames: Int)

  /** The decode seam. Replace `stub` with a real codec (JavaCV etc.) in
    * production; signature and batch shape stay identical. */
  trait MediaDecoder extends Serializable {
    def decode(docId: Long, payload: Array[Byte], shaHex: String): MediaMeta
  }

  /** STUB decoder — deterministic fake dimensions from the byte length. */
  object StubDecoder extends MediaDecoder {
    def decode(docId: Long, payload: Array[Byte], shaHex: String): MediaMeta =
      MediaMeta(docId, payload.length.toLong, shaHex, "text/plain",
        width = (payload.length % 640).toInt,
        height = (payload.length % 480).toInt,
        frames = (payload.length % 30).toInt)
  }

  /** §2 #47 — media-set FILE round-trip (Codeunit 60000:1144
    * `ExportMediaSet` / :1171 `ExportMedia` / :1256
    * `ImportMediaSetFromFile`): every binary payload is written as its
    * own file in a package media folder by PER-PARTITION writers (no
    * driver byte ever moves), then re-imported through Spark's
    * `binaryFile` source and fingerprinted. Output equals the same
    * fingerprints computed directly on the source column — proving the
    * file layer is lossless.
    *
    * In local mode the folder is a local dir; on a cluster the same code
    * targets a shared store (the writer runs where the partition lives
    * either way). */
  def mediaRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val dir = ExportImport.scratch("media-files")
    // overwrite semantics: clear stale exports so a shrunk corpus can't
    // leave orphan files behind
    val d = Paths.get(dir)
    Files.list(d).forEach(p => Files.deleteIfExists(p))

    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          Files.write(Paths.get(s"$dir/${r.getLong(0)}.bin"),
            r.getAs[Array[Byte]](1))
        }
      }

    spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(dir)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.bin$", 1).cast("long")
          .as("doc_id"),
        col("length").as("n_bytes"),
        sha2(col("content"), 256).as("sha_hex"))
      .orderBy("doc_id")
  }

  /** §2 #10 — media pipeline: binary payload column → per-partition batch
    * decode → typed metadata rows. The scan and the shuffle-free batch
    * shape are the real 100 TB plumbing; only `decoder` is fake. */
  def mediaMetadata(spark: SparkSession, sfDir: String,
                    decoder: MediaDecoder = StubDecoder): DataFrame = {
    import spark.implicits._
    val payloads: Dataset[(Long, Array[Byte], String)] =
      Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
          sha2(col("text").cast("binary"), 256).as("sha_hex"))
        .as[(Long, Array[Byte], String)]
    payloads
      .mapPartitions(_.map { case (id, bytes, sha) =>
        decoder.decode(id, bytes, sha)
      })
      .toDF()
      .orderBy("doc_id")
  }
}
