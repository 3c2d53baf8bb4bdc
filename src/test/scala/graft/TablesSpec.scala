package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the events.ts normalization across every generator vintage the
  * driver has shipped: TIMESTAMP(NANOS) (LongType under nanosAsLong),
  * TIMESTAMP_MICROS isAdjustedToUTC=false (TIMESTAMP_NTZ unless NTZ
  * inference is off), and plain TIMESTAMP. Round 8 lost 11 queries to a
  * silent NTZ flip in the regenerated testdata — this suite makes that
  * class of breakage a test failure instead of a vanished query. */
class TablesSpec extends SparkSpec {

  test("driver testdata events.ts loads as plain TIMESTAMP") {
    val df = Tables.load(spark, sf, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must normalize to TIMESTAMP, got ${df.schema("ts").dataType}")
    // unix_micros is the operator-side contract that broke in round 8
    val n = df.select(unix_micros(col("ts"))).filter(col("unix_micros(ts)").isNotNull).count()
    assert(n > 0)
  }

  test("normalizeTs: nanos-as-long vintage converts losslessly") {
    import spark.implicits._
    val us = 1700000000123456L // whole-microsecond stamp
    val df = Seq((1L, us * 1000L)).toDF("event_id", "ts")
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).as[Long].head() == us)
  }

  test("normalizeTs: TIMESTAMP_NTZ vintage casts value-exactly under UTC") {
    import spark.implicits._
    val us = 1700000000123456L
    val df = Seq((1L, us)).toDF("event_id", "us")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .drop("us")
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).as[Long].head() == us)
  }

  test("normalizeTs: plain TIMESTAMP and ts-less frames pass through") {
    import spark.implicits._
    val plain = Seq((1L, new java.sql.Timestamp(1700000000000L)))
      .toDF("event_id", "ts")
    assert(Tables.normalizeTs(plain).schema("ts").dataType == TimestampType)
    val noTs = Seq((1L, "a")).toDF("id", "s")
    assert(Tables.normalizeTs(noTs).columns.toSeq == Seq("id", "s"))
  }

  test("driver testdata column names match the operator contracts") {
    // the driver regenerates /root/testdata between rounds; a renamed or
    // dropped column should fail HERE, not as a vanished query in the
    // correctness report. Names only — physical types may drift by
    // vintage (that contract is pinned by the ts tests above).
    val expected = Map(
      "region" -> Set("r_regionkey", "r_name"),
      "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment"),
      "supplier" -> Set("s_suppkey", "s_name", "s_nationkey"),
      "part" -> Set("p_partkey", "p_name", "p_brand", "p_retailprice"),
      "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"),
      "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
      "events" -> Set("event_id", "ts", "user_id", "event_type", "value",
        "props"),
      "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Set("vec_id", "embedding", "label"))
    expected.foreach { case (name, cols) =>
      val got = Tables.load(spark, sf, name).columns.toSet
      assert(cols.subsetOf(got),
        s"$name: operators expect ${cols -- got} but the file has $got")
    }
  }

  test("streaming read matches the batch read on the same events file") {
    // the file-source schema is peeked from the batch reader, so a
    // generator vintage change breaks both or neither
    val stream = streaming.EventStream.readEventStream(spark, sf)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == TimestampType)
    assert(stream.schema.fieldNames.toSet ==
      Tables.load(spark, sf, "events").schema.fieldNames.toSet)
  }
}
