package graft

import org.apache.spark.sql.types._

/** Post-load schema contract for every driver table (the companion of
  * EncodingCanarySpec's per-encoding behavior pins): [[Tables.load]]
  * must present ONE canonical schema per table regardless of which
  * physical parquet footer the driver's latest data regeneration wrote
  * — timestamps always session-TZ `TimestampType`, never NTZ or raw
  * long. A failure here means the driver regenerated `/root/testdata`
  * with a shape `Tables.normalizeTs` does not canonicalize yet: extend
  * the normalization (and EncodingCanarySpec's fixture set), do NOT
  * adapt individual queries to the new shape.
  */
class TestdataSchemaSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))

  expected.toSeq.sortBy(_._1).foreach { case (table, cols) =>
    test(s"$table loads with its canonical schema") {
      val got = Tables.load(spark, "/root/testdata/sf0.001", table)
        .schema.fields.toSeq
        .map(f => f.name -> (f.dataType match {
          // containsNull/nullable are writer artifacts, not contract
          case ArrayType(e, _) => ArrayType(e)
          case t => t
        }))
      assert(got == cols,
        s"driver testdata drifted for '$table' — normalizeTs (and the " +
          s"encoding canary) need extending.\n  got: $got\n  want: $cols")
    }
  }
}
