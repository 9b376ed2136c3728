package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The connector's parquet row codec: arbitrary rows of every
  * supported type (strings incl. unicode/empty, all integral bounds,
  * doubles incl. subnormals, booleans, binary, NULLs at every
  * position, nested struct with its own nulls) must survive the
  * write-Group → parquet → read-Group → InternalRow round trip
  * byte-identically — the foundation the g15-g19/s32 entries and
  * every GraftDsv2Spec pin stand on.
  */
class GroupRowsSpec extends SparkSpec {

  private val nested = StructType(Seq(
    StructField("vtype", IntegerType, nullable = false),
    StructField("str", StringType),
    StructField("num", DoubleType),
    StructField("bin", BinaryType)))
  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("i", IntegerType),
    StructField("l", LongType),
    StructField("d", DoubleType),
    StructField("f", FloatType),
    StructField("b", BooleanType),
    StructField("bytes", BinaryType),
    StructField("v", nested)))

  test("every supported type round-trips through the graft store") {
    val rnd = new scala.util.Random(4242)
    def maybe[T](v: T): Any = if (rnd.nextInt(5) == 0) null else v
    val rows = (0 until 300).map { i =>
      Row(
        Seq("", "plain", "customer/1", "é世界🎉", "a\nb\tc",
          "x" * 200)(i % 6) + s"/$i",
        maybe(Seq(Int.MinValue, -1, 0, 1, Int.MaxValue,
          rnd.nextInt())(i % 6)),
        maybe(Seq(Long.MinValue, -1L, 0L, Long.MaxValue,
          rnd.nextLong(), 42L)(i % 6)),
        maybe(Seq(Double.MinPositiveValue, -0.0, 0.0, math.Pi,
          Double.MaxValue, rnd.nextDouble())(i % 6)),
        maybe(rnd.nextFloat()),
        maybe(rnd.nextBoolean()),
        maybe(Array.fill(rnd.nextInt(16))(rnd.nextInt().toByte)),
        maybe(Row(i, maybe("s" + i), maybe(rnd.nextDouble()),
          maybe(Array[Byte](1, 2)))))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val root = java.nio.file.Files
      .createTempDirectory("graft-codec").toString + "/s"
    graft.sources.v2.GraftTable.create(root, schema, "id")
    df.write.format("graft").mode("append").save(root)
    val back = spark.read.format("graft").load(root)

    def canon(r: Row): (String, String) = r.getString(0) ->
      (1 until r.length).map { i =>
        r.get(i) match {
          case null => "null"
          case a: Array[Byte] => a.mkString("[", ",", "]")
          case nr: Row => (0 until nr.length).map { j =>
            nr.get(j) match {
              case null => "null"
              case a: Array[Byte] => a.mkString("[", ",", "]")
              case x => x.toString
            }
          }.mkString("{", "|", "}")
          case x => x.toString
        }
      }.mkString(";")
    val want = df.collect().map(canon).toMap
    val got = back.collect().map(canon).toMap
    assert(got.size == want.size)
    want.foreach { case (k, v) =>
      assert(got(k) == v, s"row $k diverged:\n got ${got(k)}\nwant $v")
    }
  }
}
