package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** The pure-JVM SQLite sink (S2). The JVM side proves write→read identity,
  * page structure (multi-leaf, interior, overflow), and append semantics;
  * `tools/check_sqlite.py` closes the loop with stock sqlite3
  * (`PRAGMA integrity_check` + row compare vs the reference golden).
  */
class SqliteIOSpec extends SparkSpec {

  private def tmpDb(): String =
    new File(Files.createTempDirectory("sqlite").toFile, "t.db").getPath

  /** Blobs (Array[Byte]) compare by reference inside nested Seqs — map
    * them to Seq for value equality.
    */
  private def deep(rows: Seq[Seq[Any]]): Seq[Seq[Any]] =
    rows.map(_.map { case a: Array[Byte] => a.toSeq; case v => v })

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType), StructField("flag", BooleanType),
    StructField("day", DateType), StructField("payload", BinaryType)))

  private def mkDf(n: Int, offset: Long = 0L) = {
    val rows = (0 until n).map { i =>
      Row(i + offset, s"name_$i", i * 1.5, i % 2 == 0,
        java.sql.Date.valueOf("2024-01-01"), Array[Byte](i.toByte, -1, 0))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
  }

  test("varints and records round-trip edge values") {
    for (v <- Seq(0L, 1L, 127L, 128L, 16383L, 16384L, -1L, Long.MaxValue,
        Long.MinValue, 72057594037927935L, 72057594037927936L)) {
      val b = SqliteIO.varintBytes(v)
      assert(SqliteIO.readVarint(b, 0) === ((v, b.length)), s"varint $v")
    }
    val vals: Seq[SqliteIO.SqlValue] = Seq(null, 0L, 1L, -1L, 255L, -129L,
      32767L, -32769L, 8388607L, 2147483647L, 140737488355327L, Long.MinValue,
      3.14159, -0.0, Double.NaN, "", "héllo wörld ünïcode", "a" * 300,
      Array[Byte](), Array[Byte](1, 2, -3))
    val back = SqliteIO.decodeRecord(SqliteIO.recordBytes(vals))
    vals.zip(back).foreach {
      case (a: Array[Byte], b: Array[Byte]) => assert(a.toSeq === b.toSeq)
      case (a: Double, b: Double) if a.isNaN => assert(b.isNaN)
      case (a, b) => assert(a === b)
    }
  }

  test("write→read identity for a typed frame, insertion order kept") {
    val db = tmpDb()
    val df = mkDf(100)
    SqliteIO.append(df, db, "t")
    val t = SqliteIO.readTable(db, "t")
    assert(t.createSql === SqliteIO.createTableSql("t", schema))
    assert(t.rows.length === 100)
    val expect = df.collect().toSeq.map(r => SqliteIO.toSqlValues(r, schema))
    t.rows.zip(expect).foreach { case (got, exp) =>
      got.zip(exp).foreach {
        case (g: Array[Byte], e: Array[Byte]) => assert(g.toSeq === e.toSeq)
        case (g, e) => assert(g === e)
      }
    }
  }

  test("nulls in every column survive the round trip") {
    val db = tmpDb()
    val rows = Seq(Row(null, null, null, null, null, null),
      Row(7L, "x", 1.0, true, java.sql.Date.valueOf("2020-02-29"),
        Array[Byte](9)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    SqliteIO.append(df, db, "t")
    val got = SqliteIO.readTable(db, "t").rows
    assert(got.head === Seq(null, null, null, null, null, null))
    assert(got(1).take(5) === Seq(7L, "x", 1.0, 1L, "2020-02-29"))
  }

  test("multi-leaf + interior pages: 20k rows in rowid order") {
    val db = tmpDb()
    SqliteIO.append(mkDf(20000), db, "t")
    val rows = SqliteIO.readTable(db, "t").rows
    assert(rows.length === 20000)
    // rowid walk preserves insertion order end to end
    assert(rows.map(_.head.asInstanceOf[Long]) === (0L until 20000L))
  }

  test("overflow chains: >1-page and multi-page payloads round-trip") {
    val db = tmpDb()
    val big1 = "x" * 5000          // one overflow page
    val big2 = "y" * 70000         // many overflow pages
    val s = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(Row(1L, big1), Row(2L, "small"), Row(3L, big2)), 1), s)
    SqliteIO.append(df, db, "t")
    val rows = SqliteIO.readTable(db, "t").rows
    assert(rows.map(_(1).asInstanceOf[String].length) === Seq(5000, 5, 70000))
    assert(rows(0)(1) === big1)
    assert(rows(2)(1) === big2)
  }

  test("append preserves existing rows, doubles count, bumps change counter") {
    val db = tmpDb()
    SqliteIO.append(mkDf(50), db, "t")
    val first = SqliteIO.readTable(db, "t")
    SqliteIO.append(mkDf(50, offset = 1000L), db, "t")
    val second = SqliteIO.readTable(db, "t")
    assert(second.rows.length === 100)
    assert(deep(second.rows.take(50)) === deep(first.rows))
    assert(second.rows(50).head === 1000L)
    assert(second.changeCounter === first.changeCounter + 1)
    assert(second.cookie === first.cookie)
    assert(second.createSql === first.createSql)
  }

  test("concurrent appends serialize: no thread's rows are lost") {
    // append is read-modify-rewrite; without the per-path lock two
    // concurrent appenders read the same base and the rename loser's rows
    // silently vanish. 8 threads × 1 row each must land as exactly 8 rows.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val s  = StructType(Seq(StructField("tid", LongType)))
    val db = tmpDb()
    val fs = (1L to 8L).map { i =>
      Future {
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(Row(i)), 1), s)
        SqliteIO.append(df, db, "t")
      }
    }
    Await.result(Future.sequence(fs), 120.seconds)
    val got = SqliteIO.readTable(db, "t").rows.map(_.head.asInstanceOf[Long])
    assert(got.sorted === (1L to 8L))
  }

  test("append with a different column set fails loudly") {
    val db = tmpDb()
    SqliteIO.append(mkDf(3), db, "t")
    val other = mkDf(3).withColumnRenamed("score", "points")
    val e = intercept[IllegalArgumentException] {
      SqliteIO.append(other, db, "t")
    }
    assert(e.getMessage.contains("schema mismatch"))
    assert(SqliteIO.readTable(db, "t").rows.length === 3) // untouched
  }

  test("empty frame creates a valid empty table pandas-style") {
    val db = tmpDb()
    SqliteIO.append(mkDf(0), db, "t")
    val t = SqliteIO.readTable(db, "t")
    assert(t.rows.isEmpty)
    assert(SqliteIO.columnNamesFromSql(t.createSql) ===
      schema.fieldNames.toSeq)
    SqliteIO.append(mkDf(2), db, "t")
    assert(SqliteIO.readTable(db, "t").rows.length === 2)
  }

  test("DDL parser: quoted/unquoted/untyped columns, nested parens, escapes") {
    assert(SqliteIO.columnsFromSql(
      """CREATE TABLE "t" ("a" INTEGER,
        |  "b" DECIMAL(10,2),
        |  c TEXT,
        |  "d",
        |  "e""f" REAL,
        |  PRIMARY KEY ("a")
        |)""".stripMargin) ===
      Seq(("a", "INTEGER"), ("b", "DECIMAL(10,2)"), ("c", "TEXT"),
        ("d", ""), ("e\"f", "REAL")))
    // round trip through our own generator incl. a quote in the name
    val s = StructType(Seq(StructField("x\"y", LongType),
      StructField("plain", StringType)))
    val ddl = SqliteIO.createTableSql("ta\"ble", s)
    assert(SqliteIO.columnsFromSql(ddl) ===
      Seq(("x\"y", "INTEGER"), ("plain", "TEXT")))
  }

  test("quoted identifiers survive a full write→sqlite_master→read cycle") {
    val db = tmpDb()
    val s  = StructType(Seq(StructField("we\"ird", LongType),
      StructField("v", DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 2.5)), 1), s)
    SqliteIO.append(df, db, "t")
    SqliteIO.append(df, db, "t") // append re-parses the stored DDL
    val t = SqliteIO.readTable(db, "t")
    assert(SqliteIO.columnNamesFromSql(t.createSql) === Seq("we\"ird", "v"))
    assert(t.rows.length === 2)
  }

  test("append with matching names but different types fails at the writer") {
    val db = tmpDb()
    SqliteIO.append(mkDf(3), db, "t")
    // same column names, but `score` becomes a string
    val asString = mkDf(3).withColumn("score", expr("cast(score as string)"))
    val e = intercept[IllegalArgumentException] {
      SqliteIO.append(asString, db, "t")
    }
    assert(e.getMessage.contains("type mismatch") &&
      e.getMessage.contains("score"))
    assert(SqliteIO.readTable(db, "t").rows.length === 3) // untouched
  }

  test("non-sqlite and missing-table inputs fail loudly") {
    val dir = Files.createTempDirectory("sqlite").toFile
    val junk = new File(dir, "junk.db")
    Files.write(junk.toPath, Array.fill[Byte](600)(42))
    assert(intercept[IllegalArgumentException] {
      SqliteIO.readTable(junk.getPath, "t")
    }.getMessage.contains("bad magic"))
    val db = tmpDb()
    SqliteIO.append(mkDf(1), db, "t")
    assert(intercept[IllegalArgumentException] {
      SqliteIO.readTable(db, "other")
    }.getMessage.contains("not found"))
  }

  test("reads the reference's pandas-written golden database") {
    // written by real sqlite via pandas to_sql — proves the reader handles
    // a foreign producer's pages, not just our own writer's
    val golden = "/root/reference/agg_result.db"
    assume(new File(golden).exists(), "reference golden not present")
    val t = SqliteIO.readTable(golden, "agg_trades_weekly")
    assert(t.rows.length === 545)
    val names = SqliteIO.columnNamesFromSql(t.createSql)
    assert(names.take(4) === Seq("week_start_date", "client_type", "user_id", "symbol"))
    val head = t.rows.head
    assert(head(0) === "2022-12-26")
    assert(head(1) === "bronze")
    assert(head(2) === 3002L)
    assert(head(3) === "GOOGL")
    assert(head(4) === 8.12)
  }

  test("readDataFrame ingests the golden history with declared-type schema") {
    val golden = "/root/reference/agg_result.db"
    assume(new File(golden).exists(), "reference golden not present")
    val df = SqliteIO.readDataFrame(spark, golden, "agg_trades_weekly")
    assert(df.count() === 545)
    assert(df.schema("user_id").dataType === LongType)
    assert(df.schema("total_volume").dataType === DoubleType)
    assert(df.schema("week_start_date").dataType === StringType)
    // usable as a regular frame: weekly volume over the ingested history
    val weekly = df.groupBy("week_start_date")
      .agg(sum("total_volume").as("v")).orderBy("week_start_date")
    assert(weekly.count() === 14)
    val first = df.filter(col("week_start_date") === "2022-12-26" &&
      col("user_id") === 3002L && col("symbol") === "GOOGL").head
    assert(first.getAs[Double]("buy_qty") === 8.12)
    // sqlite's dynamic typing reconciled: trade_count INTEGER column is
    // LongType even though avg_buy_price REAL has NULLs mixed in
    assert(df.filter(col("avg_buy_price").isNull).count() > 0)
  }

  test("appending onto the pandas-written golden keeps its rows byte-true") {
    val golden = "/root/reference/agg_result.db"
    assume(new File(golden).exists(), "reference golden not present")
    val db = tmpDb()
    Files.copy(new File(golden).toPath, new File(db).toPath)
    val before = SqliteIO.readTable(db, "agg_trades_weekly")
    val s = StructType(SqliteIO.columnNamesFromSql(before.createSql).map {
      case n @ ("week_start_date" | "client_type" | "symbol") => StructField(n, StringType)
      case n @ ("user_id" | "trade_count") => StructField(n, LongType)
      case n => StructField(n, DoubleType)
    })
    val row = Row("2099-01-01", "gold", 1L, "ZZZ", 1.0, 1.0, 1.0, 1.0, 1.0,
      2L, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(row), 1), s)
    SqliteIO.append(df, db, "agg_trades_weekly")
    val after = SqliteIO.readTable(db, "agg_trades_weekly")
    assert(after.rows.length === 546)
    assert(after.rows.take(545) === before.rows)
    assert(after.createSql === before.createSql) // pandas' DDL text kept
    assert(after.rows.last.head === "2099-01-01")
  }

  test("double -0.0 keeps its sign bit; 0.0/1.0 doubles stay REAL") {
    // regression: a bare `case 0L` pattern matched Double ±0.0/1.0 via
    // Scala cooperative equality and stored them as integer serials,
    // losing -0.0's sign on the round trip
    // explicit element type: a bare Seq(…) literal would unify to
    // Seq[Double] and silently widen the Long cases away
    val back = SqliteIO.decodeRecord(SqliteIO.recordBytes(
      Seq[SqliteIO.SqlValue](-0.0, 0.0, 1.0, 0L, 1L)))
    assert(java.lang.Double.doubleToRawLongBits(back(0).asInstanceOf[Double])
      === java.lang.Double.doubleToRawLongBits(-0.0))
    assert(back(1) === 0.0); assert(back(1).isInstanceOf[Double])
    assert(back(2) === 1.0); assert(back(2).isInstanceOf[Double])
    assert(back(3) === 0L); assert(back(3).isInstanceOf[Long])
    assert(back(4) === 1L); assert(back(4).isInstanceOf[Long])
  }

  test("columnsFromSql handles foreign quote styles and string literals") {
    // bracket and backtick identifiers (both legal sqlite)
    assert(SqliteIO.columnsFromSql(
      "CREATE TABLE t ([foo] INTEGER, `bar baz` TEXT)") ===
      Seq(("foo", "INTEGER"), ("bar baz", "TEXT")))
    // a space inside a bracket name must not bleed into the type
    assert(SqliteIO.columnsFromSql("CREATE TABLE t ([my col] INTEGER)") ===
      Seq(("my col", "INTEGER")))
    // a comma inside a DEFAULT string literal must not split the column
    assert(SqliteIO.columnsFromSql(
      "CREATE TABLE t (x TEXT DEFAULT 'a,b', y INTEGER)") ===
      Seq(("x", "TEXT DEFAULT 'a,b'"), ("y", "INTEGER")))
    // a quoted TABLE name containing '(' — the body scan must skip it
    assert(SqliteIO.columnsFromSql(
      "CREATE TABLE \"t(1)\" (\n\"id\" INTEGER\n)") ===
      Seq(("id", "INTEGER")))
  }

  test("a table name containing '(' appends and re-reads") {
    val db = tmpDb()
    SqliteIO.append(mkDf(2), db, "t(1)")
    SqliteIO.append(mkDf(2, 2), db, "t(1)")
    assert(SqliteIO.readTable(db, "t(1)").rows.length === 4)
  }

  test("append onto a zero-byte file takes the create path") {
    // sqlite (and pandas to_sql) treat a 0-byte file as a valid empty db
    val db = tmpDb()
    new File(db).createNewFile()
    SqliteIO.append(mkDf(3), db, "t")
    assert(SqliteIO.readTable(db, "t").rows.length === 3)
  }

  test("a corrupt header page size fails loudly, not with AIOOBE") {
    val db = tmpDb()
    SqliteIO.append(mkDf(1), db, "t")
    val bytes = Files.readAllBytes(new File(db).toPath)
    bytes(16) = 0; bytes(17) = 3 // page size 3: not a power of two, < 512
    Files.write(new File(db).toPath, bytes)
    val e = intercept[IllegalArgumentException](SqliteIO.readTable(db, "t"))
    assert(e.getMessage.contains("invalid page size"))
  }

  test("toSqlValues accepts java.time values (java8API sessions)") {
    val sch = StructType(Seq(
      StructField("d", DateType), StructField("ts", TimestampType)))
    val ins = java.time.Instant.parse("2024-01-02T03:04:05Z")
    val vals = SqliteIO.toSqlValues(
      Row(java.time.LocalDate.of(2024, 1, 2), ins), sch)
    assert(vals(0) === "2024-01-02")
    // the Instant formats through the same default-zone conversion
    // java.sql.Timestamp.toLocalDateTime uses — compare against it
    val expect = java.time.LocalDateTime
      .ofInstant(ins, java.time.ZoneId.systemDefault())
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))
    assert(vals(1) === expect)
  }
}
