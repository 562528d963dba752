package graft.sources

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.etl.AtomicFiles

/** S2 — a real SQLite database sink without a JDBC driver jar: the SQLite
  * file format is publicly documented (sqlite.org/fileformat2.html — the
  * 100-byte header, table b-tree pages, record serial types, varints,
  * overflow chains), so a single-table database file can be written and
  * read back with plain `java.nio`. This lights up the reference's PRIMARY
  * sink (`etl_weekly_trades.py:147`, `to_sql(if_exists="append")` into
  * `agg_result.db`) for real: the produced file passes
  * `PRAGMA integrity_check` in stock sqlite3 and row-compares against the
  * reference's checked-in golden (`tools/check_sqlite.py`).
  *
  * Append model — REWRITE, not page surgery: [[append]] reads every
  * existing row, then atomically publishes a fresh, fully-consistent
  * database containing old + new rows ([[graft.etl.AtomicFiles]] temp +
  * rename). That trades write amplification for zero journal/WAL
  * machinery — the published file is ALWAYS a complete rollback-journal
  * database, and a crash mid-append leaves the previous state untouched.
  * The right trade for a report/aggregate-scale sink (the reference
  * appends 545 rows per run); corpus-scale tables go through the
  * distributed parquet/JSONL sinks — [[maxRows]] makes that contract loud,
  * like [[graft.etl.Xlsx]].
  *
  * Scope (all checked loudly, never silently ignored):
  *   - single-table databases: appending rewrites the file, so a foreign
  *     db holding OTHER objects (more tables, indexes, views, triggers)
  *     is rejected rather than silently dropping them.
  *   - UTF-8 text encoding, rollback-journal format: WAL files (read
  *     version 2) are rejected rather than read possibly-stale pages.
  *   - column types: the NULL/INTEGER/REAL/TEXT/BLOB storage classes,
  *     mapped from Spark date/timestamp/string/integral/floating/boolean/
  *     binary columns the way pandas' sqlite adapter does (dates and
  *     timestamps as ISO text — the golden stores '2022-12-26').
  */
object SqliteIO {

  /** Hard cap on rows per table — report/aggregate-scale sink (scaladoc). */
  val maxRows = 1000000

  private val PageSize = 4096
  private val Usable   = PageSize            // reserved space per page = 0
  private val Magic    = "SQLite format 3".getBytes(UTF_8) :+ 0.toByte // 16-byte magic, NUL-terminated
  // informational header stamp (bytes 96-99, "sqlite version number")
  private val VersionNumber = 3045001

  /** A stored value: null, Long, Double, String or Array[Byte]. */
  type SqlValue = Any

  // ======================================================== public surface

  /** Append `df`'s rows to `tableName` in the database at `path`, creating
    * the file (pandas `to_sql(if_exists="append")` semantics). Column
    * names must match an existing table in order — a silent partial insert
    * is the reference README's own documented trap.
    *
    * Concurrency: append is a read-modify-rewrite, serialized against
    * OTHER `SqliteIO.append` callers (threads of this JVM via a per-path
    * monitor; other processes via an exclusive `FileLock`) on the
    * `<path>.lock` sidecar — without it two concurrent appends would both
    * read the same base and the loser's rows would silently vanish at the
    * final rename. The sidecar is NOT
    * sqlite's own locking protocol: an external `sqlite3` process writing
    * the file concurrently is still undetected (real sqlite serializes
    * via locks on the db file itself, which this from-scratch writer does
    * not speak). Treat the file as single-application-owned while
    * appending — the reference's CI pipeline semantics.
    */
  def append(df: DataFrame, path: String, tableName: String): Unit = {
    val rows = df.take(maxRows + 1)
    require(rows.length <= maxRows,
      s"SqliteIO is a report/aggregate-scale sink (driver-side collect): " +
        s"> $maxRows rows. Use the distributed parquet/JSONL sinks for large tables.")
    val schema   = df.schema
    val incoming = rows.toSeq.map(r => toSqlValues(r, schema))
    withFileLock(path)(appendLocked(path, tableName, schema, incoming))
  }

  /** Exclusive lock on `<path>.lock` held for `body`, two layers deep:
    * a JVM-wide per-path monitor serializes threads of THIS process
    * (`FileLock` is per-process — without the monitor a second thread
    * would get OverlappingFileLockException instead of waiting), then the
    * `FileLock` serializes against other processes. The sidecar (unlike a
    * lock on the db file itself) never trips a reader.
    *
    * The monitor map retains one bare Object per distinct canonical path
    * for the JVM's lifetime — accepted: removal-on-release races a waiter
    * acquiring a replacement monitor (breaking mutual exclusion), and a
    * report-scale sink sees few distinct paths (~48 bytes each).
    */
  private val lockMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def withFileLock[A](path: String)(body: => A): A = {
    val lockFile = new File(path + ".lock")
    Option(lockFile.getParentFile).foreach(_.mkdirs())
    val monitor = lockMonitors.computeIfAbsent(
      lockFile.getCanonicalPath, _ => new Object)
    monitor.synchronized {
      val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try { val lk = ch.lock(); try body finally lk.release() }
      finally ch.close()
    }
  }

  private def appendLocked(path: String, tableName: String,
      schema: StructType, incoming: Seq[Seq[SqlValue]]): Unit = {
    val f = new File(path)
    // length == 0: sqlite itself (and pandas to_sql, whose semantics this
    // replicates) treats a zero-byte file as a valid EMPTY database — e.g.
    // `touch`ed, or created by a connection that never committed — so it
    // takes the create path, not a "bad magic" failure
    if (!f.exists() || f.length() == 0L) {
      writeTable(path, tableName, createTableSql(tableName, schema), incoming,
        cookie = 1, changeCounter = 1)
    } else {
      val existing = readTable(path, tableName)
      val cols     = columnsFromSql(existing.createSql)
      require(cols.map(_._1) == schema.fieldNames.toSeq,
        s"schema mismatch appending to $path table '$tableName': existing " +
          s"columns ${cols.map(_._1).mkString("[", ", ", "]")} but this run produces " +
          s"${schema.fieldNames.mkString("[", ", ", "]")} (did computePnl " +
          "change between runs?). Write elsewhere, delete the db, or rerun " +
          "with the original settings.")
      // declared TYPES must agree too (by storage class): a same-named
      // frame with e.g. user_id as STRING would append text under an
      // INTEGER declaration — the loud failure would otherwise land on a
      // much-later reader instead of the offending writer
      cols.zip(schema.fields).foreach { case ((n, declared), f) =>
        val want = declType(f.dataType)
        val sc   = storageClass(declared)
        require(sc == "ANY" || sc == storageClass(want),
          s"type mismatch appending to $path table '$tableName': column " +
            s"'$n' is declared $declared but this run produces $want")
      }
      val all = existing.rows ++ incoming
      require(all.length <= maxRows,
        s"append would exceed the $maxRows-row sink cap (${all.length} rows)")
      writeTable(path, tableName, existing.createSql, all,
        cookie = existing.cookie, changeCounter = existing.changeCounter + 1)
    }
  }

  /** One table's parsed content. Rows are in rowid order — the order
    * `SELECT * FROM t` returns them, i.e. insertion order for our files.
    */
  case class Table(createSql: String, rows: Seq[Seq[SqlValue]],
      cookie: Int, changeCounter: Int)

  /** Read a table into a DataFrame — the migration path for a reference
    * user's EXISTING `agg_result.db` history. Spark types come from the
    * declared column types (pandas' own mapping, [[declType]] inverted);
    * sqlite's per-value dynamic typing is reconciled to the declared
    * column type, loudly: an INTEGER value in a REAL column widens (sqlite
    * itself stores 1.0 as the integer 1), anything else mismatched throws
    * rather than silently nulling.
    */
  def readDataFrame(spark: org.apache.spark.sql.SparkSession, path: String,
      tableName: String): DataFrame = {
    val t    = readTable(path, tableName)
    val cols = columnsFromSql(t.createSql) // ONE parse: (name, declared type)
    val names = cols.map(_._1)
    val sparkTypes: Seq[DataType] = cols.map {
      case (_, dt) => dt.toUpperCase.takeWhile(c => c != '(' && c != ' ') match {
        case "INTEGER" | "INT" | "BIGINT" | "SMALLINT" | "TINYINT" => LongType
        case "REAL" | "FLOAT" | "DOUBLE"               => DoubleType
        case "BOOLEAN"                                 => BooleanType
        case "TEXT" | "DATE" | "TIMESTAMP" | "VARCHAR" | "CHAR" | "DATETIME" =>
          StringType // ISO text, cast downstream
        case "BLOB"                                    => BinaryType
        case other => throw new IllegalArgumentException(
          s"SqliteIO: unsupported declared type '$other' in: ${t.createSql} — " +
            "untyped/exotic columns need an explicit migration query")
      }
    }
    val schema = StructType(names.zip(sparkTypes).map {
      case (n, dt) => StructField(n, dt)
    })
    val rows = t.rows.map { r =>
      Row.fromSeq(r.zip(sparkTypes).zip(names).map {
        case ((null, _), _)                  => null
        case ((v: Long, LongType), _)        => v
        case ((v: Long, DoubleType), _)      => v.toDouble // sqlite stores 1.0 as int 1
        case ((v: Long, BooleanType), _)     => v != 0L
        case ((v: Double, DoubleType), _)    => v
        case ((v: String, StringType), _)    => v
        case ((v: Array[Byte], BinaryType), _) => v
        case ((v, dt), n) => throw new IllegalArgumentException(
          s"SqliteIO: column '$n' declared $dt holds a ${v.getClass.getSimpleName}")
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 10000)),
      schema)
  }

  /** Read `tableName` from a (single-table scope, see scaladoc) database. */
  def readTable(path: String, tableName: String): Table = {
    val bytes = Files.readAllBytes(new File(path).toPath)
    require(bytes.length >= 512 &&
        java.util.Arrays.equals(bytes.take(16).toArray, Magic),
      s"$path is not a SQLite database (bad magic)")
    val h = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val rawPageSize = h.getShort(16) & 0xFFFF
    val pageSize = if (rawPageSize == 1) 65536 else rawPageSize
    // the format requires a power of two in [512, 65536]; without this
    // check a corrupt header degrades to a bare AIOOBE deep in the page
    // walk instead of this module's loud diagnostics
    require(pageSize >= 512 && pageSize <= 65536 &&
        Integer.bitCount(pageSize) == 1,
      s"$path: invalid page size $pageSize in header — corrupt database")
    require((bytes(19) & 0xFF) <= 1,
      s"$path is a WAL-mode database (read version ${bytes(19)}); this " +
        "reader supports rollback-journal files only")
    val reserved = bytes(20) & 0xFF
    val usable   = pageSize - reserved
    require(h.getInt(56) == 1,
      s"$path text encoding ${h.getInt(56)} is not UTF-8")
    def page(n: Int): Array[Byte] = {
      val off = (n.toLong - 1) * pageSize
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + pageSize)
    }
    def readOverflow(first: Int, need: Int): Array[Byte] = {
      val out = ByteBuffer.allocate(need)
      val seen = scala.collection.mutable.Set[Int]()
      var p = first
      while (p != 0 && out.hasRemaining) {
        require(seen.add(p), s"$path: circular overflow chain at page $p")
        val pg   = page(p)
        val next = ByteBuffer.wrap(pg).order(ByteOrder.BIG_ENDIAN).getInt(0)
        val take = math.min(usable - 4, out.remaining())
        out.put(pg, 4, take)
        p = next
      }
      require(!out.hasRemaining, s"$path: truncated overflow chain")
      out.array()
    }
    // generic table b-tree walk: leaves in key order
    def walk(root: Int): Seq[(Long, Seq[SqlValue])] = {
      val acc = ArrayBuffer[(Long, Seq[SqlValue])]()
      val seen = scala.collection.mutable.Set[Int]()
      def visit(n: Int): Unit = {
        require(seen.add(n), s"$path: cyclic b-tree pointer to page $n")
        val pg        = page(n)
        val headerOff = if (n == 1) 100 else 0
        val buf       = ByteBuffer.wrap(pg).order(ByteOrder.BIG_ENDIAN)
        val ptype     = pg(headerOff) & 0xFF
        val ncells    = buf.getShort(headerOff + 3) & 0xFFFF
        ptype match {
          case 5 => // interior table page
            for (i <- 0 until ncells) {
              val cp = buf.getShort(headerOff + 12 + 2 * i) & 0xFFFF
              visit(ByteBuffer.wrap(pg).order(ByteOrder.BIG_ENDIAN).getInt(cp))
            }
            visit(buf.getInt(headerOff + 8)) // right-most child
          case 13 => // leaf table page
            for (i <- 0 until ncells) {
              val cp = buf.getShort(headerOff + 8 + 2 * i) & 0xFFFF
              val (payloadLen, n1) = readVarint(pg, cp)
              val (rowid, n2)      = readVarint(pg, cp + n1)
              val p     = payloadLen.toInt
              val local = localPayload(p, usable)
              val payload =
                if (local == p)
                  java.util.Arrays.copyOfRange(pg, cp + n1 + n2, cp + n1 + n2 + p)
                else {
                  val first = ByteBuffer.wrap(pg).order(ByteOrder.BIG_ENDIAN)
                    .getInt(cp + n1 + n2 + local)
                  java.util.Arrays.copyOfRange(pg, cp + n1 + n2, cp + n1 + n2 + local) ++
                    readOverflow(first, p - local)
                }
              acc += ((rowid, decodeRecord(payload)))
            }
          case t => throw new IllegalStateException(
            s"$path: unexpected b-tree page type $t on page $n (index " +
              "b-trees / corrupt page?)")
        }
      }
      visit(root)
      acc.toSeq
    }
    val master = walk(1).map(_._2)
    require(master.nonEmpty, s"$path: empty sqlite_master — no tables")
    require(master.length == 1,
      s"$path holds ${master.length} schema objects " +
        master.map(r => s"${r(0)} ${r(1)}").mkString("[", ", ", "]") +
        s"; this single-table sink would drop the others on append")
    val Seq(typ, name, _, rootpage, sql) = master.head
    require(typ == "table" && name == tableName,
      s"$path: table '$tableName' not found (has ${typ} '${name}')")
    val ncols = columnsFromSql(sql.asInstanceOf[String]).length
    val raw   = walk(rootpage.asInstanceOf[Long].toInt)
    // a record WIDER than the parsed DDL means the parse missed columns —
    // truncating would silently destroy that data on the next append
    raw.foreach { case (rid, r) =>
      require(r.length <= ncols,
        s"$path: rowid $rid has ${r.length} values but the parsed CREATE " +
          s"TABLE has $ncols columns — DDL this reader cannot represent: $sql")
    }
    val rows = raw.map { case (_, r) =>
      // sqlite permits records with fewer trailing columns than the schema
      if (r.length >= ncols) r else r ++ Seq.fill(ncols - r.length)(null)
    }
    Table(sql.asInstanceOf[String], rows, h.getInt(40), h.getInt(24))
  }

  /** Map a Spark row to sqlite storage-class values, pandas-style. */
  def toSqlValues(row: Row, schema: StructType): Seq[SqlValue] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) null
      else f.dataType match {
        case ByteType | ShortType | IntegerType => row.getAs[Number](i).longValue()
        case LongType      => row.getLong(i)
        case FloatType     => row.getFloat(i).toDouble
        case DoubleType    => row.getDouble(i)
        case BooleanType   => if (row.getBoolean(i)) 1L else 0L
        case StringType    => row.getString(i)
        case BinaryType    => row.getAs[Array[Byte]](i)
        // datetime externalization depends on spark.sql.datetime.java8API
        // .enabled: match the runtime value instead of hard-casting so the
        // sink works under either session config
        case DateType => row.get(i) match {
          case d: java.sql.Date        => d.toString // YYYY-MM-DD
          case d: java.time.LocalDate  => d.toString // same ISO text
          case other => throw new IllegalArgumentException(
            s"SqliteIO: unexpected DateType value class ${other.getClass}")
        }
        case TimestampType =>
          // pandas writes 'YYYY-MM-DD HH:MM:SS' (+ '.ffffff' when sub-second)
          val ldt = row.get(i) match {
            case ts: java.sql.Timestamp => ts.toLocalDateTime
            case ins: java.time.Instant => // java8API sessions
              java.time.LocalDateTime.ofInstant(ins,
                java.time.ZoneId.systemDefault())
            case other => throw new IllegalArgumentException(
              s"SqliteIO: unexpected TimestampType value class ${other.getClass}")
          }
          val base = ldt.format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss"))
          if (ldt.getNano == 0) base else f"$base.${ldt.getNano / 1000}%06d"
        case dt => throw new IllegalArgumentException(
          s"SqliteIO: unsupported column type $dt for column '${f.name}' — " +
            "supported: integral, floating, boolean, string, binary, date, timestamp")
      }
    }.toSeq

  /** pandas' exact CREATE TABLE layout (first column unindented, the rest
    * two-space indented) so `SELECT sql FROM sqlite_master` matches the
    * reference golden byte-for-byte.
    */
  def createTableSql(tableName: String, schema: StructType): String = {
    def q(n: String) = "\"" + n.replace("\"", "\"\"") + "\"" // SQL-escape
    val cols = schema.fields.map(f => s"${q(f.name)} ${declType(f.dataType)}")
    s"CREATE TABLE ${q(tableName)} (\n" + cols.mkString(",\n  ") + "\n)"
  }

  /** (name, declared type) pairs in declaration order, parsed back out of
    * a stored CREATE TABLE text — ours or a foreign producer's. A real
    * tokenizer, not a regex: splits the parenthesized body on TOP-LEVEL
    * commas (so `DECIMAL(10,2)` survives), unescapes doubled quotes in
    * identifiers, accepts unquoted and UNTYPED columns (both legal
    * sqlite), and skips trailing table-constraint clauses. Anything it
    * cannot represent fails loudly — [[readTable]] cross-checks record
    * arity so a misparse can never silently truncate data.
    */
  def columnsFromSql(sql: String): Seq[(String, String)] = {
    // body-open paren: the first '(' OUTSIDE any quoting construct — a
    // quoted table name may legally contain '(' (all four sqlite identifier
    // quote styles: "…", […], `…`, plus '…' string literals)
    val open = {
      var i = 0
      var found = -1
      while (found < 0 && i < sql.length) {
        sql(i) match {
          case '"'  => i += 1; while (i < sql.length && sql(i) != '"') i += 1; i += 1
          case '\'' => i += 1; while (i < sql.length && sql(i) != '\'') i += 1; i += 1
          case '`'  => i += 1; while (i < sql.length && sql(i) != '`') i += 1; i += 1
          case '['  => i += 1; while (i < sql.length && sql(i) != ']') i += 1; i += 1
          case '('  => found = i
          case _    => i += 1
        }
      }
      found
    }
    require(open >= 0 && sql.trim.endsWith(")"),
      s"SqliteIO: cannot parse CREATE TABLE text: $sql")
    val body = sql.substring(open + 1, sql.lastIndexOf(')'))
    // top-level comma split, aware of parens, every identifier-quote style,
    // and single-quoted string literals (a DEFAULT 'a,b' must not split;
    // doubled closers inside quotes read as close-then-reopen, which is
    // equivalent for split purposes)
    val segs = ArrayBuffer[String]()
    val cur  = new StringBuilder
    var depth = 0
    var quote: Char = 0 // the closer we are scanning toward, or 0
    body.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else c match {
        case '"'               => quote = '"'; cur += c
        case '\''              => quote = '\''; cur += c
        case '`'               => quote = '`'; cur += c
        case '['               => quote = ']'; cur += c
        case '('               => depth += 1; cur += c
        case ')'               => depth -= 1; cur += c
        case ',' if depth == 0 => segs += cur.toString; cur.clear()
        case _                 => cur += c
      }
    }
    if (cur.toString.trim.nonEmpty) segs += cur.toString
    val constraintKw = Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    val cols = segs.map(_.trim).filter(_.nonEmpty).flatMap { seg =>
      val quoted = seg.nonEmpty && "\"`[".contains(seg.head)
      val (name, rest) =
        if (seg.startsWith("\"") || seg.startsWith("`")) {
          // quoted identifier: scan to the closing quote; a doubled quote
          // char is a literal one ("" = ", `` = `)
          val qc = seg.head
          val sb = new StringBuilder
          var i = 1
          var done = false
          while (!done && i < seg.length) {
            if (seg(i) == qc) {
              if (i + 1 < seg.length && seg(i + 1) == qc) { sb += qc; i += 2 }
              else { done = true; i += 1 }
            } else { sb += seg(i); i += 1 }
          }
          require(done, s"SqliteIO: unterminated quoted name in: $seg")
          (sb.toString, seg.substring(i).trim)
        } else if (seg.startsWith("[")) {
          // bracket identifier: no escaping inside, ends at the first ']'
          val close = seg.indexOf(']')
          require(close > 0, s"SqliteIO: unterminated [name] in: $seg")
          (seg.substring(1, close), seg.substring(close + 1).trim)
        } else {
          val tok = seg.takeWhile(!_.isWhitespace)
          (tok, seg.drop(tok.length).trim)
        }
      if (!quoted && constraintKw.contains(name.toUpperCase)) None // table constraint
      else Some((name, rest)) // rest = declared type ("" for untyped)
    }.toSeq
    require(cols.nonEmpty, s"SqliteIO: no columns parsed from: $sql")
    cols
  }

  /** Column names in declaration order (see [[columnsFromSql]]). */
  def columnNamesFromSql(sql: String): Seq[String] =
    columnsFromSql(sql).map(_._1)

  /** sqlite type-affinity storage class of a declared type — the level at
    * which append type-compat is enforced (INTEGER vs INT vs BIGINT all
    * store integers; TEXT vs DATE both store ISO text here).
    */
  private def storageClass(declared: String): String = {
    val t = declared.toUpperCase
    if (t.isEmpty) "ANY" // untyped sqlite column: stores anything
    else if (t.contains("INT") || t == "BOOLEAN") "INTEGER"
    else if (t.contains("REAL") || t.contains("FLOA") || t.contains("DOUB")) "REAL"
    else if (t.contains("BLOB")) "BLOB"
    else "TEXT" // TEXT/CHAR/DATE/TIMESTAMP → text affinity here
  }

  /** Declared column type, pandas `to_sql` mapping — the golden's CREATE
    * TABLE text depends on these exact names.
    */
  private def declType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "INTEGER"
    case FloatType | DoubleType                        => "REAL"
    case BooleanType                                   => "BOOLEAN"
    case StringType                                    => "TEXT"
    case BinaryType                                    => "BLOB"
    case DateType                                      => "DATE"
    case TimestampType                                 => "TIMESTAMP"
    case other => throw new IllegalArgumentException(s"SqliteIO: unsupported $other")
  }

  // =============================================================== varints

  /** Minimal-length sqlite varint: big-endian base-128, continuation high
    * bit, 9th byte (when present) carries a full 8 bits.
    */
  private[sources] def varintBytes(v: Long): Array[Byte] = {
    val bits = if (v < 0) 64 else math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(v))
    if (bits > 56) {
      val out = new Array[Byte](9)
      out(8) = (v & 0xFF).toByte
      var x = v >>> 8
      var j = 7
      while (j >= 0) { out(j) = ((x & 0x7F) | 0x80).toByte; x >>>= 7; j -= 1 }
      out
    } else {
      val n   = (bits + 6) / 7
      val out = new Array[Byte](n)
      var x = v
      var j = n - 1
      out(j) = (x & 0x7F).toByte // last byte: no continuation bit
      x >>>= 7; j -= 1
      while (j >= 0) { out(j) = ((x & 0x7F) | 0x80).toByte; x >>>= 7; j -= 1 }
      out
    }
  }

  private[sources] def readVarint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(off + i)
      if ((x & 0x80) == 0) return ((v << 7) | (x & 0x7F), i + 1)
      v = (v << 7) | (x & 0x7F)
      i += 1
    }
    ((v << 8) | (b(off + 8) & 0xFF), 9)
  }

  // =============================================================== records

  private def serialFor(v: SqlValue): Long = v match {
    case null => 0L
    // the 0/1 one-byte serials apply to LONGS only: a bare `case 0L`
    // before the typed match would also capture Double 0.0/-0.0/1.0 via
    // Scala cooperative equality, silently storing -0.0 as integer 0 and
    // losing its sign (sqlite itself excludes -0.0 from its REAL-as-int
    // optimization by bit-pattern compare)
    case x: Long if x == 0L => 8L
    case x: Long if x == 1L => 9L
    case x: Long =>
      if (x >= Byte.MinValue && x <= Byte.MaxValue) 1L
      else if (x >= Short.MinValue && x <= Short.MaxValue) 2L
      else if (x >= -8388608L && x <= 8388607L) 3L
      else if (x >= Int.MinValue && x <= Int.MaxValue) 4L
      else if (x >= -140737488355328L && x <= 140737488355327L) 5L
      else 6L
    case _: Double      => 7L
    case s: String      => 13L + 2L * s.getBytes(UTF_8).length
    case b: Array[Byte] => 12L + 2L * b.length
    case other => throw new IllegalArgumentException(
      s"SqliteIO: unsupported value class ${other.getClass}")
  }

  /** Body length of a serial type. Text (odd ≥13) and blob (even ≥12)
    * collapse to one formula: (n-12)/2 in integer division.
    */
  private def serialLen(s: Long): Int = s match {
    case 0 | 8 | 9 => 0
    case 1 => 1
    case 2 => 2
    case 3 => 3
    case 4 => 4
    case 5 => 6
    case 6 | 7 => 8
    case n if n >= 12 => ((n - 12) / 2).toInt
    case n => throw new IllegalStateException(s"bad serial type $n")
  }

  private[sources] def recordBytes(values: Seq[SqlValue]): Array[Byte] = {
    val serials     = values.map(serialFor)
    val serialBytes = serials.map(varintBytes)
    val stLen       = serialBytes.map(_.length).sum
    // the header-size varint includes itself: iterate to the fixed point
    var hvLen = 1
    while (varintBytes((stLen + hvLen).toLong).length != hvLen)
      hvLen = varintBytes((stLen + hvLen).toLong).length
    val headerLen = stLen + hvLen
    val bodyLen   = serials.map(serialLen).sum
    val out = ByteBuffer.allocate(headerLen + bodyLen).order(ByteOrder.BIG_ENDIAN)
    out.put(varintBytes(headerLen.toLong))
    serialBytes.foreach(out.put)
    values.zip(serials).foreach {
      case (_, 0L) | (_, 8L) | (_, 9L) => ()
      case (v, 1L) => out.put(v.asInstanceOf[Long].toByte)
      case (v, 2L) => out.putShort(v.asInstanceOf[Long].toShort)
      case (v, 3L) =>
        val x = v.asInstanceOf[Long]
        out.put((x >> 16).toByte).put((x >> 8).toByte).put(x.toByte)
      case (v, 4L) => out.putInt(v.asInstanceOf[Long].toInt)
      case (v, 5L) =>
        val x = v.asInstanceOf[Long]
        out.put((x >> 40).toByte).put((x >> 32).toByte).put((x >> 24).toByte)
          .put((x >> 16).toByte).put((x >> 8).toByte).put(x.toByte)
      case (v, 6L) => out.putLong(v.asInstanceOf[Long])
      case (v, 7L) => out.putDouble(v.asInstanceOf[Double])
      case (v, n) if n >= 13 && n % 2 == 1 =>
        out.put(v.asInstanceOf[String].getBytes(UTF_8))
      case (v, n) if n >= 12 && n % 2 == 0 =>
        out.put(v.asInstanceOf[Array[Byte]])
      case (_, n) => throw new IllegalStateException(s"bad serial $n")
    }
    out.array()
  }

  private[sources] def decodeRecord(payload: Array[Byte]): Seq[SqlValue] = {
    val (headerLen, n0) = readVarint(payload, 0)
    var hoff    = n0
    val serials = ArrayBuffer[Long]()
    while (hoff < headerLen) {
      val (s, n) = readVarint(payload, hoff)
      serials += s
      hoff += n
    }
    var boff = headerLen.toInt
    def be(len: Int): Long = {
      var x = 0L
      var i = 0
      while (i < len) { x = (x << 8) | (payload(boff + i) & 0xFFL); i += 1 }
      x << (64 - 8 * len) >> (64 - 8 * len) // sign-extend
    }
    serials.map { s =>
      val v: SqlValue = s match {
        case 0 => null
        case 8 => 0L
        case 9 => 1L
        case 1 | 2 | 3 | 4 => be(serialLen(s))
        case 5 => be(6)
        case 6 => be(8)
        case 7 =>
          var x = 0L
          for (i <- 0 until 8) x = (x << 8) | (payload(boff + i) & 0xFFL)
          java.lang.Double.longBitsToDouble(x)
        case n if n >= 13 && n % 2 == 1 =>
          new String(payload, boff, serialLen(n), UTF_8)
        case n if n >= 12 && n % 2 == 0 =>
          java.util.Arrays.copyOfRange(payload, boff, boff + serialLen(n))
        case n => throw new IllegalStateException(s"bad serial type $n")
      }
      boff += serialLen(s)
      v
    }.toSeq
  }

  // ============================================================ file build

  /** Local-payload size for a table-leaf cell of `p` payload bytes — the
    * documented X/M/K formulas.
    */
  private def localPayload(p: Int, usable: Int): Int = {
    val x = usable - 35
    if (p <= x) p
    else {
      val m = ((usable - 12) * 32) / 255 - 23
      val k = m + (p - m) % (usable - 4)
      if (k <= x) k else m
    }
  }

  private case class Cell(bytes: Array[Byte], rowid: Long,
      overflow: Seq[Array[Byte]], ovPtrOffset: Int)

  private def buildCell(rec: Array[Byte], rowid: Long): Cell = {
    val local = localPayload(rec.length, Usable)
    val head  = varintBytes(rec.length.toLong) ++ varintBytes(rowid)
    if (local == rec.length) Cell(head ++ rec, rowid, Nil, -1)
    else {
      val chunks = rec.drop(local).grouped(Usable - 4).toSeq
      val bytes  = head ++ rec.take(local) ++ new Array[Byte](4)
      Cell(bytes, rowid, chunks, bytes.length - 4)
    }
  }

  /** Fill a leaf table page: 8-byte header (+100 on page 1), cell pointer
    * array from the top, cell content packed down from the page end.
    */
  private def writeLeaf(page: Array[Byte], headerOff: Int, cells: Seq[Cell]): Unit = {
    val buf = ByteBuffer.wrap(page).order(ByteOrder.BIG_ENDIAN)
    var content = Usable
    cells.zipWithIndex.foreach { case (c, i) =>
      content -= c.bytes.length
      System.arraycopy(c.bytes, 0, page, content, c.bytes.length)
      buf.putShort(headerOff + 8 + 2 * i, content.toShort)
    }
    page(headerOff) = 13
    buf.putShort(headerOff + 1, 0)                    // no freeblocks
    buf.putShort(headerOff + 3, cells.length.toShort) // cell count
    buf.putShort(headerOff + 5, content.toShort)      // content start
    page(headerOff + 7) = 0                           // fragmented bytes
  }

  /** Fill an interior table page over `children` (page, max-rowid) — the
    * last child becomes the right-most pointer.
    */
  private def writeInterior(page: Array[Byte], children: Seq[(Int, Long)]): Unit = {
    val buf = ByteBuffer.wrap(page).order(ByteOrder.BIG_ENDIAN)
    var content = Usable
    val cells = children.dropRight(1)
    cells.zipWithIndex.foreach { case ((child, maxRowid), i) =>
      val kb = varintBytes(maxRowid)
      content -= 4 + kb.length
      buf.putInt(content, child)
      System.arraycopy(kb, 0, page, content + 4, kb.length)
      buf.putShort(12 + 2 * i, content.toShort)
    }
    page(0) = 5
    buf.putShort(1, 0)
    buf.putShort(3, cells.length.toShort)
    buf.putShort(5, content.toShort)
    page(7) = 0
    buf.putInt(8, children.last._1)
  }

  /** Write a complete single-table database file atomically. */
  private def writeTable(path: String, tableName: String, createSql: String,
      rows: Seq[Seq[SqlValue]], cookie: Int, changeCounter: Int): Unit = {
    val pages = ArrayBuffer[Array[Byte]]()
    def newPage(): Int = { pages += new Array[Byte](PageSize); pages.length }
    newPage() // page 1: schema root

    // ---- pack data cells into leaves (header 8 + 2 per pointer + bytes)
    val cells  = rows.zipWithIndex.map { case (r, i) => buildCell(recordBytes(r), i + 1L) }
    val leaves = ArrayBuffer[Seq[Cell]]()
    var cur    = ArrayBuffer[Cell]()
    var used   = 8
    cells.foreach { c =>
      val need = c.bytes.length + 2
      if (cur.nonEmpty && used + need > Usable) {
        leaves += cur.toSeq; cur = ArrayBuffer(); used = 8
      }
      cur += c; used += need
    }
    if (cur.nonEmpty || leaves.isEmpty) leaves += cur.toSeq
    val leafPages = leaves.map(_ => newPage())

    // ---- interior levels bottom-up until one root remains
    var level: Seq[(Int, Long)] = leafPages.zip(leaves).map { case (p, cs) =>
      (p, if (cs.isEmpty) 0L else cs.last.rowid)
    }.toSeq
    while (level.length > 1) {
      val groups = ArrayBuffer[ArrayBuffer[(Int, Long)]]()
      var group  = ArrayBuffer[(Int, Long)]()
      var gUsed  = 12
      level.foreach { child =>
        val need = 2 + 4 + varintBytes(child._2).length
        // keep ≥2 children per interior page (a 1-child interior is legal
        // but degenerate); page capacity ~500 cells so this rarely trips
        if (group.length >= 2 && gUsed + need > Usable) {
          groups += group; group = ArrayBuffer(); gUsed = 12
        }
        group += child; gUsed += need
      }
      if (group.nonEmpty) groups += group
      // a TRAILING 1-child group (level size ≡ 1 mod page capacity) would
      // become a zero-cell interior page holding only the right-most
      // pointer — degenerate; steal the previous group's last child so
      // every interior page carries ≥1 cell (the donor had ≥2 and stays
      // ≥1; the 2-child receiver trivially fits a fresh page)
      if (groups.length >= 2 && groups.last.length == 1) {
        val donor = groups(groups.length - 2)
        groups.last.prepend(donor.remove(donor.length - 1))
      }
      level = groups.map { g =>
        val p = newPage()
        writeInterior(pages(p - 1), g.toSeq)
        (p, g.last._2)
      }.toSeq
    }
    val dataRoot = level.head._1

    // ---- overflow chains; pointers patched into cells, then emit leaves
    leaves.zip(leafPages).foreach { case (cs, p) =>
      cs.foreach { c =>
        if (c.overflow.nonEmpty) {
          val chain = c.overflow.map(_ => newPage())
          chain.zip(c.overflow).zipWithIndex.foreach { case ((pg, chunk), i) =>
            val buf = ByteBuffer.wrap(pages(pg - 1)).order(ByteOrder.BIG_ENDIAN)
            buf.putInt(0, if (i + 1 < chain.length) chain(i + 1) else 0)
            System.arraycopy(chunk, 0, pages(pg - 1), 4, chunk.length)
          }
          ByteBuffer.wrap(c.bytes).order(ByteOrder.BIG_ENDIAN)
            .putInt(c.ovPtrOffset, chain.head)
        }
      }
      writeLeaf(pages(p - 1), 0, cs)
    }

    // ---- page 1: sqlite_master leaf + 100-byte header
    val masterRec = recordBytes(Seq("table", tableName, tableName,
      dataRoot.toLong, createSql))
    // page 1 loses 100 header bytes: 100 + 8 page header + 2 pointer +
    // ≤5 cell varints must still fit ahead of the record
    require(masterRec.length <= Usable - 120,
      s"CREATE TABLE statement too large (${masterRec.length} bytes)")
    writeLeaf(pages(0), 100, Seq(buildCell(masterRec, 1L)))

    val h = ByteBuffer.wrap(pages(0)).order(ByteOrder.BIG_ENDIAN)
    h.position(0)
    h.put(Magic)
    h.putShort(16, PageSize.toShort)
    h.put(18, 1.toByte); h.put(19, 1.toByte) // rollback-journal write/read
    h.put(20, 0.toByte)                      // reserved space per page
    h.put(21, 64.toByte); h.put(22, 32.toByte); h.put(23, 32.toByte)
    h.putInt(24, changeCounter)
    h.putInt(28, pages.length)               // db size in pages
    h.putInt(32, 0); h.putInt(36, 0)         // no freelist
    h.putInt(40, cookie)
    h.putInt(44, 4)                          // schema format 4 (serials 8/9)
    h.putInt(48, 0)
    h.putInt(52, 0)                          // not auto-vacuum
    h.putInt(56, 1)                          // UTF-8
    h.putInt(60, 0); h.putInt(64, 0); h.putInt(68, 0)
    h.putInt(92, changeCounter)              // version-valid-for
    h.putInt(96, VersionNumber)

    // the format reserves the page spanning byte offset 1 GiB (the
    // lock-byte page) — a writer that reaches it must skip it, which this
    // sequential allocator does not do. Cap loudly below it; a database
    // that large has outgrown a report-scale sink anyway.
    require(pages.length < (1073741824 / PageSize) + 1,
      s"database would span the 1 GiB lock-byte page (${pages.length} pages) — " +
        "use the distributed parquet/JSONL sinks for tables this large")
    AtomicFiles.write(path) { tmp =>
      // buffered: one syscall per 64 KiB instead of one per 4 KiB page —
      // every append rewrites the whole file inside the lock window
      val out = new java.io.BufferedOutputStream(
        Files.newOutputStream(tmp.toPath), 1 << 16)
      try pages.foreach(out.write)
      finally out.close()
    }
  }
}
