package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** User-facing session bootstrap — the engine's `EngineSession` (SURVEY
  * §7 M1): one call gives a SparkSession with the Hive-gap functions, the
  * graft optimizer rule, UTC session time, AQE (incl. skew join), and
  * sane local-mode shuffle parallelism. A reference (Hive 1.2) user's
  * entry point: `val spark = GraftSession.local(); spark.sql(...)`.
  */
object GraftSession {

  /** Builder preloaded with the graft extensions + recommended confs;
    * callers add master/app/warehouse and build. */
  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")

  /** Local session sized to the machine (shuffle partitions = cores, not
    * the 200 default that fragments small-cluster runs). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Functions.register(s) // idempotent; covers a reused pre-built session
    s
  }

  /** Session + the driver testdata registered as tables — the quickest
    * path to `spark.sql("SELECT ... FROM lineitem")`. */
  def localWithTables(dir: String): SparkSession = {
    val s = local()
    Tables.register(s, dir)
    s
  }

  /** Paged result fetch over a query — the HiveServer2 result-paging
    * lifecycle (reference: service/cli/CLIService.java fetchResults,
    * FetchOrientation.java FETCH_NEXT/FETCH_FIRST;
    * jdbc/HiveStatement.java:421): rows stream to the driver one
    * partition at a time via toLocalIterator, never a full collect. */
  final class ResultPager private[GraftSession] (df: DataFrame, pageSize: Int) {
    require(pageSize > 0, "pageSize must be positive")
    private var it = df.toLocalIterator()
    private var pos = 0L

    /** FETCH_NEXT: up to pageSize rows; empty when exhausted. */
    def fetchNext(): Seq[Row] = {
      val buf = Vector.newBuilder[Row]
      var n = 0
      while (n < pageSize && it.hasNext) { buf += it.next(); n += 1 }
      pos += n
      buf.result()
    }

    /** FETCH_FIRST: rewind to the start (re-executes, as HS2 does when
      * the result isn't cached) and return the first page. */
    def fetchFirst(): Seq[Row] = {
      it = df.toLocalIterator()
      pos = 0L
      fetchNext()
    }

    def position: Long = pos
    def hasMore: Boolean = it.hasNext
  }

  def pager(df: DataFrame, pageSize: Int = 1000): ResultPager =
    new ResultPager(df, pageSize)

  // -- HiveQL statement front door -----------------------------------
  // The statement forms Hive 1.2 accepts but Spark's parser does not
  // (grammar: ql/parse/HiveParser.g loadStatement, exportStatement,
  // importStatement, updateStatement, deleteStatement, createMacro) are
  // recognized here and routed to their graft implementations; anything
  // else goes straight to spark.sql. Statement-level regex routing, same
  // approach as Macros.sql: simple identifiers and single-quoted paths,
  // the shapes Hive's own grammar produces.

  private val LoadRe =
    """(?is)\s*LOAD\s+DATA\s+(LOCAL\s+)?INPATH\s+'([^']+)'\s+(OVERWRITE\s+)?INTO\s+TABLE\s+([\w.]+)\s*(?:PARTITION\s*\(([^)]*)\))?\s*""".r
  private val ExportRe =
    """(?is)\s*EXPORT\s+TABLE\s+([\w.]+)\s+TO\s+'([^']+)'\s*""".r
  private val ImportRe =
    """(?is)\s*IMPORT\s+TABLE\s+([\w.]+)\s+FROM\s+'([^']+)'\s*""".r
  private val UpdateRe =
    """(?is)\s*UPDATE\s+([\w.]+)\s+SET\s+(.+)""".r
  private val DeleteRe =
    """(?is)\s*DELETE\s+FROM\s+([\w.]+)(?:\s+WHERE\s+(.+))?\s*""".r
  private val MacroRe = """(?is)\s*(?:CREATE|DROP)\s+TEMPORARY\s+MACRO\b.*""".r
  private val InsertIntoRe =
    """(?is)\s*INSERT\s+INTO\s+(?:TABLE\s+)?([\w.]+)\s+(SELECT\b.+|VALUES\b.+|WITH\b.+|TABLE\b.+)""".r
  private val AlterCompactRe =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)(?:\s+PARTITION\s*\(([^)]*)\))?\s+COMPACT\s+'(major|minor)'\s*""".r
  private val MergeRe =
    """(?is)\s*MERGE\s+INTO\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?\s+USING\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?\s+ON\s+(.+)""".r
  private val MergeUpdRe =
    """(?is)\s*MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+UPDATE\s+SET\s+(.+)""".r
  private val MergeDelRe =
    """(?is)\s*MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+DELETE\s*""".r
  private val MergeInsRe =
    """(?is)\s*NOT\s+MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+INSERT\s+VALUES\s*\((.+)\)\s*""".r

  private def parsePartitionSpec(spec: String): Seq[(String, String)] =
    spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { kv =>
      val Array(k, v) = kv.split("=", 2).map(_.trim)
      k -> v.stripPrefix("'").stripSuffix("'")
    }

  /** Scan `s` tracking paren depth and single-quoted SQL string literals
    * ('' = escaped quote inside a literal), calling `f(char, index,
    * atTopLevel)` for every character. The shared walker for the SET/
    * WHERE splits — a comma or WHERE inside a string literal must not
    * split the statement. */
  private def scanTopLevel(s: String)(f: (Char, Int, Boolean) => Unit): Unit = {
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        f(c, i, false)
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
            i += 1; f('\'', i, false) // '' = escaped quote, stay in string
          } else inStr = false
        }
      } else c match {
        case '\'' => inStr = true; f(c, i, false)
        case '(' | '[' => depth += 1; f(c, i, false)
        case ')' | ']' => depth -= 1; f(c, i, false)
        case _ => f(c, i, depth == 0)
      }
      i += 1
    }
  }

  /** Positions where `word` appears as a standalone top-level keyword
    * (outside parens and string literals). */
  private def topLevelKeyword(s: String, word: String): Seq[Int] = {
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val n = word.length
    scanTopLevel(s) { (c, i, top) =>
      if (top && c.toLower == word.charAt(0).toLower && i + n <= s.length &&
          s.substring(i, i + n).equalsIgnoreCase(word) &&
          (i == 0 || s.charAt(i - 1).isWhitespace) &&
          (i + n == s.length || s.charAt(i + n).isWhitespace))
        cuts += i
    }
    cuts.toSeq
  }

  /** Split the MERGE tail into (ON condition, WHEN-clause bodies). Only
    * WHEN followed by MATCHED / NOT MATCHED is a clause boundary — an
    * unparenthesized CASE WHEN inside the ON condition or a clause body
    * must not split the statement. */
  private def splitOnWhen(s: String): (String, Seq[String]) = {
    val cuts = topLevelKeyword(s, "WHEN").filter { i =>
      val rest = s.substring(i + 4).dropWhile(_.isWhitespace)
      rest.toUpperCase.startsWith("MATCHED") ||
        rest.toUpperCase.matches("(?s)NOT\\s+MATCHED\\b.*")
    }
    if (cuts.isEmpty) (s.trim, Nil)
    else {
      val bounds = cuts :+ s.length
      val clauses = bounds.sliding(2).map {
        case Seq(a, b) => s.substring(a + 4, b).trim
      }.toSeq
      (s.substring(0, cuts.head).trim, clauses)
    }
  }

  /** Split on top-level commas (quote- and paren-aware). */
  private def splitTopLevelCommas(s: String): Seq[String] = {
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    scanTopLevel(s) { (c, i, top) => if (top && c == ',') cuts += i }
    ((-1 +: cuts.toSeq) :+ s.length).sliding(2).map {
      case Seq(a, b) => s.substring(a + 1, b).trim
    }.filter(_.nonEmpty).toSeq
  }

  /** Split the text after SET into (assignments, optional WHERE clause):
    * the WHERE keyword counts only at top level, outside string literals. */
  private def splitSetWhere(s: String): (String, Option[String]) =
    topLevelKeyword(s, "where").headOption match {
      case None      => (s.trim, None)
      case Some(cut) =>
        (s.substring(0, cut).trim, Some(s.substring(cut + 5).trim))
    }

  /** Split `a = e1, b = e2` on top-level commas (quote- and paren-aware);
    * each assignment splits on its FIRST '=' (column names are simple
    * identifiers, so an '=' inside the expression never comes first). */
  private def parseSetClause(s: String): Map[String, String] = {
    val pairs = splitTopLevelCommas(s).map { a =>
      require(a.contains("="), s"bad SET assignment: $a")
      val Array(c, e) = a.split("=", 2).map(_.trim)
      require(c.matches("""[\w.]+"""), s"bad SET column: $c")
      c -> e
    }
    // Hive rejects assigning the same column twice; .toMap would silently
    // keep the last one
    val dup = pairs.groupBy(_._1.toLowerCase).collect {
      case (c, as) if as.size > 1 => c
    }
    require(dup.isEmpty, s"duplicate SET column(s): ${dup.mkString(", ")}")
    pairs.toMap
  }

  /** HiveQL front door: Hive-only statement forms are routed to graft
    * implementations, everything else to `spark.sql`. DDL-style routes
    * return an empty DataFrame (like Hive's no-result statements).
    * Trailing semicolons (standard in HiveQL scripts) are stripped. */
  def sql(spark: SparkSession, stmt: String): DataFrame = {
    val stripped = stmt.replaceAll(";+\\s*$", "")
    stripped match {
      case MacroRe() =>
        functions.Macros.sql(spark, stripped)
        spark.emptyDataFrame
      case LoadRe(local, path, overwrite, table, partSpec) =>
        // LOCAL INPATH copies and preserves the user's source files;
        // plain INPATH has Hive's move semantics
        Warehouse.loadData(spark, path, table,
          overwrite = overwrite != null,
          partition = Option(partSpec).map(parsePartitionSpec).getOrElse(Nil),
          move = local == null)
        spark.emptyDataFrame
      case ExportRe(table, path) =>
        Warehouse.exportTable(spark, table, path); spark.emptyDataFrame
      case ImportRe(table, path) =>
        Warehouse.importTable(spark, table, path); spark.emptyDataFrame
      // ACID-registered names: route DML to delta-layout transactions
      // (Hive's ACID SQL surface, incl. ALTER TABLE ... COMPACT —
      // ql/ddl AlterTableSimpleDesc compact path); the view refreshes to
      // the new census after every routed txn
      case InsertIntoRe(table, query)
          if Acid.registeredPath(table).isDefined =>
        // positional bind + cast to the table schema (Hive INSERT
        // semantics) — an unaligned literal type (0.5 is DECIMAL in
        // SQL) must not fork the stored row-struct schema across deltas
        val df = spark.sql(query)
        val target = spark.table(table).schema
        require(df.columns.length == target.fields.length,
          s"INSERT arity ${df.columns.length} != ${target.fields.length} " +
            s"columns of $table")
        // positional rename BEFORE selecting: a literal's generated name
        // ("0.5") would otherwise parse as a nested-field accessor
        val renamed = df.toDF(target.fields.map(_.name): _*)
        val aligned = renamed.select(target.fields.map(f =>
          renamed(f.name).cast(f.dataType).as(f.name)): _*)
        Acid.insertTxn(spark, Acid.registeredPath(table).get, aligned)
        Acid.refresh(spark, table)
        spark.emptyDataFrame
      case UpdateRe(table, rest) if Acid.registeredPath(table).isDefined =>
        val (sets, where) = splitSetWhere(rest)
        Acid.updateTxn(spark, Acid.registeredPath(table).get,
          parseSetClause(sets), where.getOrElse("true"))
        Acid.refresh(spark, table)
        spark.emptyDataFrame
      case DeleteRe(table, where) if Acid.registeredPath(table).isDefined =>
        Acid.deleteTxn(spark, Acid.registeredPath(table).get,
          Option(where).getOrElse("true"))
        Acid.refresh(spark, table)
        spark.emptyDataFrame
      case AlterCompactRe(table, partSpec, kind)
          if Acid.registeredPath(table).isDefined =>
        val root = Acid.registeredPath(table).get
        // PARTITION (k='v') compacts that partition's own tree, the
        // reference's per-partition compaction queue entry
        val dir = Option(partSpec).map(parsePartitionSpec).getOrElse(Nil)
          .foldLeft(root) { case (p, (k, v)) => s"$p/$k=$v" }
        if (kind.equalsIgnoreCase("major")) Acid.compactMajor(spark, dir)
        else Acid.compactMinor(spark, dir)
        Acid.refresh(spark, table)
        spark.emptyDataFrame
      case UpdateRe(table, rest) =>
        val (sets, where) = splitSetWhere(rest)
        Warehouse.update(spark, table, parseSetClause(sets),
          where.getOrElse("true"))
        spark.emptyDataFrame
      case DeleteRe(table, where) =>
        Warehouse.delete(spark, table, Option(where).getOrElse("true"))
        spark.emptyDataFrame
      case MergeRe(tgt, tAls, src, sAls, rest) =>
        val (on, clauseTexts) = splitOnWhen(rest)
        val matched =
          scala.collection.mutable.ArrayBuffer.empty[Warehouse.MatchedClause]
        var insert: Option[Warehouse.NotMatchedInsert] = None
        clauseTexts.foreach {
          case MergeInsRe(c, vals) =>
            require(insert.isEmpty, "MERGE allows one NOT MATCHED clause")
            insert = Some(Warehouse.NotMatchedInsert(Option(c),
              splitTopLevelCommas(vals)))
          case MergeUpdRe(c, sets) =>
            matched += Warehouse.MatchedUpdate(Option(c), parseSetClause(sets))
          case MergeDelRe(c) =>
            matched += Warehouse.MatchedDelete(Option(c))
          case other => sys.error(s"unsupported MERGE clause: WHEN $other")
        }
        Acid.registeredPath(tgt) match {
          case Some(path) =>
            Acid.mergeTxn(spark, path, spark.table(src),
              Option(sAls).getOrElse(src.split('.').last),
              Option(tAls).getOrElse(tgt.split('.').last),
              on, matched.toSeq, insert)
            Acid.refresh(spark, tgt)
          case None =>
            Warehouse.merge(spark, tgt,
              Option(tAls).getOrElse(tgt.split('.').last),
              spark.table(src),
              Option(sAls).getOrElse(src.split('.').last),
              on, matched.toSeq, insert)
        }
        spark.emptyDataFrame
      case other => spark.sql(other)
    }
  }
}
