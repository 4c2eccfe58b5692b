package graft.table

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{expr, lit}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import scala.jdk.CollectionConverters._

/** SQL-string surface for the table-management commands the reference
  * drives through `spark.sql(...)` (src/delta_utils.py:99-102, 151-174,
  * 191-195, 319, 356-364, 381-385):
  *
  *   DESCRIBE HISTORY <t> [LIMIT n]
  *   DESCRIBE DETAIL <t>
  *   SHOW TBLPROPERTIES <t>
  *   ALTER TABLE <t> SET TBLPROPERTIES ('k' = 'v' [, ...])
  *   RESTORE TABLE <t> TO VERSION AS OF <n>
  *   RESTORE TABLE <t> TO TIMESTAMP AS OF '<ts>'
  *   ALTER TABLE <t> ADD COLUMN <c> <type> GENERATED ALWAYS AS (<expr>)
  *   ALTER TABLE <t> ADD COLUMN <c> BIGINT GENERATED ALWAYS AS IDENTITY [(START WITH n [INCREMENT BY m])]
  *   OPTIMIZE <t> [WHERE <pred>] [ZORDER BY (c1[, c2...]) | CLUSTER BY (c1[, c2...])]
  *   VACUUM <t> [LITE] [RETAIN <n> HOURS] [DRY RUN]
  *   CREATE TABLE [IF NOT EXISTS] <dst> {DEEP|SHALLOW} CLONE <src>
  *   CONVERT TO GRAFT [parquet.]'<path>'
  *
  * `<t>` is a quoted path ('...' or delta-style `...`) resolved to a
  * [[LakeTable]] by the pluggable `resolve` (default: filesystem path; use
  * the Catalog overload for 3-level names). Every command returns a
  * DataFrame so results compose with `spark.sql` pipelines over temp views
  * (see [[LakeTable.createOrReplaceTempView]] for the query side).
  * Anything that is not one of these commands is delegated to
  * `spark.sql(...)` verbatim, so one entry point serves both surfaces.
  */
class GraftSql(spark: SparkSession, resolve: String => LakeTable) {

  private val describeHistory =
    """(?is)\s*DESCRIBE\s+HISTORY\s+(\S+?)(?:\s+LIMIT\s+(\d+))?(\s+AS\s+JSON)?\s*""".r
  private val describeDetail = """(?is)\s*DESCRIBE\s+DETAIL\s+(\S+)\s*""".r
  private val showProps = """(?is)\s*SHOW\s+TBLPROPERTIES\s+(\S+)\s*""".r
  private val showPartitionsCmd = """(?is)\s*SHOW\s+PARTITIONS\s+(\S+)\s*""".r
  private val setProps =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+SET\s+TBLPROPERTIES\s*\((.+)\)\s*""".r
  private val restoreVersion =
    """(?is)\s*RESTORE\s+TABLE\s+(\S+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*""".r
  private val restoreTs =
    """(?is)\s*RESTORE\s+TABLE\s+(\S+)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*""".r
  private val optimizeCmd =
    """(?is)\s*OPTIMIZE\s+(\S+?)(\s+FULL)?(?:\s+WHERE\s+(.+?))??(?:\s+ZORDER\s+BY\s*\(([^)]+)\)|\s+CLUSTER\s+BY\s*\(([^)]+)\))?\s*""".r
  private val reorgCmd =
    """(?is)\s*REORG\s+TABLE\s+(\S+?)(?:\s+WHERE\s+(.+?))?\s+APPLY\s*\(\s*PURGE\s*\)\s*""".r
  private val generateCmd =
    """(?is)\s*GENERATE\s+(symlink_format_manifest|uniform_iceberg)\s+FOR\s+TABLE\s+(\S+)\s*""".r
  private val vacuumCmd =
    """(?is)\s*VACUUM\s+(\S+?)(\s+LITE)?(?:\s+USING\s+INVENTORY\s+\((.+)\))?(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?(\s+DRY\s+RUN)?\s*""".r
  private val cloneCmd =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\S+)\s+(DEEP|SHALLOW)\s+CLONE\s+(\S+?)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*""".r
  private val setDefaultCmd =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+ALTER\s+COLUMN\s+(\w+)\s+SET\s+DEFAULT\s+(.+?)\s*""".r
  private val dropDefaultCmd =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+ALTER\s+COLUMN\s+(\w+)\s+DROP\s+DEFAULT\s*""".r
  // ALTER TABLE t ALTER COLUMN c TYPE <wider-type> — type widening
  // (metadata-only; see LakeTable.widenColumn)
  private val alterColumnTypeCmd =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+(.+?)\s*""".r
  private val addConstraintCmd =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*""".r
  private val dropConstraintCmd =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+DROP\s+CONSTRAINT\s+(\w+)\s*""".r
  // ALTER TABLE t DROP FEATURE f [TRUNCATE HISTORY] — Delta 3.4's feature
  // removal (see LakeTable.dropFeature)
  private val dropFeatureCmd =
    ("""(?is)\s*ALTER\s+TABLE\s+(\S+)\s+DROP\s+FEATURE\s+""" +
      """([A-Za-z][A-Za-z0-9_-]*)(\s+TRUNCATE\s+HISTORY)?\s*""").r
  // ALTER TABLE t ADD COLUMNS (c1 TYPE [COMMENT '...'], ...) —
  // the reference's schema-evolution DDL (notebooks/04_acid_operations.py:289-295)
  private val addColumnsCmd =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+ADD\s+COLUMNS\s*\((.+)\)\s*""".r
  // ALTER TABLE t ADD COLUMN c BIGINT GENERATED ALWAYS AS IDENTITY
  //   [(START WITH n [INCREMENT BY m])]  /
  // ALTER TABLE t ADD COLUMN c TYPE GENERATED ALWAYS AS (expr) —
  // Delta's identity / generated-column DDL shapes over the ALTER form
  private val addIdentityColumnCmd =
    ("""(?is)\s*ALTER\s+TABLE\s+(\S+)\s+ADD\s+COLUMN\s+(\w+)\s+BIGINT\s+""" +
      """GENERATED\s+ALWAYS\s+AS\s+IDENTITY\s*""" +
      """(?:\(\s*START\s+WITH\s+(-?\d+)\s*(?:INCREMENT\s+BY\s+(-?\d+)\s*)?\))?\s*""").r
  private val addGeneratedColumnCmd =
    ("""(?is)\s*ALTER\s+TABLE\s+(\S+)\s+ADD\s+COLUMN\s+(\w+)\s+([\w(),\s]+?)\s+""" +
      """GENERATED\s+ALWAYS\s+AS\s+\((.+)\)\s*""").r
  private val renameColumnCmd =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*""".r
  private val dropColumnCmd =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+DROP\s+COLUMN\s+(\w+)\s*""".r
  // CONVERT TO GRAFT parquet.`/path` — Delta's CONVERT TO DELTA shape
  private val convertCmd =
    """(?is)\s*CONVERT\s+TO\s+GRAFT\s+(?:parquet\.)?(\S+)\s*""".r
  // SQL DML over graft tables (Delta's UPDATE/DELETE/MERGE INTO SQL forms —
  // the reference drives DML through the builder API only, so this is
  // surface beyond it). MERGE column references must be alias-qualified;
  // arbitrary aliases are rewritten onto the builder's target/source.
  private val updateCmd = """(?is)\s*UPDATE\s+(\S+)\s+SET\s+(.+)""".r
  private val deleteCmd =
    """(?is)\s*DELETE\s+FROM\s+(\S+?)(?:\s+WHERE\s+(.+?))?\s*""".r
  private val mergeCmd = """(?is)\s*MERGE\s+INTO\s+(.+)""".r
  // COPY INTO <t> FROM '<path>' [FILEFORMAT = PARQUET] — Delta's idempotent
  // batch loader shape
  private val copyIntoCmd =
    """(?is)\s*COPY\s+INTO\s+(\S+)\s+FROM\s+(\S+?)(?:\s+FILEFORMAT\s*=\s*(\w+))?(\s+FORCE)?\s*""".r
  private val analyzeCmd =
    """(?is)\s*ANALYZE\s+TABLE\s+(\S+)\s+COMPUTE\s+STATISTICS(?:\s+FOR\s+COLUMNS\s+(.+?))?\s*""".r
  // ALTER TABLE t CLUSTER BY (c1, c2) | CLUSTER BY NONE — Delta's liquid
  // clustering DDL shape, mapped to the graft.clusterBy property
  private val clusterByCmd =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+CLUSTER\s+BY\s+(?:\(([^)]+)\)|(NONE))\s*""".r

  private def unquote(id: String): String = {
    val t = id.trim
    if ((t.startsWith("'") && t.endsWith("'")) || (t.startsWith("`") && t.endsWith("`")))
      t.substring(1, t.length - 1)
    else t
  }
  private def table(id: String): LakeTable = resolve(unquote(id))

  /** RESTORE result row (Delta's restore-metrics shape): the restore
    * commit's own add/remove counts plus the table's post-restore size. */
  private def restoredRow(tbl: LakeTable, ver: Long): DataFrame = {
    val m = tbl.log.readVersion(ver)
      .collectFirst { case c: graft.log.CommitInfo => c }
      .map(_.operationMetrics).getOrElse(Map.empty[String, Long])
    val snap = tbl.log.snapshot()
    oneRow("restored_version" -> ver,
      "num_restored_files" -> m.getOrElse("numAddedFiles", 0L),
      "num_removed_files" -> m.getOrElse("numRemovedFiles", 0L),
      "num_of_files_after_restore" -> snap.numFiles.toLong,
      "table_size_after_restore" -> snap.sizeInBytes)
  }

  private def oneRow(fields: (String, Any)*): DataFrame = {
    val schema = StructType(fields.map {
      case (n, _: Long) => StructField(n, LongType)
      case (n, _) => StructField(n, StringType)
    })
    spark.createDataFrame(
      Seq(Row.fromSeq(fields.map(_._2))).asJava, schema)
  }

  /** Split on commas at paren depth 0, outside quoted runs (so
    * `decimal(18,2)` and `'a, b'` survive). */
  private def splitTop(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0; var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '\'' | '"' | '`' => i = skipQuoted(body, i)
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case ',' if depth == 0 =>
          out += body.substring(start, i); start = i + 1; i += 1
        case _ => i += 1
      }
    }
    out += body.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val columnDef =
    """(?is)\s*(\w+)\s+(.+?)(?:\s+COMMENT\s+'([^']*)')?\s*""".r

  /** Parse `c1 TYPE [COMMENT '...'], ...` into StructFields. */
  private def parseColumnDefs(body: String): Seq[StructField] =
    splitTop(body).map {
      case columnDef(name, ddlType, comment) =>
        val f = StructField(name,
          org.apache.spark.sql.types.DataType.fromDDL(ddlType.trim))
        Option(comment).map(c => f.withComment(c)).getOrElse(f)
      case bad => throw new IllegalArgumentException(s"bad column def: $bad")
    }

  /** Index just past the closing quote of the quoted run starting at
    * `start`, honoring SQL quote-doubling ('' / "") as an escape. */
  private def skipQuoted(s: String, start: Int): Int = {
    val q = s.charAt(start); var i = start + 1
    while (i < s.length) {
      if (s.charAt(i) == q) {
        if (q != '`' && i + 1 < s.length && s.charAt(i + 1) == q) i += 2
        else return i + 1
      } else i += 1
    }
    s.length
  }

  /** First top-level occurrence of word-bounded keyword `kw` in `s` at/after
    * `from`, or -1. "Top-level" = outside single/double/backtick-quoted runs
    * (with '' / "" escapes), outside parens, and outside CASE ... END — a
    * CASE's own WHEN/THEN must never read as a MERGE clause boundary. */
  private def topIndexOf(s: String, kw: String, from: Int = 0): Int = {
    var depth = 0; var caseDepth = 0; var i = from
    def isWord(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    def wordAt(w: String): Boolean =
      s.regionMatches(true, i, w, 0, w.length) &&
        (i == 0 || !isWord(s.charAt(i - 1))) &&
        (i + w.length >= s.length || !isWord(s.charAt(i + w.length)))
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' | '"' | '`' => i = skipQuoted(s, i)
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ =>
          if (depth == 0 && wordAt("CASE")) { caseDepth += 1; i += 4 }
          else if (depth == 0 && caseDepth > 0 && wordAt("END")) {
            caseDepth -= 1; i += 3
          }
          else if (depth == 0 && caseDepth == 0 && wordAt(kw)) return i
          else i += 1
      }
    }
    -1
  }

  /** Parse `c1 = expr, c2 = expr, ...` (top-level commas/equals only). */
  private def parseAssignments(body: String): Seq[(String, String)] =
    splitTop(body).map { a =>
      val i = a.indexOf('=')
      require(i > 0, s"bad SET assignment: $a")
      unquote(a.substring(0, i).trim) -> a.substring(i + 1).trim
    }

  /** Parse `'k' = 'v', k2 = v2, ...` (quotes optional, delta-style). */
  private def parseProps(body: String): Map[String, String] =
    body.split(',').iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"bad TBLPROPERTIES entry: $kv")
      unquote(kv.substring(0, i).trim) -> unquote(kv.substring(i + 1).trim)
    }.toMap

  /** Rewrite `tAlias.`/`sAlias.`-qualified references onto the merge
    * builder's fixed target/source aliases. */
  private def realias(c: Column, tAlias: String, sAlias: String): Column = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val e = org.apache.spark.sql.graft.ColumnExpr.of(c).transform {
      case a: UnresolvedAttribute if a.nameParts.length >= 2 &&
          a.nameParts.head.equalsIgnoreCase(tAlias) =>
        UnresolvedAttribute("target" +: a.nameParts.tail)
      case a: UnresolvedAttribute if a.nameParts.length >= 2 &&
          a.nameParts.head.equalsIgnoreCase(sAlias) =>
        UnresolvedAttribute("source" +: a.nameParts.tail)
    }
    org.apache.spark.sql.graft.ColumnExpr.toColumn(e)
  }

  /** Split `<token> [AS] [alias]` — token may be quoted ('...' or `...`). */
  private def tokenAndAlias(spec: String, dflt: String): (String, String) = {
    val s = spec.trim
    val (tok, rest) =
      if (s.startsWith("'") || s.startsWith("`")) {
        val j = s.indexOf(s.charAt(0), 1)
        require(j > 0, s"unterminated quote in: $spec")
        (s.substring(0, j + 1), s.substring(j + 1))
      } else {
        val j = s.indexWhere(Character.isWhitespace)
        if (j < 0) (s, "") else (s.substring(0, j), s.substring(j))
      }
    val alias = rest.trim.split("\\s+").filter(_.nonEmpty) match {
      case Array() => dflt
      case Array(a) => a
      case Array(as0, a) if as0.equalsIgnoreCase("AS") => a
      case _ => throw new IllegalArgumentException(s"bad table spec: $spec")
    }
    (tok, alias)
  }

  /** MERGE INTO <t> [AS a] USING <name|(subquery)> [AS b] ON <cond>
    * WHEN MATCHED [AND c] THEN UPDATE SET *|<sets> | DELETE
    * WHEN NOT MATCHED [BY TARGET] [AND c] THEN INSERT *|(cols) VALUES (...)
    * WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET <sets> | DELETE
    * Column references must be alias-qualified (as with the builder API). */
  private def runMerge(rest: String): DataFrame = {
    val usingIdx = topIndexOf(rest, "USING")
    require(usingIdx > 0, "MERGE INTO requires USING")
    val (tgtTok, tAlias) = tokenAndAlias(rest.substring(0, usingIdx), "target")
    val afterUsing = rest.substring(usingIdx + 5)
    val onIdx = topIndexOf(afterUsing, "ON")
    require(onIdx > 0, "MERGE INTO requires ON")
    val srcSpec = afterUsing.substring(0, onIdx).trim
    val afterOn = afterUsing.substring(onIdx + 2)
    val whenIdx = topIndexOf(afterOn, "WHEN")
    require(whenIdx > 0, "MERGE INTO requires at least one WHEN clause")
    val onSql = afterOn.substring(0, whenIdx).trim
    val whenTail = afterOn.substring(whenIdx)

    val (srcDf, sAlias) =
      if (srcSpec.startsWith("(")) {
        var depth = 0; var end = -1; var i = 0
        while (i < srcSpec.length && end < 0) {
          srcSpec.charAt(i) match {
            case '\'' | '"' | '`' => i = skipQuoted(srcSpec, i)
            case '(' => depth += 1; i += 1
            case ')' => depth -= 1; if (depth == 0) end = i; i += 1
            case _ => i += 1
          }
        }
        require(end > 0, s"unbalanced MERGE source subquery: $srcSpec")
        val (_, alias) = tokenAndAlias("x" + srcSpec.substring(end + 1), "source")
        (spark.sql(srcSpec.substring(1, end)), alias)
      } else {
        val (tok, alias) = tokenAndAlias(srcSpec, "source")
        (spark.table(unquote(tok)), alias)
      }

    def rx(sqlExpr: String): Column = realias(expr(sqlExpr), tAlias, sAlias)
    def rxMap(body: String): Map[String, Column] =
      parseAssignments(body).map { case (k, v) => k -> rx(v) }.toMap

    var b = table(tgtTok).merge(srcDf, rx(onSql))
    var clauses = Vector.empty[String]
    var pos = 0
    while (pos >= 0 && pos < whenTail.length) {
      val next = topIndexOf(whenTail, "WHEN", pos + 1)
      clauses :+= whenTail.substring(pos, if (next < 0) whenTail.length else next).trim
      pos = next
    }
    val updAll = """(?is)\s*UPDATE\s+SET\s+\*\s*""".r
    val upd = """(?is)\s*UPDATE\s+SET\s+(.+)""".r
    val insAll = """(?is)\s*INSERT\s+\*\s*""".r
    val ins = """(?is)\s*INSERT\s*\(([^)]+)\)\s*VALUES\s*\((.+)\)\s*""".r
    val del = """(?is)\s*DELETE\s*""".r
    val nmbsRx = """(?is)^\s*NOT\s+MATCHED\s+BY\s+SOURCE\b(.*)$""".r
    val insRx = """(?is)^\s*NOT\s+MATCHED(?:\s+BY\s+TARGET\b)?(.*)$""".r
    val matchedRx = """(?is)^\s*MATCHED\b(.*)$""".r
    val andRx = """(?is)^\s*AND\s+(.+)$""".r
    clauses.foreach { cl =>
      val body = cl.substring(4).trim // drop WHEN
      val thenIdx = topIndexOf(body, "THEN")
      require(thenIdx > 0, s"WHEN clause missing THEN: $cl")
      // kind detection via regex so the condition text reaches rx()
      // verbatim — normalizing its whitespace would corrupt string literals
      val head = body.substring(0, thenIdx)
      val action = body.substring(thenIdx + 4).trim
      val (kind, condPart) = head match {
        case nmbsRx(rest) => ("nmbs", rest)
        case insRx(rest) => ("insert", rest)
        case matchedRx(rest) => ("matched", rest)
        case _ => throw new IllegalArgumentException(s"bad WHEN clause: $cl")
      }
      val cond = condPart.trim match {
        case "" => None
        case andRx(c) => Some(rx(c))
        case _ => throw new IllegalArgumentException(s"expected AND <cond> in: $cl")
      }
      (kind, action) match {
        case ("matched", updAll()) => b = b.whenMatchedUpdateAll(cond)
        case ("matched", upd(sets)) => b = b.whenMatchedUpdate(rxMap(sets), cond)
        case ("matched", del()) => b = b.whenMatchedDelete(cond)
        case ("insert", insAll()) => b = b.whenNotMatchedInsertAll(cond)
        case ("insert", ins(cols, vals)) =>
          val cs = splitTop(cols).map(unquote)
          val vs = splitTop(vals)
          require(cs.size == vs.size, s"INSERT column/value arity mismatch: $cl")
          b = b.whenNotMatchedInsert(cs.zip(vs.map(rx)).toMap, cond)
        case ("nmbs", upd(sets)) => b = b.whenNotMatchedBySourceUpdate(rxMap(sets), cond)
        case ("nmbs", del()) => b = b.whenNotMatchedBySourceDelete(cond)
        case _ => throw new IllegalArgumentException(s"unsupported MERGE action: $action")
      }
    }
    oneRow("version" -> b.execute())
  }

  def run(sql: String): DataFrame = sql match {
    case describeHistory(t, limit, asJson) =>
      if (asJson != null) table(t).historyJson(Option(limit).map(_.toInt))
      else table(t).history(Option(limit).map(_.toInt))
    case describeDetail(t) => table(t).detail()
    case showPartitionsCmd(t) => table(t).showPartitions()
    case showProps(t) =>
      val props = table(t).properties.toSeq.sortBy(_._1)
      spark.createDataFrame(
        props.map { case (k, v) => Row(k, v) }.asJava,
        StructType(Seq(StructField("key", StringType), StructField("value", StringType))))
    case setDefaultCmd(t, c, dflt) =>
      oneRow("version" -> table(t).setColumnDefault(c, Some(dflt.trim)))
    case dropDefaultCmd(t, c) =>
      oneRow("version" -> table(t).setColumnDefault(c, None))
    case alterColumnTypeCmd(t, c, ddlType) =>
      oneRow("version" -> table(t).widenColumn(c,
        org.apache.spark.sql.types.DataType.fromDDL(ddlType.trim)))
    case addConstraintCmd(t, name, check) =>
      oneRow("version" -> table(t).addConstraint(name, check))
    case dropConstraintCmd(t, name) =>
      oneRow("version" -> table(t).dropConstraint(name))
    case dropFeatureCmd(t, f, trunc) =>
      oneRow("version" -> table(t).dropFeature(f, truncateHistory = trunc != null))
    case addIdentityColumnCmd(t, c, start, step) =>
      oneRow("version" -> table(t).addIdentityColumn(c,
        Option(start).map(_.toLong).getOrElse(1L),
        Option(step).map(_.toLong).getOrElse(1L)))
    case addGeneratedColumnCmd(t, c, ddlType, genExpr) =>
      oneRow("version" -> table(t).addGeneratedColumn(c,
        org.apache.spark.sql.types.DataType.fromDDL(ddlType.trim), genExpr))
    case addColumnsCmd(t, defs) =>
      oneRow("version" -> table(t).addColumns(parseColumnDefs(defs)))
    case renameColumnCmd(t, from, to) =>
      oneRow("version" -> table(t).renameColumn(from, to))
    case dropColumnCmd(t, name) =>
      oneRow("version" -> table(t).dropColumn(name))
    case convertCmd(path) =>
      val t = LakeTable.convert(spark, unquote(path))
      oneRow("location" -> t.dir.toString, "version" -> t.version)
    case generateCmd(mode, t) =>
      if (mode.equalsIgnoreCase("uniform_iceberg"))
        oneRow("manifest" -> table(t).generateIcebergMetadata().toString)
      else oneRow("manifest" -> table(t).generateSymlinkManifest().toString)
    case setProps(t, body) =>
      val v = table(t).setProperties(parseProps(body))
      oneRow("version" -> v)
    case restoreVersion(t, v) =>
      val tbl = table(t)
      restoredRow(tbl, tbl.restoreToVersion(v.toLong))
    case restoreTs(t, ts) =>
      val tbl = table(t)
      restoredRow(tbl,
        tbl.restoreToTimestamp(java.sql.Timestamp.valueOf(ts).getTime))
    case cloneCmd(dst, kind, src, version) =>
      val cloned = table(src).cloneTo(unquote(dst),
        shallow = kind.equalsIgnoreCase("SHALLOW"),
        versionAsOf = Option(version).map(_.toLong))
      oneRow("location" -> cloned.dir.toString)
    case optimizeCmd(t, fullKw, where, zorder, cluster) =>
      val tbl = table(t)
      val pred = Option(where).map(w => expr(w))
      val full = fullKw != null // Delta's OPTIMIZE ... FULL: re-cluster everything
      def colsOf(s: String) = s.split(',').map(_.trim).toSeq.filter(_.nonEmpty)
      val v = (Option(zorder), Option(cluster)) match {
        case (Some(cols), _) => tbl.optimizeZOrder(colsOf(cols), where = pred, full = full)
        case (_, Some(cols)) => tbl.optimizeHilbert(colsOf(cols), where = pred, full = full)
        case _ => tbl.optimizeCompact(where = pred)
      }
      // Delta's OPTIMIZE returns operation metrics, not just a version. A
      // no-op pass (everything already clustered/compacted) commits nothing
      // — its metrics read as zeros, which IS the honest answer.
      val m = tbl.log.readVersion(v)
        .collectFirst { case c: graft.log.CommitInfo if c.operation == "OPTIMIZE" => c }
        .map(_.operationMetrics).getOrElse(Map.empty[String, Long])
      oneRow("version" -> v,
        "numFilesAdded" -> m.getOrElse("numAddedFiles", 0L),
        "numFilesRemoved" -> m.getOrElse("numRemovedFiles", 0L),
        "numOutputRows" -> m.getOrElse("numOutputRows", 0L))
    case reorgCmd(t, where) =>
      oneRow("version" ->
        table(t).reorgPurge(where = Option(where).map(w => expr(w))))
    case vacuumCmd(t, liteKw, inv, retain, dry) =>
      // no RETAIN clause -> -1: the table's retention property (or the
      // 168 h default) decides inside vacuum(). USING INVENTORY (<query>)
      // supplies the physical file listing (path [, modificationTime])
      // instead of walking storage — Delta 3.3's surface.
      val hours = Option(retain).map(_.toDouble).getOrElse(-1.0)
      val paths = table(t).vacuum(hours, dryRun = dry != null,
        lite = liteKw != null, inventory = Option(inv).map(q => spark.sql(q)))
      spark.createDataFrame(
        paths.map(Row(_)).asJava,
        StructType(Seq(StructField("path", StringType))))
    case updateCmd(t, body) =>
      val wIdx = topIndexOf(body, "WHERE")
      val (setPart, wherePart) =
        if (wIdx < 0) (body, None)
        else (body.substring(0, wIdx), Some(body.substring(wIdx + 5)))
      val set = parseAssignments(setPart).map { case (k, v) => k -> expr(v) }.toMap
      oneRow("version" ->
        table(t).update(wherePart.map(expr).getOrElse(lit(true)), set))
    case deleteCmd(t, where) =>
      oneRow("version" ->
        table(t).delete(Option(where).map(expr).getOrElse(lit(true))))
    case mergeCmd(rest) => runMerge(rest)
    case copyIntoCmd(t, src, fmt, force) =>
      oneRow("version" -> table(t).copyInto(unquote(src),
        Option(fmt).map(_.toLowerCase).getOrElse("parquet"),
        force = force != null))
    case clusterByCmd(t, cols, none) =>
      val v =
        if (none != null) table(t).setProperties(Map("graft.clusterBy" -> ""))
        else table(t).setProperties(Map("graft.clusterBy" ->
          cols.split(',').map(c => unquote(c.trim)).filter(_.nonEmpty).mkString(",")))
      oneRow("version" -> v)
    case analyzeCmd(t, cols) =>
      val stats = table(t).analyze(
        Option(cols).map(_.split(',').map(c => unquote(c.trim)).toSeq).getOrElse(Nil))
      spark.createDataFrame(
        stats.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }.asJava,
        StructType(Seq(StructField("key", StringType), StructField("value", StringType))))
    // not a table-management command — plain Spark SQL (temp views etc.)
    case other => spark.sql(other)
  }
}

object GraftSql {
  /** Table identifiers are filesystem paths, or `cat.ns.table` names when
    * `cat` is a registered [[graft.sources.GraftCatalog]] — the DML surface
    * (UPDATE/DELETE/MERGE/OPTIMIZE/VACUUM/...) then composes with tables
    * created through the session catalog:
    * `GraftSql(spark).run("DELETE FROM g.bronze.events WHERE ...")`. */
  def apply(spark: SparkSession): GraftSql =
    new GraftSql(spark, p => resolveSpec(spark, p))

  /** Table identifiers are 3-level catalog names. */
  def apply(spark: SparkSession, catalog: graft.ingest.Catalog): GraftSql =
    new GraftSql(spark, n => catalog.table(n))

  private[graft] def resolveSpec(spark: SparkSession, spec: String): LakeTable = {
    if (!spec.contains("/") && spec.contains(".")) {
      val parts = spec.split('.')
      val cat = parts.head
      val impl = spark.conf.getOption(s"spark.sql.catalog.$cat")
      val wh = spark.conf.getOption(s"spark.sql.catalog.$cat.warehouse")
      if (impl.exists(_.endsWith("GraftCatalog")) && wh.isDefined)
        return LakeTable.forPath(spark, (wh.get +: parts.tail.toSeq).mkString("/"))
    }
    LakeTable.forPath(spark, spec)
  }
}
