package graft.io

import java.nio.file.Path

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file column statistics (min/max zone maps) riding the snapshot
  * manifest — Iceberg's `lower_bounds`/`upper_bounds`, the piece that turns
  * a predicate on ANY statted column into file-level skipping before a
  * single data byte is read. The reference's only pushdown is projection
  * (/root/reference/src/graph_loader.rs:978-1026); this is the engine's
  * equivalent leap on the predicate side: at 100 TB, a time-range or
  * id-range query should touch the handful of files whose ranges overlap,
  * not every file of every bucket.
  *
  * Mechanics:
  *  - At commit, each writer reads the parquet FOOTERS of its own added
  *    files (same O(new files) cost class as the size stat) and encodes
  *    min/max per eligible top-level column; entries carry forward from
  *    the parent manifest for unchanged files, exactly like sizes.
  *  - Manifest field `"colstats":[{...},{...}]`, index-aligned with
  *    `"files"`. Entry format: `{"col":["min","max"],...}` with both
  *    bounds encoded as JSON strings (numerics in decimal, timestamps as
  *    epoch micros, dates as epoch days, strings escaped verbatim).
  *  - Pruning is CONSERVATIVE by construction: a column absent from a
  *    file's entry (no stats in footer, unsupported type, value too long)
  *    simply never excludes that file, and unsupported predicate shapes
  *    exclude nothing.
  *
  * Stats are best-effort metadata: a failure to read one footer degrades
  * that file to "never skipped", never fails the commit.
  */
object ManifestStats {

  /** Strings longer than this are not recorded: a truncated lower bound
    * would still be valid but a truncated UPPER bound is wrong without
    * Iceberg's increment-last-byte trick, and long strings (html, text)
    * are poor zone-map material anyway.
    */
  private val MaxStringLen = 64

  /** Column names that could collide with the flat manifest's own regex-
    * parsed keys, or that embed JSON-hostile characters — excluded from
    * stats (they stay readable, they just never prune).
    */
  private def eligibleName(n: String): Boolean =
    n.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*") &&
      !Set("schema", "files", "sizes", "seqs", "colstats", "deletes",
        "delseqs", "epochs", "partitions", "snapshot", "rows", "filerows",
        "maxfid", "bucket_key", "buckets", "ghosts",
        "bucket_fn").contains(n)

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  private def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); case 'r' => b.append('\r')
          case 't' => b.append('\t'); case o => b.append(o)
        }
        i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  // ---- commit side: parquet footer → manifest entry ------------------------

  /** One shared bare Configuration: constructing a fresh one per footer
    * read costs more than the read itself (measured ~8 ms/file, dominated
    * by conf+filesystem setup; shared conf + parallel reads cut a
    * ~100-file commit's stats pass to tens of ms).
    */
  private lazy val hadoopConf = new org.apache.hadoop.conf.Configuration(false)

  /** Encode one file's column stats as a manifest entry (`{}` when nothing
    * usable). Never throws — stats are advisory.
    */
  def statsEntryOf(file: Path): String = statsAndCount(file)._1

  /** Stats entry AND the file's exact row count, from ONE footer open.
    * Row count -1 when the footer is unreadable (stats stay advisory; a
    * -1 in the manifest refuses metadata-only aggregation for the table,
    * it never corrupts it).
    */
  def statsAndCount(file: Path): (String, Long) =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toUri), hadoopConf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        // column dotted path → merged (min, max) in encoded form. A column
        // missing usable stats in ANY block is dropped (the merge must
        // cover every row of the file).
        var merged = Map.empty[String, (String, String)]
        var dropped = Set.empty[String]
        for (b <- blocks; c <- b.getColumns.asScala) {
          val name = c.getPath.toDotString
          if (c.getPath.size() == 1 && eligibleName(name) && !dropped(name)) {
            encodeStats(c) match {
              case Some((mn, mx)) =>
                merged += name -> (merged.get(name) match {
                  case Some((pmn, pmx)) =>
                    val dt = statKind(c)
                    (if (cmpEnc(dt, mn, pmn) < 0) mn else pmn,
                      if (cmpEnc(dt, mx, pmx) > 0) mx else pmx)
                  case None => (mn, mx)
                })
              case None => dropped += name; merged -= name
            }
          }
        }
        val rows = blocks.iterator.map(_.getRowCount).sum
        val entry =
          if (merged.isEmpty) "{}"
          else merged.toSeq.sortBy(_._1).map { case (n, (mn, mx)) =>
            s""""${esc(n)}":["${esc(mn)}","${esc(mx)}"]"""
          }.mkString("{", ",", "}")
        (entry, rows)
      } finally reader.close()
    } catch { case scala.util.control.NonFatal(_) => ("{}", -1L) }

  /** "l" = integral-compared, "d" = double-compared, "s" = string/bytes. */
  private def statKind(c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): String = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    c.getPrimitiveType.getPrimitiveTypeName match {
      case INT32 | INT64 | BOOLEAN => "l"
      case FLOAT | DOUBLE => "d"
      case BINARY => "s"
      case _ => "x"
    }
  }

  private def encodeStats(
      c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Option[(String, String)] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val st = c.getStatistics
    if (st == null || !st.hasNonNullValue) return None
    val ann = c.getPrimitiveType.getLogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    c.getPrimitiveType.getPrimitiveTypeName match {
      case INT32 | INT64 =>
        ann match {
          // Decimal-annotated ints would need scale handling — skip them.
          case _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => None
          // Timestamp bounds are only usable when the file's unit is the
          // one Spark's internal representation (and our comparators/
          // decoders) assume: MICROS. A TIMESTAMP_MILLIS-written file's
          // bounds fed into the micros-based compare would mis-prune
          // scans and, worse, let metadata MIN/MAX return values 1000×
          // off — record nothing and both paths stay conservative.
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
              if t.getUnit != LogicalTypeAnnotation.TimeUnit.MICROS => None
          case _: LogicalTypeAnnotation.TimeLogicalTypeAnnotation => None
          case _ => Some((st.genericGetMin.toString, st.genericGetMax.toString))
        }
      case FLOAT | DOUBLE =>
        val mn = st.genericGetMin.toString.toDouble
        val mx = st.genericGetMax.toString.toDouble
        // Files containing NaN have unreliable double stats in older
        // writers; NaN bounds themselves are unusable for pruning.
        if (mn.isNaN || mx.isNaN) None
        else Some((st.genericGetMin.toString, st.genericGetMax.toString))
      case BOOLEAN =>
        Some((if (st.genericGetMin.asInstanceOf[Boolean]) "1" else "0",
          if (st.genericGetMax.asInstanceOf[Boolean]) "1" else "0"))
      case BINARY if ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        val mn = st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
          .toStringUsingUTF8
        val mx = st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
          .toStringUsingUTF8
        if (mn.length > MaxStringLen || mx.length > MaxStringLen) None
        else Some((mn, mx))
      case _ => None
    }
  }

  private def cmpEnc(kind: String, a: String, b: String): Int = kind match {
    case "l" => java.lang.Long.compare(a.toLong, b.toLong)
    case "d" => java.lang.Double.compare(a.toDouble, b.toDouble)
    case _ => utf8Cmp(a, b)
  }

  /** Spark compares strings as unsigned UTF-8 bytes (UTF8String order) —
    * Java String.compareTo (UTF-16 code units) disagrees above the BMP.
    */
  private def utf8Cmp(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  // ---- manifest parsing ----------------------------------------------------

  /** Raw per-file entry strings of a manifest's `"colstats"` array, in file
    * order (None for pre-stats manifests). Depth-aware scan — entries are
    * nested objects, regexes can't split them.
    */
  def rawEntries(json: String): Option[Seq[String]] = {
    val key = "\"colstats\":["
    val start = json.indexOf(key)
    if (start < 0) return None
    val out = Seq.newBuilder[String]
    var i = start + key.length
    var depth = 0
    var entryStart = -1
    var inStr = false
    var done = false
    while (!done && i < json.length) {
      val ch = json.charAt(i)
      if (inStr) {
        if (ch == '\\') i += 1
        else if (ch == '"') inStr = false
      } else ch match {
        case '"' => inStr = true
        case '{' => if (depth == 0) entryStart = i; depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) { out += json.substring(entryStart, i + 1) }
        case ']' if depth == 0 => done = true
        case _ =>
      }
      i += 1
    }
    if (!done) None else Some(out.result())
  }

  /** column → (encodedMin, encodedMax) → one entry string (inverse of
    * [[parseEntry]], used when a schema-evolution commit must RE-KEY
    * carried-forward entries — see rekeyEntry).
    */
  def serializeEntry(m: Map[String, (String, String)]): String =
    if (m.isEmpty) "{}"
    else m.toSeq.sortBy(_._1).map { case (n, (mn, mx)) =>
      s""""${esc(n)}":["${esc(mn)}","${esc(mx)}"]"""
    }.mkString("{", ",", "}")

  /** Apply a rename/drop re-keying to one carried-forward entry:
    * `rekey(old) = Some(new)` renames the stats key, `None` strips it.
    * Stats follow the FIELD's identity, not its name — after RENAME y TO x
    * the old files' y-values ARE column x under id resolution, so y's
    * bounds remain exact for x; after DROP x a stale x entry would alias
    * any later column reusing the name (silently wrong pruning), so it
    * must not survive the drop commit. A rename target that is not an
    * eligible stats key strips instead of renaming.
    */
  def rekeyEntry(entry: String, rekey: Map[String, Option[String]]): String =
    if (rekey.isEmpty || entry == "{}") entry
    else serializeEntry(parseEntry(entry).flatMap { case (n, b) =>
      rekey.get(n) match {
        case None => Some(n -> b) // untouched column
        case Some(Some(to)) if eligibleName(to) => Some(to -> b)
        case _ => None // dropped, or renamed to an ineligible key
      }
    })

  /** One entry string → column → (encodedMin, encodedMax). */
  def parseEntry(entry: String): Map[String, (String, String)] =
    """"((?:[^"\\]|\\.)*)":\["((?:[^"\\]|\\.)*)","((?:[^"\\]|\\.)*)"\]""".r
      .findAllMatchIn(entry)
      .map(m => unesc(m.group(1)) -> (unesc(m.group(2)), unesc(m.group(3))))
      .toMap

  // ---- pruning -------------------------------------------------------------

  /** Predicate shapes the zone maps can evaluate. Values are CATALYST
    * INTERNAL representations (Long micros for timestamps, Int days for
    * dates, UTF8String for strings) so both front doors — V1 source
    * filters and catalyst expressions — normalize into one comparator.
    */
  sealed trait StatPred
  final case class Cmp(col: String, op: String, v: Any) extends StatPred
  final case class InVals(col: String, vs: Seq[Any]) extends StatPred
  final case class PrefixP(col: String, prefix: UTF8String) extends StatPred
  final case class AndP(l: StatPred, r: StatPred) extends StatPred
  final case class OrP(l: StatPred, r: StatPred) extends StatPred

  /** V1 source filter → StatPred (None = shape not prunable). External
    * values (Instant, LocalDate, java.sql types…) normalize to catalyst
    * internal form via Spark's own converters.
    */
  def fromFilter(f: org.apache.spark.sql.sources.Filter,
                 schema: StructType): Option[StatPred] = {
    import org.apache.spark.sql.sources._
    def conv(col: String, v: Any): Option[Any] =
      schema.fields.find(_.name == col).flatMap { fld =>
        if (v == null) None
        else scala.util.Try(
          org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToCatalystConverter(fld.dataType)(v)).toOption
      }
    f match {
      case EqualTo(c, v) => conv(c, v).map(Cmp(c, "=", _))
      case EqualNullSafe(c, v) if v != null => conv(c, v).map(Cmp(c, "=", _))
      case GreaterThan(c, v) => conv(c, v).map(Cmp(c, ">", _))
      case GreaterThanOrEqual(c, v) => conv(c, v).map(Cmp(c, ">=", _))
      case LessThan(c, v) => conv(c, v).map(Cmp(c, "<", _))
      case LessThanOrEqual(c, v) => conv(c, v).map(Cmp(c, "<=", _))
      case In(c, vs) if vs.nonEmpty && !vs.contains(null) =>
        val conved = vs.toSeq.map(conv(c, _))
        if (conved.forall(_.isDefined)) Some(InVals(c, conved.flatten))
        else None
      case StringStartsWith(c, p) =>
        Some(PrefixP(c, UTF8String.fromString(p)))
      case And(l, r) =>
        (fromFilter(l, schema), fromFilter(r, schema)) match {
          case (Some(a), Some(b)) => Some(AndP(a, b))
          case (a, b) => a.orElse(b) // half a conjunction still prunes
        }
      case Or(l, r) =>
        for { a <- fromFilter(l, schema); b <- fromFilter(r, schema) }
          yield OrP(a, b)
      case _ => None
    }
  }

  /** A user's predicate `Column` → StatPreds, one per prunable conjunct.
    * Spark 4 Columns are trees of `sql.internal.ColumnNode`s (function
    * names as strings, literal values in EXTERNAL form) — matched here
    * directly; values normalize through the same catalyst converters as
    * the V1 filter path.
    */
  def fromColumn(c: org.apache.spark.sql.Column,
                 schema: StructType): Seq[StatPred] = {
    import org.apache.spark.sql.GraftColumnBridge.{PAttr, PCall, PLit, PredNode}
    def nameOf(n: PredNode): Option[String] = n match {
      case PAttr(a) => Some(a)
      case _ => None
    }
    def convFor(colName: String, v: Any): Option[Any] =
      schema.fields.find(_.name == colName).flatMap { fld =>
        if (v == null) None
        else scala.util.Try(
          org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToCatalystConverter(fld.dataType)(v)).toOption
      }
    def cmpOf(op: String, a: PredNode, b: PredNode): Option[StatPred] =
      (a, b) match {
        case (attr, PLit(v)) =>
          for { n <- nameOf(attr); cv <- convFor(n, v) } yield Cmp(n, op, cv)
        case (PLit(v), attr) =>
          val flip = Map(">" -> "<", "<" -> ">", ">=" -> "<=", "<=" -> ">=",
            "=" -> "=")
          for { n <- nameOf(attr); cv <- convFor(n, v) }
            yield Cmp(n, flip(op), cv)
        case _ => None
      }
    def one(n: PredNode): Option[StatPred] = n match {
      case PCall(fn, args) => (fn, args) match {
        case ("=" | "==" | "equal_to", Seq(a, b)) => cmpOf("=", a, b)
        case (">", Seq(a, b)) => cmpOf(">", a, b)
        case (">=", Seq(a, b)) => cmpOf(">=", a, b)
        case ("<", Seq(a, b)) => cmpOf("<", a, b)
        case ("<=", Seq(a, b)) => cmpOf("<=", a, b)
        case ("in", attr +: vals) if vals.nonEmpty =>
          nameOf(attr).flatMap { nm =>
            val conved = vals.map {
              case PLit(v) => convFor(nm, v)
              case _ => None
            }
            if (conved.forall(_.isDefined)) Some(InVals(nm, conved.flatten.toSeq))
            else None
          }
        case ("startswith", Seq(attr, PLit(s: String))) =>
          nameOf(attr).map(PrefixP(_, UTF8String.fromString(s)))
        case ("or", Seq(a, b)) =>
          for { l <- one(a); r <- one(b) } yield OrP(l, r)
        case ("and", Seq(a, b)) =>
          (one(a), one(b)) match {
            case (Some(l), Some(r)) => Some(AndP(l, r))
            case (l, r) => l.orElse(r)
          }
        case _ => None
      }
      case _ => None
    }
    def conjuncts(n: PredNode): Seq[PredNode] = n match {
      case PCall("and", args) if args.length == 2 => args.flatMap(conjuncts)
      case other => Seq(other)
    }
    conjuncts(org.apache.spark.sql.GraftColumnBridge.predTreeOf(c))
      .flatMap(one(_).toSeq)
  }

  /** Resolved catalyst expression (the SQL command path) → StatPreds,
    * one per prunable conjunct. Literal values are already internal.
    */
  def fromExpression(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[StatPred] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    def nameOf(x: Expression): Option[String] = x match {
      case a: AttributeReference => Some(a.name)
      case u: UnresolvedAttribute if u.nameParts.length == 1 =>
        Some(u.nameParts.head)
      case _ => None
    }
    def one(x: Expression): Option[StatPred] = x match {
      case EqualTo(a, Literal(v, _)) if v != null => nameOf(a).map(Cmp(_, "=", v))
      case EqualTo(Literal(v, _), a) if v != null => nameOf(a).map(Cmp(_, "=", v))
      case GreaterThan(a, Literal(v, _)) if v != null => nameOf(a).map(Cmp(_, ">", v))
      case GreaterThan(Literal(v, _), a) if v != null => nameOf(a).map(Cmp(_, "<", v))
      case GreaterThanOrEqual(a, Literal(v, _)) if v != null => nameOf(a).map(Cmp(_, ">=", v))
      case GreaterThanOrEqual(Literal(v, _), a) if v != null => nameOf(a).map(Cmp(_, "<=", v))
      case LessThan(a, Literal(v, _)) if v != null => nameOf(a).map(Cmp(_, "<", v))
      case LessThan(Literal(v, _), a) if v != null => nameOf(a).map(Cmp(_, ">", v))
      case LessThanOrEqual(a, Literal(v, _)) if v != null => nameOf(a).map(Cmp(_, "<=", v))
      case LessThanOrEqual(Literal(v, _), a) if v != null => nameOf(a).map(Cmp(_, ">=", v))
      case In(a, vs) if vs.nonEmpty && vs.forall {
        case Literal(v, _) => v != null; case _ => false } =>
        nameOf(a).map(InVals(_, vs.map { case Literal(v, _) => v }))
      case StartsWith(a, Literal(v: UTF8String, _)) if v != null =>
        nameOf(a).map(PrefixP(_, v))
      case Or(l, r) =>
        for { a <- one(l); b <- one(r) } yield OrP(a, b)
      case _ => None
    }
    def conjuncts(x: Expression): Seq[Expression] = x match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(e).flatMap(one)
  }

  /** MAY the file (described by `stats`) contain a row satisfying `p`?
    * Missing stats, unknown columns, or un-comparable values → true.
    */
  def mayMatch(stats: Map[String, (String, String)], schema: StructType,
               p: StatPred): Boolean = p match {
    case AndP(l, r) => mayMatch(stats, schema, l) && mayMatch(stats, schema, r)
    case OrP(l, r) => mayMatch(stats, schema, l) || mayMatch(stats, schema, r)
    case Cmp(c, op, v) =>
      bounds(stats, schema, c) match {
        case None => true
        case Some((cmpMin, cmpMax)) =>
          scala.util.Try {
            val dMin = cmpMin(v) // cmp(min, v)
            val dMax = cmpMax(v) // cmp(max, v)
            op match {
              case "=" => dMin <= 0 && dMax >= 0
              case ">" => dMax > 0
              case ">=" => dMax >= 0
              case "<" => dMin < 0
              case "<=" => dMin <= 0
              case _ => true
            }
          }.getOrElse(true)
      }
    case InVals(c, vs) =>
      bounds(stats, schema, c) match {
        case None => true
        case Some((cmpMin, cmpMax)) =>
          vs.exists(v => scala.util.Try(
            cmpMin(v) <= 0 && cmpMax(v) >= 0).getOrElse(true))
      }
    case PrefixP(c, prefix) =>
      (for {
        (mn, mx) <- stats.get(c)
        fld <- schema.fields.find(_.name == c)
        if fld.dataType == StringType
      } yield {
        val mnU = UTF8String.fromString(mn)
        val mxU = UTF8String.fromString(mx)
        val pLen = prefix.numBytes()
        // No match only if every value < prefix (max < prefix) or every
        // value's prefix > prefix (min's first |p| bytes > prefix).
        val minPrefixGt = {
          val take = java.util.Arrays.copyOf(mnU.getBytes,
            math.min(mnU.numBytes(), pLen))
          byteCmp(take, prefix.getBytes) > 0
        }
        !(mxU.compareTo(prefix) < 0 || minPrefixGt)
      }).getOrElse(true)
  }

  private def byteCmp(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Comparators cmp(minBound, v) and cmp(maxBound, v) for a statted
    * column, typed by the TABLE schema (the stats were encoded from the
    * same files the schema describes). None → column unstatted/untypable.
    */
  private def bounds(stats: Map[String, (String, String)], schema: StructType,
                     col: String): Option[(Any => Int, Any => Int)] =
    for {
      (mn, mx) <- stats.get(col)
      fld <- schema.fields.find(_.name == col)
      mk <- cmpFor(fld.dataType)
    } yield (mk(mn), mk(mx))

  /** encodedBound → (internalValue → cmp(bound, value)). */
  private def cmpFor(dt: DataType): Option[String => Any => Int] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some { enc =>
      val b = enc.toLong
      v => java.lang.Long.compare(b, v.asInstanceOf[Number].longValue())
    }
    case BooleanType => Some { enc =>
      val b = enc == "1"
      v => java.lang.Boolean.compare(b, v.asInstanceOf[Boolean])
    }
    case FloatType | DoubleType => Some { enc =>
      val b = enc.toDouble
      v => java.lang.Double.compare(b,
        v.asInstanceOf[Number].doubleValue())
    }
    case StringType => Some { enc =>
      val b = UTF8String.fromString(enc)
      v => b.compareTo(v.asInstanceOf[UTF8String])
    }
    case TimestampType | TimestampNTZType => Some { enc =>
      val b = enc.toLong // epoch micros, both in file stats and internally
      v => java.lang.Long.compare(b, v.asInstanceOf[Number].longValue())
    }
    case DateType => Some { enc =>
      val b = enc.toLong // epoch days
      v => java.lang.Long.compare(b, v.asInstanceOf[Number].longValue())
    }
    case _ => None
  }

  // ---- table-level front door ----------------------------------------------

  /** File → parsed stats for a snapshot (empty map per file when the
    * manifest predates colstats).
    */
  def fileStatsOf(table: String, snapshot: Int)
      : Map[String, Map[String, (String, String)]] = {
    val m = java.nio.file.Paths.get(table).resolve(s"snap-$snapshot.json")
    if (!java.nio.file.Files.exists(m)) return Map.empty
    val json = new String(java.nio.file.Files.readAllBytes(m),
      java.nio.charset.StandardCharsets.UTF_8)
    val files = scala.util.Try(
      IcebergishTable.snapshotFilesOpt(table, snapshot)).toOption
      .flatten.getOrElse(return Map.empty)
    rawEntries(json) match {
      case Some(entries) if entries.length == files.length =>
        files.zip(entries.map(parseEntry)).toMap
      case _ => Map.empty
    }
  }

  /** Metadata MIN/MAX support for a column type: (decode an encoded bound
    * into Spark's INTERNAL value, compare two encoded bounds). Floats and
    * doubles are deliberately unsupported — a file can contain NaN without
    * NaN footer bounds, and SQL MAX must surface the NaN; every other
    * supported type's footer bounds are exact over the file's non-null
    * rows, which is precisely SQL MIN/MAX's domain.
    */
  def minMaxSupport(dt: DataType)
      : Option[(String => Any, (String, String) => Int)] = {
    def longCmp: (String, String) => Int =
      (a, b) => java.lang.Long.compare(a.toLong, b.toLong)
    dt match {
      case ByteType => Some((enc => enc.toLong.toByte, longCmp))
      case ShortType => Some((enc => enc.toLong.toShort, longCmp))
      case IntegerType | DateType => Some((enc => enc.toLong.toInt, longCmp))
      case LongType | TimestampType | TimestampNTZType =>
        Some((enc => enc.toLong, longCmp))
      case BooleanType =>
        Some((enc => enc == "1", (a, b) => a.compareTo(b)))
      case StringType =>
        Some(((enc: String) => UTF8String.fromString(enc),
          (a, b) => utf8Cmp(a, b)))
      case _ => None
    }
  }

  /** The subset of `files` a scan with `preds` must read (zone-map
    * pruning; files without stats always survive).
    */
  def prune(table: String, snapshot: Int, schema: StructType,
            preds: Seq[StatPred], files: Seq[String]): Seq[String] = {
    if (preds.isEmpty) return files
    val statsMap = fileStatsOf(table, snapshot)
    if (statsMap.isEmpty) return files
    files.filter { f =>
      val st = statsMap.getOrElse(f, Map.empty)
      st.isEmpty || preds.forall(p => mayMatch(st, schema, p))
    }
  }
}
