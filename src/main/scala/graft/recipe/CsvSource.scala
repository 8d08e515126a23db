package graft.recipe

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

case class RecipeError(msg: String) extends RuntimeException(msg)

/** Recipe input scan: glob expansion, per-file regex line filtering,
  * CSV parse with header imposition, provenance columns and `.meta`
  * sidecar constants, unioned by name (missing -> null). Mirrors bearysta
  * aggregate.py:134-314 with Spark distribution semantics: each file is
  * one `wholetext` row flat-mapped through [[LineFilter]] (per-file
  * sequential state, parallel across files), then parsed by the standard
  * CSV reader with schema inference.
  */
object CsvSource {

  /** Hadoop-FS glob expansion (works for local paths and hdfs/s3 alike),
    * sorted for determinism. */
  def expandGlobs(spark: SparkSession, patterns: Seq[String], baseDir: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    patterns.flatMap { pat =>
      val resolved = if (new java.io.File(pat).isAbsolute) pat
        else new java.io.File(baseDir, pat).getPath
      val p = new Path(resolved)
      val fs = p.getFileSystem(conf)
      Option(fs.globStatus(p)).map(_.toSeq.map(_.getPath.toUri.getPath)).getOrElse(Seq.empty)
    }.sorted
  }

  /** Read one file through the recipe's line filter + CSV parse.
    *
    * The schema is fixed (all-string, names from the driver-side header
    * peek) so the parse is FULLY LAZY: Spark's `inferSchema` would run one
    * sampling job per file — O(files) driver jobs on a big glob, the
    * dominant cost of a multi-file recipe layer. Numeric typing instead
    * happens once for the whole union in [[Benchmark]]'s inference pass,
    * which is the reference's own model (pandas `to_numeric` over the
    * concatenated frame, aggregate.py:316-352). */
  def readFile(spark: SparkSession, recipe: Recipe, file: String): DataFrame = {
    import spark.implicits._

    val lines: org.apache.spark.sql.Dataset[String] =
      if (recipe.input.filters.nonEmpty) {
        val rules = recipe.input.filters
        spark.read.option("wholetext", "true").text(file).as[String]
          .flatMap(content => LineFilter(LineFilter.compile(rules), content.linesIterator))
      } else {
        spark.read.textFile(file)
      }

    val first = firstFilteredLine(spark, recipe, file)
    val (names, hasHeaderRow) = recipe.input.csvHeader match {
      case Some(header) =>
        val imposed = header.split(",").map(_.trim).toSeq
        if (first.replace(" ", "") == header.replace(" ", "")) (imposed, true)
        else {
          val nFields = if (first.isEmpty) imposed.length else splitCsvLine(first).length
          if (nFields != imposed.length)
            throw RecipeError(
              s"csv-header has ${imposed.length} columns but '$file' parsed $nFields")
          (imposed, false)
        }
      case None =>
        if (first.isEmpty) throw RecipeError(s"'$file' has no data after filtering")
        (splitCsvLine(first).map(_.trim), true)
    }

    val schema = org.apache.spark.sql.types.StructType(names.map(n =>
      org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType)))
    val df = spark.read
      .option("ignoreLeadingWhiteSpace", "true") // pandas skipinitialspace
      .option("header", hasHeaderRow.toString)
      .option("enforceSchema", "true")
      .schema(schema)
      .csv(lines)

    withProvenance(withMeta(spark, df, file), file)
  }

  /** Split one CSV record into fields (RFC-4180 quoting) — driver-side
    * header peek only. */
  private[recipe] def splitCsvLine(line: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { sb.append('"'); i += 1 }
          else inQ = false
        } else sb.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => out += sb.toString; sb.clear()
        case _ => sb.append(c)
      }
      i += 1
    }
    out += sb.toString
    out.toSeq
  }

  /** First post-filter line of `file`, read driver-side through the
    * (lazy) line filter — the header-imposition check needs one line, and
    * a Spark job per file would mean O(files) driver jobs on a 10k-file
    * glob (aggregate.py:278-283 does the same single-line peek). */
  private def firstFilteredLine(spark: SparkSession, recipe: Recipe, file: String): String = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      val it =
        if (recipe.input.filters.nonEmpty)
          LineFilter(LineFilter.compile(recipe.input.filters), src.getLines())
        else src.getLines()
      if (it.hasNext) it.next() else ""
    } finally in.close()
  }

  private def withProvenance(df: DataFrame, file: String): DataFrame = {
    val f = new java.io.File(file)
    df.withColumn("Path", lit(file))
      .withColumn("File", lit(f.getName))
      .withColumn("Directory", lit(Option(f.getParent).getOrElse(".")))
  }

  /** `.meta` sidecar YAML -> constant columns (overwriting existing ones,
    * like pandas df.assign). */
  private def withMeta(spark: SparkSession, df: DataFrame, file: String): DataFrame = {
    val metaFile = new java.io.File(file + ".meta")
    if (!metaFile.isFile) df
    else {
      val yaml = new org.yaml.snakeyaml.Yaml()
      val in = new java.io.FileInputStream(metaFile)
      val meta =
        try yaml.load[java.util.Map[String, Object]](in)
        finally in.close()
      meta.asScala.foldLeft(df) { case (d, (k, v)) =>
        d.withColumn(k, lit(v match {
          case n: java.lang.Number => n
          case b: java.lang.Boolean => b
          case other => if (other == null) null else other.toString
        }))
      }
    }
  }

  /** Full scan: expand globs, read every file, union by name. */
  def scan(spark: SparkSession, recipe: Recipe,
           extraFrames: Seq[DataFrame] = Seq.empty,
           inputs: Option[Seq[String]] = None): DataFrame = {
    // S4 'sql' reads SQLite files through graft.sources.Sqlite (pure-Scala
    // parser of the public file format — aggregate.py:295-314 semantics);
    // any other format fails loudly instead of feeding binary through the
    // CSV parser.
    if (recipe.input.format != "csv" && recipe.input.format != "sql")
      throw RecipeError(
        s"input.format '${recipe.input.format}' is unsupported in this build (only 'csv', 'sql')")
    val patterns = inputs.getOrElse(recipe.input.paths)
    val files = expandGlobs(spark, patterns, recipe.baseDir)
    if (files.isEmpty && patterns.nonEmpty)
      throw RecipeError(s"No matching files found for $patterns")
    val readOne: String => DataFrame =
      if (recipe.input.format == "sql") {
        val table = recipe.input.tableName.getOrElse(throw RecipeError(
          "input.format 'sql' requires input.table-name (aggregate.py:296-297)"))
        f => try graft.sources.Sqlite.scan(spark, f, table)
          catch { case e: graft.sources.Sqlite.SqliteError => throw RecipeError(e.msg) }
      } else { f => readFile(spark, recipe, f) }
    val frames = extraFrames ++ files.map(readOne)
    if (frames.isEmpty)
      throw RecipeError("recipe has no inputs (no path matches, no child configs)")
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
