package graft.recipe

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Output sinks over the aggregated frame (bearysta aggregate.py
  * 1022-1054): CSV with %.3f floats, per-variant pivot-table pretty
  * printing, and HTML. Presentation runs driver-side on the collected
  * post-aggregation frame — which is small by construction (grouped by
  * recipe dimensions); the distributed pipeline ends at [[Benchmark]].
  */
object Sinks {

  /** K1: CSV with pandas' float_format='%.3f' semantics (floats only). */
  def toCsvString(df: DataFrame): String = {
    val cols = df.schema.fields
    val sb = new StringBuilder
    sb.append(cols.map(_.name).mkString(",")).append('\n')
    for (r <- df.collect()) {
      sb.append(cols.indices.map { i =>
        if (r.isNullAt(i)) ""
        else cols(i).dataType match {
          // formatLocal(ROOT): pandas float_format is locale-independent;
          // plain .format would emit "2,000" on comma-decimal locales
          case DoubleType => "%.3f".formatLocal(java.util.Locale.ROOT, r.getDouble(i))
          case FloatType => "%.3f".formatLocal(java.util.Locale.ROOT, r.getFloat(i))
          case _ =>
            val s = r.get(i).toString
            if (s.contains(",") || s.contains("\"") || s.contains("\n"))
              "\"" + s.replace("\"", "\"\"") + "\"" else s
        }
      }.mkString(",")).append('\n')
    }
    sb.toString
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    if (path == "-") print(toCsvString(df))
    else java.nio.file.Files.writeString(java.nio.file.Paths.get(path), toCsvString(df))

  // ---------------- pivot presentation (W1/W2) ----------------

  /** One rendered pivot table: rows = axis combos, columns = (value,
    * series-combo) pairs, pandas pivot_table layout with sorted keys. */
  case class Pivot(variant: Seq[(String, Any)], rowKeys: Seq[Seq[Any]],
                   colKeys: Seq[(String, Seq[Any])], cells: Map[(Seq[Any], (String, Seq[Any])), Double],
                   axisNames: Seq[String])

  private def keyOrdering: Ordering[Seq[Any]] = (a: Seq[Any], b: Seq[Any]) => {
    a.zip(b).iterator.map {
      case (x: Number, y: Number) => x.doubleValue.compareTo(y.doubleValue)
      case (x, y) => String.valueOf(x).compareTo(String.valueOf(y))
    }.find(_ != 0).getOrElse(a.size.compareTo(b.size))
  }

  def pivots(df: DataFrame, recipe: Recipe): Seq[Pivot] = {
    val rows = df.collect()
    val schema = df.columns.zipWithIndex.toMap
    def get(r: Row, c: String): Any = r.get(schema(c))
    def num(r: Row, c: String): Double = r.get(schema(c)) match {
      case null => Double.NaN
      case n: Number => n.doubleValue
      case other => try other.toString.toDouble catch { case _: Throwable => Double.NaN }
    }
    val variantCombos: Seq[Seq[Any]] = rows.toSeq
      .map(r => recipe.variants.map(get(r, _)).toSeq)
      .distinct.sorted(keyOrdering)
    val combos: Seq[Seq[Any]] =
      if (variantCombos.isEmpty) Seq(Seq.empty[Any]) else variantCombos
    combos.map { vc =>
      val in = rows.filter(r => recipe.variants.map(get(r, _)).toSeq == vc)
      val rowKeys = in.map(r => recipe.axis.map(get(r, _)).toSeq).distinct.sorted(keyOrdering)
      val seriesKeys = in.map(r => recipe.series.map(get(r, _)).toSeq).distinct.sorted(keyOrdering)
      val colKeys = for (v <- recipe.values; sk <- seriesKeys) yield (v, sk)
      val cells = (for {
        r <- in.toSeq; v <- recipe.values
      } yield (recipe.axis.map(get(r, _)).toSeq, (v, recipe.series.map(get(r, _)).toSeq)) -> num(r, v)).toMap
      Pivot(recipe.variants.zip(vc), rowKeys, colKeys, cells, recipe.axis)
    }
  }

  /** Number formatting per aggregate.py:929-961: a '{:.Nf}'-style format
    * string, or an integer precision whose decimals derive from each
    * value's order of magnitude (optionally from the max only). */
  def formatNumber(x: Double, recipe: Recipe, maxValue: Double): String = {
    if (x.isNaN) return "NaN"
    recipe.numberFormat match {
      case Some(fmt) if fmt.exists(c => !c.isDigit) =>
        val m = "\\{:\\.(\\d+)f\\}".r.findFirstMatchIn(fmt)
        m.map(mm => s"%.${mm.group(1)}f".formatLocal(java.util.Locale.ROOT, x)).getOrElse(x.toString)
      case Some(digits) =>
        val precision = digits.toInt
        def decimals(num: Double): Int =
          if (num <= 0 || num.isNaN) 0
          else math.max(precision - math.log10(num).toInt, 0)
        val d = if (recipe.numberFormatMaxOnly) decimals(maxValue) else decimals(x)
        s"%.${d}f".formatLocal(java.util.Locale.ROOT, x)
      case None => x.toString
    }
  }

  /** K2: per-variant pretty-printed pivot tables. */
  def pivotString(df: DataFrame, recipe: Recipe): String = {
    val sb = new StringBuilder
    for ((p, i) <- pivots(df, recipe).zipWithIndex) {
      sb.append(s"Pivot table for variant ${i + 1}:\n")
      for ((k, v) <- p.variant) sb.append(s"$k = $v\n")
      sb.append('\n')
      val maxVal = if (p.cells.isEmpty) 0.0
        else p.cells.values.filterNot(_.isNaN).foldLeft(Double.MinValue)(math.max)
      val header = p.axisNames ++ p.colKeys.map { case (v, sk) =>
        (v +: sk.map(String.valueOf)).mkString("|")
      }
      val body = p.rowKeys.map { rk =>
        rk.map(String.valueOf) ++ p.colKeys.map { ck =>
          p.cells.get((rk, ck)).map(formatNumber(_, recipe, maxVal)).getOrElse("NaN")
        }
      }
      val widths = (header +: body).transpose.map(_.map(_.length).max)
      def fmtRow(cells: Seq[String]): String =
        cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString("  ").stripTrailing()
      sb.append(fmtRow(header)).append('\n')
      body.foreach(r => sb.append(fmtRow(r)).append('\n'))
      sb.append("\n\n")
    }
    sb.toString
  }

  /** K3: HTML report; with `plot`, one inline-SVG grouped bar chart per
    * variant (the reference embeds a matplotlib PNG, aggregate.py:758-787
    * — SVG needs no image library and stays diffable). */
  def toHtml(df: DataFrame, recipe: Recipe, title: String,
             plot: Boolean = false): String = {
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html><html><head><meta charset=\"utf-8\"><style>")
      .append("table{border-collapse:collapse}td,th{border:1px solid #999;padding:4px 8px}")
      .append("</style></head><body>\n")
    sb.append(s"<h1><code>$title</code> Performance Results</h1>\n")
    for ((p, i) <- pivots(df, recipe).zipWithIndex) {
      sb.append("<hr>")
      sb.append(s"<h3>Variant ${i + 1}: ${p.variant.map(_._2).mkString(", ")}</h3>\n")
      for ((k, v) <- p.variant) sb.append(s"<p>$k = <b>$v</b></p>\n")
      sb.append("<br>\n<table><tr>")
      val maxVal = if (p.cells.isEmpty) 0.0
        else p.cells.values.filterNot(_.isNaN).foldLeft(Double.MinValue)(math.max)
      p.axisNames.foreach(a => sb.append(s"<th>$a</th>"))
      p.colKeys.foreach { case (v, sk) =>
        sb.append(s"<th>${(v +: sk.map(String.valueOf)).mkString("|")}</th>")
      }
      sb.append("</tr>\n")
      for (rk <- p.rowKeys) {
        sb.append("<tr>")
        rk.foreach(k => sb.append(s"<td>$k</td>"))
        p.colKeys.foreach { ck =>
          val cell = p.cells.get((rk, ck)).map(formatNumber(_, recipe, maxVal)).getOrElse("NaN")
          sb.append(s"<td>$cell</td>")
        }
        sb.append("</tr>\n")
      }
      sb.append("</table><br>\n")
      if (plot)
        sb.append(pivotSvg(p, recipe.values.mkString(", "))).append("<br>\n")
    }
    sb.append("</body></html>\n")
    sb.toString
  }

  def writeHtml(df: DataFrame, recipe: Recipe, path: String, title: String,
                plot: Boolean = false): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      toHtml(df, recipe, title, plot))

  // ---------------- SVG bar charts (K3 --plot) ----------------

  private val palette = Seq("#4e79a7", "#f28e2b", "#e15759", "#76b7b2",
    "#59a14f", "#edc948", "#b07aa1", "#ff9da7", "#9c755f", "#bab0ac")

  /** Grouped bar chart of one pivot — the dependency-free stand-in for
    * the reference's matplotlib `pt.plot(kind='bar')` base64-PNG embed
    * (aggregate.py:758-787): x = axis combos, one bar per (value,
    * series) column, y linear from 0 to the max cell. */
  def pivotSvg(p: Pivot, valueLabel: String): String = {
    val w = 640; val h = 320
    val mL = 56; val mR = 16; val mT = 12; val mB = 64
    val plotW = w - mL - mR; val plotH = h - mT - mB
    val maxVal = p.cells.values.filterNot(_.isNaN).foldLeft(0.0)(math.max) match {
      case 0.0 => 1.0; case m => m
    }
    val nG = math.max(p.rowKeys.size, 1)
    val nB = math.max(p.colKeys.size, 1)
    val groupW = plotW.toDouble / nG
    val barW = groupW * 0.8 / nB
    val sb = new StringBuilder
    sb.append(s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h">""")
    sb.append(s"""<rect width="$w" height="$h" fill="white"/>""")
    // y axis: 4 gridlines + labels
    for (i <- 0 to 4) {
      val v = maxVal * i / 4
      val y = mT + plotH - plotH * i / 4.0
      sb.append(s"""<line x1="$mL" y1="$y" x2="${w - mR}" y2="$y" stroke="#ddd"/>""")
      sb.append(s"""<text x="${mL - 6}" y="${y + 4}" text-anchor="end" font-size="10">${"%.4g".formatLocal(java.util.Locale.ROOT, v)}</text>""")
    }
    sb.append(s"""<text x="12" y="${mT + plotH / 2}" font-size="11" transform="rotate(-90 12 ${mT + plotH / 2})" text-anchor="middle">${valueLabel}</text>""")
    for ((rk, gi) <- p.rowKeys.zipWithIndex) {
      val gx = mL + gi * groupW
      for ((ck, bi) <- p.colKeys.zipWithIndex) {
        val v = p.cells.getOrElse((rk, ck), Double.NaN)
        if (!v.isNaN) {
          val bh = plotH * v / maxVal
          val x = gx + groupW * 0.1 + bi * barW
          sb.append(s"""<rect class="bar" x="$x" y="${mT + plotH - bh}" width="$barW" height="$bh" fill="${palette(bi % palette.size)}"/>""")
        }
      }
      val label = rk.map(String.valueOf).mkString(", ")
      sb.append(s"""<text x="${gx + groupW / 2}" y="${mT + plotH + 14}" text-anchor="middle" font-size="10">$label</text>""")
    }
    // legend
    for ((ck, bi) <- p.colKeys.zipWithIndex) {
      val lx = mL + (bi % 3) * (plotW / 3)
      val ly = mT + plotH + 28 + (bi / 3) * 14
      sb.append(s"""<rect x="$lx" y="${ly - 9}" width="10" height="10" fill="${palette(bi % palette.size)}"/>""")
      sb.append(s"""<text x="${lx + 14}" y="$ly" font-size="10">${(ck._1 +: ck._2.map(String.valueOf)).mkString("|")}</text>""")
    }
    sb.append("</svg>")
    sb.toString
  }

  // ---------------- XLSX sink (K4) ----------------

  /** pandas-ExcelWriter-shaped workbook (aggregate.py:792-830): a
    * `summary` sheet of stacked per-variant blocks (variant header
    * mini-table, then the pivot with indicator color bands) and a `data`
    * sheet with the full aggregated frame. */
  def writeXlsx(df: DataFrame, recipe: Recipe, path: String,
                raw: Option[DataFrame] = None): Unit = {
    import Xlsx._
    val colors = recipe.indicator.flatMap(_.colors).distinct :+ "#ffffff"
    val styleOf: Map[String, Int] = colors.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap
    val indicatorByValue = recipe.indicator.map(ic => ic.column -> ic).toMap

    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Cell]]
    for (p <- pivots(df, recipe)) {
      // variant header mini-table (varindex.to_excel, aggregate.py:808)
      if (p.variant.nonEmpty) {
        rows += p.variant.map { case (k, _) => Str(k) }
        rows += p.variant.map { case (_, v) => cellOf(v) }
      }
      rows += Seq.empty
      // pivot: column-header rows (value level + one per series level),
      // then an axis-names row, then data rows
      val nAxis = p.axisNames.size
      rows += (Seq.fill(nAxis)(Blank) ++ p.colKeys.map { case (v, _) => Str(v) })
      for (lvl <- 0 until (p.colKeys.headOption.map(_._2.size).getOrElse(0)))
        rows += (Seq.fill(nAxis)(Blank) ++ p.colKeys.map { case (_, sk) => cellOf(sk(lvl)) })
      rows += p.axisNames.map(Str(_))
      for (rk <- p.rowKeys) {
        rows += (rk.map(cellOf) ++ p.colKeys.map { case ck @ (value, _) =>
          val v = p.cells.getOrElse((rk, ck), Double.NaN)
          val style = indicatorByValue.get(value)
            .map(ic => styleOf(ic.colorOf(v))).getOrElse(0)
          Num(v, style)
        })
      }
      rows += Seq.empty
      rows += Seq.empty
    }

    val data = df.collect()
    val dataRows = Seq(df.columns.toSeq.map(Str(_): Cell)) ++
      data.map(r => df.columns.indices.map(i =>
        if (r.isNullAt(i)) Blank else cellOf(r.get(i))))

    // --raw: the concatenated normalized input frame on its own sheet
    // (aggregate.py:831-833, flag at :995)
    val rawSheet = raw.map { r =>
      val rdata = r.collect()
      Sheet("raw", Seq(r.columns.toSeq.map(Str(_): Cell)) ++
        rdata.map(row => r.columns.indices.map(i =>
          if (row.isNullAt(i)) Blank else cellOf(row.get(i)))))
    }

    Xlsx.write(path,
      Seq(Sheet("summary", rows.toSeq), Sheet("data", dataRows)) ++
        rawSheet ++ envSheet(df.sparkSession, recipe),
      colors)
  }

  /** J5 env sheet (aggregate.py:836-878): child raw configs declare
    * `input.packages_path` globs of per-env package YAMLs (filename
    * `<ts>_<suite>_env_<env>_packages.yml`); one table per env, indexed
    * by package name with (env, field) column pairs, outer-joined across
    * envs so a package present in only one env leaves the other env's
    * cells blank. Config-sized data — driver-side like the reference. */
  def envSheet(spark: org.apache.spark.sql.SparkSession, recipe: Recipe): Option[Xlsx.Sheet] = {
    import scala.jdk.CollectionConverters._
    val packageFiles: Seq[String] = recipe.input.configs.flatMap { cfg =>
      val resolved = if (new java.io.File(cfg).isAbsolute) cfg
        else new java.io.File(recipe.baseDir, cfg).getPath
      CsvSource.expandGlobs(spark, Seq(resolved), recipe.baseDir).flatMap { f =>
        Recipe.load(f).input.packagesPath.toSeq.flatMap(g =>
          CsvSource.expandGlobs(spark, Seq(g), new java.io.File(f).getParent))
      }
    }
    val envs = packageFiles.flatMap { f =>
      val parts = new java.io.File(f).getName.split("_")
      if (parts.length >= 2) Some(parts(parts.length - 2)) else None
    }.distinct.sorted
    if (envs.isEmpty) return None

    // env -> (package display name -> field -> value)
    val perEnv: Seq[(String, Map[String, Map[String, Any]], Seq[String])] = envs.map { env =>
      val file = packageFiles.find(_.contains(env)).get
      val yaml = new org.yaml.snakeyaml.Yaml()
      val in = new java.io.FileInputStream(file)
      val data =
        try yaml.load[java.util.Map[String, java.util.Map[String, Object]]](in)
        finally in.close()
      val entries = data.asScala.toSeq.map { case (_, v) => v.asScala.toMap }
      val fields = entries.headOption.map(_.keys.toSeq.filterNot(_ == "name"))
        .getOrElse(Seq.empty)
      val byName: Map[String, Map[String, Any]] = entries.map { e =>
        String.valueOf(e.getOrElse("name", "")) ->
          (e - "name").map { case (k, v) => k -> (v: Any) }
      }.toMap
      (env, byName, fields)
    }

    val allNames = perEnv.flatMap(_._2.keys).distinct.sorted
    val header1: Seq[Xlsx.Cell] = Xlsx.Blank +:
      perEnv.flatMap { case (env, _, fields) => fields.map(_ => Xlsx.Str(env): Xlsx.Cell) }
    val header2: Seq[Xlsx.Cell] = Xlsx.Str("name") +:
      perEnv.flatMap { case (_, _, fields) => fields.map(f => Xlsx.Str(f): Xlsx.Cell) }
    val body = allNames.map { n =>
      Xlsx.Str(n) +: perEnv.flatMap { case (_, byName, fields) =>
        fields.map(f =>
          byName.get(n).flatMap(_.get(f)).map(cellOf).getOrElse(Xlsx.Blank))
      }
    }
    Some(Xlsx.Sheet("env", Seq(header1, header2) ++ body))
  }

  private def cellOf(v: Any): Xlsx.Cell = v match {
    case null => Xlsx.Blank
    case n: Number => Xlsx.Num(n.doubleValue)
    case other => Xlsx.Str(String.valueOf(other))
  }
}
