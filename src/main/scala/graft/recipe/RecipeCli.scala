package graft.recipe

import graft.GraftSession

/** CLI mirroring the reference's `python -m bearysta.aggregate` surface
  * (aggregate.py:968-1063): run recipes, emit CSV / pretty / HTML.
  *
  * Usage: graft.recipe.RecipeCli [--csv PATH|-] [--pretty PATH|-]
  *        [--html PATH] [--plot] [--excel PATH]
  *        [--input GLOB]... recipe.yml [recipe2.yml ...]
  */
object RecipeCli {
  def main(args: Array[String]): Unit = {
    var csv: Option[String] = None
    var pretty: Option[String] = None
    var html: Option[String] = None
    var excel: Option[String] = None
    var plot = false
    var raw = false
    var inputs: List[String] = Nil
    var recipes: List[String] = Nil
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--csv" | "-o" => csv = Some(args(i + 1)); i += 2
        case "--pretty" | "-P" => pretty = Some(args(i + 1)); i += 2
        case "--html" | "-H" => html = Some(args(i + 1)); i += 2
        case "--excel" | "-x" => excel = Some(args(i + 1)); i += 2
        case "--plot" => plot = true; i += 1
        case "--raw" => raw = true; i += 1
        case "--input" | "-i" => inputs ::= args(i + 1); i += 2
        case other => recipes ::= other; i += 1
      }
    }
    if (recipes.isEmpty) {
      System.err.println("usage: RecipeCli [--csv P|-] [--pretty P|-] [--html P] [--input GLOB] recipe.yml...")
      sys.exit(2)
    }
    val spark = GraftSession.local()
    try for (path <- recipes.reverse) {
      val name = new java.io.File(path).getName.replaceAll("\\.[^.]*$", "")
      val bench = Benchmark(spark, path)
      try {
      val df0 = bench.getAggregatedData(
        inputs = if (inputs.isEmpty) None else Some(inputs.reverse))
      // every sink collects the aggregated frame independently; with
      // more than one, pin it so the pipeline executes once regardless
      // of which upstream frames the Benchmark chose to cache
      val nSinks = Seq(csv, pretty, html, excel).flatten.size
      val df = if (nSinks > 1) df0.persist() else df0
      bench.warnings.foreach(w => System.err.println(s"[WARNING] $w"))
      csv.foreach {
        case "-" => print(Sinks.toCsvString(df))
        case p => Sinks.writeCsv(df, p.replace("{filename}", name))
      }
      pretty.foreach {
        case "-" => print(Sinks.pivotString(df, bench.recipe))
        case p => java.nio.file.Files.writeString(
          java.nio.file.Paths.get(p.replace("{filename}", name)),
          Sinks.pivotString(df, bench.recipe))
      }
      html.foreach(p =>
        Sinks.writeHtml(df, bench.recipe, p.replace("{filename}", name), name, plot))
      excel.foreach(p =>
        Sinks.writeXlsx(df, bench.recipe, p.replace("{filename}", name),
          raw = if (raw) Some(bench.getNormalizedData(
            inputs = if (inputs.isEmpty) None else Some(inputs.reverse))) else None))
      if (csv.isEmpty && pretty.isEmpty && html.isEmpty && excel.isEmpty)
        print(Sinks.pivotString(df, bench.recipe))
      if (nSinks > 1) df.unpersist(false)
      // finally: a failing sink must not leak this recipe's caches or
      // its caseSensitive hold into the next recipe's evaluation
      } finally bench.unpersist()
    } catch {
      case e: RecipeError =>
        System.err.println(s"[ERROR] ${e.msg}")
        sys.exit(1)
    } finally spark.stop()
  }
}
