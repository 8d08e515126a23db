package graft.recipe

import java.io.FileInputStream
import java.util.{List => JList, Map => JMap}

import scala.jdk.CollectionConverters._

/** The recipe = the query. Faithful model of the reference's aggregator
  * recipe language (bearysta doc/AGGREGATOR.md:40-213; key inventory
  * SURVEY.md §1.4). Unknown keys are ignored — matching the reference,
  * where missing keys read as None (aggregate.py:123-131) and extra keys
  * are silently unused.
  */
case class Recipe(
    input: RecipeInput,
    rename: Map[String, String],
    filterOut: Seq[(String, Seq[Any])],
    precomputed: Seq[(String, String)],
    pack: Seq[PackConf],
    unpack: Seq[PackConf],
    filterIn: Seq[(String, Seq[Any])],
    aggregation: String,
    values: Seq[String],
    series: Seq[String],
    axis: Seq[String],
    variants: Seq[String],
    expected: Option[Seq[Seq[Any]]],
    higherIsBetter: Boolean,
    numberFormat: Option[String],
    numberFormatMaxOnly: Boolean,
    /** Excel conditional color bands (aggregate.py:823-825, 730-747) */
    indicator: Seq[IndicatorConf],
    /** directory of the recipe file — child-recipe paths resolve here */
    baseDir: String)

case class RecipeInput(
    paths: Seq[String],
    format: String, // "csv" | "sql"
    csvHeader: Option[String],
    /** ordered (regex, action); action: Replace(s) | Keep | Drop | Append */
    filters: Seq[(String, LineAction)],
    tableName: Option[String],
    /** child recipes evaluated first (S7 DAG composition) */
    configs: Seq[String],
    /** glob of per-env package-list YAMLs (J5 env sheet; only meaningful
      * in raw child configs — aggregate.py:838-843) */
    packagesPath: Option[String])

sealed trait LineAction
object LineAction {
  case class Replace(repl: String) extends LineAction
  case object Keep extends LineAction
  case object Drop extends LineAction
  case object Append extends LineAction
}

/** One pack/unpack step: fold `columns` into (name, value) rows / widen
  * (name, value) rows into columns. */
case class PackConf(columns: Seq[String], name: String, value: String)

/** One Excel color-band rule: cells of value column `column` get
  * `colors(i)` where i = count of `ranges` boundaries strictly below the
  * cell value; null cells are white (aggregate.py:730-747). */
case class IndicatorConf(column: String, ranges: Seq[Double], colors: Seq[String]) {
  require(ranges.size == colors.size - 1,
    "Number of boundaries must be one less than number of colors!")
  val sortedRanges: Seq[Double] = ranges.sorted
  def colorOf(x: Double): String =
    if (x.isNaN) "#ffffff" else colors(sortedRanges.count(x > _))
}

object Recipe {

  def load(path: String): Recipe = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val in = new FileInputStream(path)
    val root =
      try yaml.load[JMap[String, Object]](in)
      finally in.close()
    fromMap(root, new java.io.File(path).getAbsoluteFile.getParent)
  }

  def loadString(text: String, baseDir: String = "."): Recipe =
    fromMap(new org.yaml.snakeyaml.Yaml().load[JMap[String, Object]](text), baseDir)

  private def strList(v: Object): Seq[String] = v match {
    case null => Seq.empty
    case s: String => Seq(s)
    case l: JList[_] => l.asScala.toSeq.map(_.toString)
    case other => Seq(other.toString)
  }

  private def anyList(v: Object): Seq[Any] = v match {
    case null => Seq.empty
    case l: JList[_] => l.asScala.toSeq
    case other => Seq(other)
  }

  /** Ordered (col -> values) pairs; YAML maps preserve insertion order in
    * snakeyaml (LinkedHashMap), matching the reference's dict iteration. */
  private def orderedPairs(v: Object): Seq[(String, Seq[Any])] = v match {
    case null => Seq.empty
    case m: JMap[_, _] =>
      m.asScala.toSeq.map { case (k, vv) => k.toString -> anyList(vv.asInstanceOf[Object]) }
    case _ => Seq.empty
  }

  private def packConfs(v: Object): Seq[PackConf] = v match {
    case null => Seq.empty
    case l: JList[_] => l.asScala.toSeq.map {
      case m: JMap[_, _] =>
        val mm = m.asInstanceOf[JMap[String, Object]].asScala
        PackConf(strList(mm.getOrElse("columns", null)),
          mm.getOrElse("name", "name").toString,
          mm.getOrElse("value", "value").toString)
      case other => throw new IllegalArgumentException(s"bad pack conf: $other")
    }
    case m: JMap[_, _] => packConfs(java.util.List.of(m))
    case _ => Seq.empty
  }

  def fromMap(root: JMap[String, Object], baseDir: String): Recipe = {
    val m = Option(root).map(_.asScala).getOrElse(
      throw new IllegalArgumentException("empty recipe"))

    val inputM = m.get("input").collect { case im: JMap[_, _] =>
      im.asInstanceOf[JMap[String, Object]].asScala
    }.getOrElse(scala.collection.mutable.Map.empty[String, Object])

    val filters: Seq[(String, LineAction)] = inputM.get("filter") match {
      case Some(fm: JMap[_, _]) =>
        fm.asInstanceOf[JMap[String, Object]].asScala.toSeq.map { case (re, act) =>
          val action = act match {
            case null => LineAction.Keep
            case "drop" => LineAction.Drop
            case "append" => LineAction.Append
            case s => LineAction.Replace(s.toString)
          }
          re -> action
        }
      case _ => Seq.empty
    }

    val input = RecipeInput(
      paths = strList(inputM.getOrElse("path", null)),
      format = inputM.getOrElse("format", "csv").toString,
      csvHeader = inputM.get("csv-header").map(_.toString),
      filters = filters,
      tableName = inputM.get("table-name").map(_.toString),
      configs = strList(inputM.getOrElse("config", null)),
      packagesPath = inputM.get("packages_path").map(_.toString))

    val renames: Map[String, String] = m.get("rename") match {
      case Some(rm: JMap[_, _]) =>
        rm.asInstanceOf[JMap[String, Object]].asScala.map { case (k, v) => k -> v.toString }.toMap
      case _ => Map.empty
    }

    val precomputed: Seq[(String, String)] = m.get("precomputed") match {
      case Some(pm: JMap[_, _]) =>
        pm.asInstanceOf[JMap[String, Object]].asScala.toSeq.map { case (k, v) => k -> v.toString }
      case _ => Seq.empty
    }

    val expected: Option[Seq[Seq[Any]]] = m.get("expected") match {
      case Some(l: JList[_]) =>
        Some(l.asScala.toSeq.map {
          case inner: JList[_] => inner.asScala.toSeq
          case single => Seq(single)
        })
      case _ => None
    }

    Recipe(
      input = input,
      rename = renames,
      filterOut = orderedPairs(m.getOrElse("filter-out", null)),
      precomputed = precomputed,
      pack = packConfs(m.getOrElse("pack", null)),
      unpack = packConfs(m.getOrElse("unpack", null)),
      filterIn = orderedPairs(m.getOrElse("filter-in", null)),
      aggregation = m.getOrElse("aggregation", "mean").toString,
      values = strList(m.getOrElse("values", null)),
      series = strList(m.getOrElse("series", null)),
      axis = strList(m.getOrElse("axis", null)),
      variants = strList(m.getOrElse("variants", null)),
      expected = expected,
      higherIsBetter = m.get("higher-is-better").exists {
        case b: java.lang.Boolean => b
        case s => s.toString.toBoolean
      },
      numberFormat = m.get("number-format").map(_.toString),
      numberFormatMaxOnly = m.get("number-format-max-only").exists {
        case b: java.lang.Boolean => b
        case s => s.toString.toBoolean
      },
      indicator = m.get("indicator") match {
        case Some(l: JList[_]) => l.asScala.toSeq.map {
          case im: JMap[_, _] =>
            val i = im.asInstanceOf[JMap[String, Object]].asScala
            IndicatorConf(
              column = i.getOrElse("column",
                throw new IllegalArgumentException("indicator needs 'column'")).toString,
              ranges = i.get("ranges").collect { case rl: JList[_] =>
                rl.asScala.toSeq.map(_.asInstanceOf[Number].doubleValue)
              }.getOrElse(Seq.empty),
              colors = i.get("colors").collect { case cl: JList[_] =>
                cl.asScala.toSeq.map(_.toString)
              }.getOrElse(Seq.empty))
          case other => throw new IllegalArgumentException(s"bad indicator conf: $other")
        }
        case _ => Seq.empty
      },
      baseDir = baseDir)
  }
}
