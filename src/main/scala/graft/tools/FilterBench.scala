package graft.tools

import graft.recipe.{LineAction, LineFilter}

/** Dev: isolate the per-line cost of the LineFilter leg of the recipe
  * wholetext scan (guide §1.2) — pure-JVM timing of the matcher-reuse
  * iterator vs the old per-line `pattern.matcher(line)` allocation loop,
  * over omnisci-style log lines. Args: [lines] [reps]. */
object FilterBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(400000)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    // the omnisci recipe's rules — the heaviest corpus filter set
    val rules = Seq(
      "^(?!.+ ? ([0-9]+))" -> LineAction.Append,
      "^.+ ? ([0-9]+).+ stdlog sql_execute ([0-9]+) .+,\"(\\d+)\",\"(\\d+)\"\\}" ->
        LineAction.Replace("sql_execute,\\1,\\2,\\3,\\4"),
      "^(?!sql_)" -> LineAction.Drop)
    val compiled = LineFilter.compile(rules)
    val lines: Array[String] = (0 until n).map { i =>
      if (i % 3 == 0) s"2026-08-18T00:00:0${i % 10} 12${i % 97} stdlog sql_execute ${i % 31} 42 x,\"${i % 7}\",\"${i % 11}\"}"
      else if (i % 3 == 1) s"some continuation text without trailing digits marker"
      else s"2026-08-18T00:00:0${i % 10} 12${i % 97} other_event ${i % 31} noise"
    }.toArray

    def old(ls: Iterator[String]): Iterator[String] = new Iterator[String] {
      // the pre-optimization loop shape, for the paired comparison
      private var prev = ""
      private var nl: String = _
      private var done = false
      private def adv(): Unit = {
        nl = null
        while (nl == null && ls.hasNext) {
          var line = ls.next(); var drop = true; var broke = false
          val it = compiled.iterator
          while (it.hasNext && !broke) {
            val r = it.next()
            if (r.pattern.matcher(line).find()) {
              drop = false
              r.action match {
                case LineAction.Keep => ()
                case LineAction.Drop => drop = true; broke = true
                case LineAction.Append =>
                  line = prev.replaceAll("\\s+$", "") + " " + line.replaceAll("^\\s+", "")
                  drop = true
                case LineAction.Replace(_) =>
                  // javaRepl("sql_execute,\1..\4") pre-rendered (private)
                  line = r.pattern.matcher(line).replaceAll("sql_execute,$1,$2,$3,$4")
              }
            }
          }
          prev = line
          if (!drop) nl = line
        }
        if (nl == null) done = true
      }
      adv()
      override def hasNext: Boolean = !done
      override def next(): String = { val r = nl; adv(); r }
    }

    def time(tag: String)(mk: => Iterator[String]): Double = {
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        var c = 0L
        val it = mk
        while (it.hasNext) { c += it.next().length }
        val s = (System.nanoTime() - t0) / 1e9
        assert(c > 0); s
      }
      println(f"$tag%-12s min=${secs.min}%.3fs runs=${secs.map(s => f"$s%.3f").mkString(",")}")
      secs.min
    }
    val a = time("per-line-alloc")(old(lines.iterator))
    val b = time("matcher-reuse")(LineFilter(compiled, lines.iterator))
    println(f"lines=$n speedup=${a / b}%.2fx")
  }
}
