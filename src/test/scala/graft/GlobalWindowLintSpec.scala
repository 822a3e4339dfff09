package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ratchet for GLOBAL (unpartitioned) window sites in library code.
  *
  * A `Window.orderBy(...)` / `Window.partitionBy()` with no keys funnels its
  * whole input through one task — correct only when the input frame is
  * BOUNDED (a per-bucket partials frame, a per-stratum count table), never
  * on data-sized frames (that's what `kernel.Scan`'s bucket machinery is
  * for). Each allowlisted site below was reviewed for that invariant; a new
  * site fails this spec until it is reviewed and added with its bound.
  * Round-10 verdict carry-forward #6: the WindowExec warning spray is
  * demoted in SparkSpec, so THIS spec is what keeps the invariant visible.
  */
class GlobalWindowLintSpec extends AnyFunSuite {

  /** file base name -> (expected site count, reviewed bound of the input). */
  private val reviewed: Map[String, (Int, String)] = Map(
    // prior/later combine per-bucket running partials: #buckets rows
    // (shiftrightunsigned(idx, 33) — bounded by data size / 2^33 + parts)
    "kernel/Scan.scala" -> (2, "per-bucket partials frame"),
    // total-weight denominator over the stratum count table: one row per
    // stratum, already the product of a groupBy
    "ml/Sampling.scala" -> (1, "per-stratum count table"),
    // entropy denominator over event_type counts: #event-types rows
    "Queries2.scala" -> (1, "event_type count table"))

  test("every global-window site in src/main is reviewed-bounded") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val pat = java.util.regex.Pattern.compile(
      "Window\\.orderBy\\(|Window\\.partitionBy\\(\\)")
    val found = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val it = java.nio.file.Files.walk(root).iterator()
    while (it.hasNext) {
      val p = it.next()
      if (p.toString.endsWith(".scala")) {
        val rel = root.relativize(p).toString
        new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8).linesIterator.foreach { line =>
          val t = line.trim
          val isComment = t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
          if (!isComment && pat.matcher(line).find())
            found(rel) += 1
        }
      }
    }
    val unexpected = found.toMap.filter { case (f, n) => reviewed.get(f).map(_._1) != Some(n) }
    assert(unexpected.isEmpty,
      s"global-window sites changed: ${unexpected.toSeq.sorted.mkString(", ")} — " +
        "review each new site's input frame is BOUNDED (partials/stratum-sized), " +
        "or route data-sized scans through kernel.Scan; then update the allowlist")
    val stale = reviewed.keySet -- found.keySet
    assert(stale.isEmpty, s"allowlisted files no longer have global windows: $stale")
  }
}
