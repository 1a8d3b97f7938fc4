package graft

/** The driver-facing JSON formats, extracted into pure functions so the
  * contract is unit-testable: round 3's entire perf record was lost to a
  * contract failure (the JSON line never emitted), and a single
  * mis-escaped character in oracle_sql.json would silently zero a
  * round's correctness record the same way. ContractSpec strict-parses
  * everything produced here with Jackson — the same parser family the
  * driver's `json.load` uses.
  */
object Contract {

  /** JSON string literal: escapes backslash, quote, and ALL control
    * chars (<0x20) — a tab or CR in builder-authored SQL would otherwise
    * make the driver's json.load fail.
    */
  def jsonString(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** The oracle_sql.json body consumed by the driver's DuckDB compare. */
  def oracleSqlJson(oracles: Iterable[(String, String)]): String =
    oracles.map { case (k, v) => s"${jsonString(k)}: ${jsonString(v)}" }
      .mkString("{", ",", "}")

  /** The one-line bench record (stdout contract + target/bench_last.json).
    * Failed queries carry a -1.0 sentinel and are excluded from `value`
    * but counted in `failed`.
    */
  def benchLine(results: Seq[(String, Double)], sfDir: String,
      warmupSec: Double, stagesWarmupSec: Double, gcPauseSec: Double,
      partial: Boolean): String = {
    val qs = results.map { case (k, v) => jsonString(k) + ":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    // stage-cache attribution: a warm stages_warmup_sec only means what
    // it claims if the record says how many stages were disk-cache loads
    // vs real builds in THIS JVM
    val loads = Stages.diskLoads.get
    val builds = Stages.diskBuilds.get
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":${jsonString(sfDir)},"failed":$failed,"warmup_sec":$warmupSec,"stages_warmup_sec":$stagesWarmupSec,"stages_disk_loads":$loads,"stages_disk_builds":$builds,"gc_pause_sec":$gcPauseSec,"partial":$partial}"""
  }
}
