package graft.core

/** Typed pipeline configuration (SURVEY §2.7 F16; reference
  * config/config.yaml + src/utils/config.py:49-60, whose `${VAR:default}`
  * env interpolation is reproduced here). Properties-format instead of
  * YAML (no YAML parser in the zero-dependency build — documented
  * divergence; the schema and interpolation semantics are the contract).
  */
object Config {

  final case class PipelineConfig(
      inputPath: String = "data/raw/churn.csv",
      bronzePath: String = "data/bronze",
      silverPath: String = "data/silver",
      goldPath: String = "data/gold",
      missingValueHandling: String = "impute", // impute | drop
      exactStats: Boolean = true,
      mlAlgorithm: String = "gbt",
      mlMaxIter: Int = 40,
      mlMaxDepth: Int = 6,
      apiPageSize: Int = 100,
      apiRateLimitPerMin: Int = 100)

  /** `${VAR}` / `${VAR:default}` interpolation against the environment
    * (reference config.py:49-60 semantics).
    */
  def interpolate(value: String, env: Map[String, String] = sys.env): String = {
    val re = "\\$\\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\\}".r
    re.replaceAllIn(value, m =>
      scala.util.matching.Regex.quoteReplacement(
        env.getOrElse(m.group(1), Option(m.group(2)).getOrElse(""))))
  }

  def parse(lines: Iterable[String], env: Map[String, String] = sys.env): Map[String, String] =
    lines.map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("#"))
      .flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) => Some(k.trim -> interpolate(v.trim, env))
          case _ => None
        }
      }.toMap

  def load(path: String, env: Map[String, String] = sys.env): PipelineConfig = {
    val src = scala.io.Source.fromFile(path)
    try fromMap(parse(src.getLines().toSeq, env)) finally src.close()
  }

  def fromMap(m: Map[String, String]): PipelineConfig = {
    val d = PipelineConfig()
    PipelineConfig(
      inputPath = m.getOrElse("input.path", d.inputPath),
      bronzePath = m.getOrElse("bronze.path", d.bronzePath),
      silverPath = m.getOrElse("silver.path", d.silverPath),
      goldPath = m.getOrElse("gold.path", d.goldPath),
      missingValueHandling = m.getOrElse("cleaning.missing_value_handling", d.missingValueHandling),
      exactStats = m.get("stats.exact").forall(_.toBoolean),
      mlAlgorithm = m.getOrElse("ml.algorithm", d.mlAlgorithm),
      mlMaxIter = m.get("ml.max_iter").map(_.toInt).getOrElse(d.mlMaxIter),
      mlMaxDepth = m.get("ml.max_depth").map(_.toInt).getOrElse(d.mlMaxDepth),
      apiPageSize = m.get("api.page_size").map(_.toInt).getOrElse(d.apiPageSize),
      apiRateLimitPerMin = m.get("api.rate_limit_per_min").map(_.toInt).getOrElse(d.apiRateLimitPerMin))
  }
}
