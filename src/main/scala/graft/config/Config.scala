package graft.config

/** P15: `${VAR}` environment substitution over nested config structures
  * (reference run_pipeline.py:107-116 — recursive over dicts/lists,
  * unknown vars left verbatim). Driver-side utility, not a Spark op.
  */
object Config {

  private val Var = raw"\$$\{([A-Za-z_][A-Za-z0-9_]*)\}".r

  /** Substitute `${NAME}` occurrences in one string. */
  def substitute(s: String, env: Map[String, String] = sys.env): String =
    Var.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        env.getOrElse(m.group(1), m.matched)))

  /** Recursive substitution over a parsed config tree of
    * Map[String, Any] / Seq[Any] / String leaves.
    */
  def substituteTree(node: Any, env: Map[String, String] = sys.env): Any =
    node match {
      case s: String => substitute(s, env)
      case m: Map[_, _] => m.map { case (k, v) => k -> substituteTree(v, env) }
      case xs: Seq[_] => xs.map(substituteTree(_, env))
      case other => other
    }
}
