package graft.config

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {
  private val env = Map("DB_HOST" -> "localhost", "DB_PORT" -> "5432")

  test("substitute replaces known vars, leaves unknown verbatim") {
    assert(Config.substitute("${DB_HOST}:${DB_PORT}", env) == "localhost:5432")
    assert(Config.substitute("${MISSING}/x", env) == "${MISSING}/x")
    assert(Config.substitute("no vars here", env) == "no vars here")
  }

  test("substituteTree recurses through maps and seqs") {
    val tree = Map(
      "url" -> "jdbc://${DB_HOST}",
      "opts" -> Seq("${DB_PORT}", 42),
      "n" -> 7)
    val out = Config.substituteTree(tree, env).asInstanceOf[Map[String, Any]]
    assert(out("url") == "jdbc://localhost")
    assert(out("opts") == Seq("5432", 42))
    assert(out("n") == 7)
  }
}
